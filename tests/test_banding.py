"""Banding (sketch-space sharding) correctness — the reference's only
shard-equivalence test (tests/test_banding.py) and the template for the
TPU shard tests.  With uint32 working tables the band-union equality is
exact, which is stronger than the reference's epsilon-tolerance."""

import numpy as np
import pytest

from khmer_tpu import Counttable


@pytest.mark.parametrize('numbands', [2, 4, 8])
def test_banding_band_union_equals_full(ref_test_data, numbands):
    infile = ref_test_data + '/banding-reads.fq'
    ksize = 21

    ct_normal = Counttable(ksize, 1.25e6, 4)
    ct_normal.consume_seqfile(infile)

    banded = []
    for band in range(numbands):
        ct = Counttable(ksize, 1.25e6, 4)
        ct.consume_seqfile_banding(infile, numbands, band)
        banded.append(ct)

    # uint32 bin totals: the union of band tables must equal the full
    # table exactly (each k-mer lands in exactly one band)
    total = sum(np.asarray(ct.storage.table, np.uint64) for ct in banded)
    assert np.array_equal(total,
                          np.asarray(ct_normal.storage.table, np.uint64))

    # and each k-mer lives in exactly one band
    seqs = []
    from khmer_tpu.io.fastx import FastxReader

    for n, rec in enumerate(FastxReader(infile)):
        if n % 100 == 0:
            seqs.append(rec.cleaned_seq)
        if n > 400:
            break
    for seq in seqs[:3]:
        hashes = ct_normal._hash_array(seq)[:20]
        full = ct_normal.storage.get_batch(hashes).astype(np.int64)
        per_band = np.stack(
            [ct.storage.get_batch(hashes).astype(np.int64)
             for ct in banded])
        # functional check with the reference's FP tolerance
        # (reference tests/test_banding.py: epsilon=1): the full-table
        # CMS read is min-of-sums, the band reads are sums-of-mins
        assert np.abs(per_band.sum(axis=0) - full).max() <= 1
        # false positives shouldn't appear in multiple bands
        assert ((per_band > 0).sum(axis=0) <= 2).all()


def test_mqf_api(ref_test_data):
    """Fork N5 API surface: QF/BufferedQF counttables + batched query."""
    from khmer_tpu import BufferedQFCounttable, QFCounttable

    q = QFCounttable(21, 1 << 12)
    q.consume("ATCGGATCGAAATCGGATCGTTTGA")
    assert q.get("ATCGGATCGAAATCGGATCGT") == 1

    b = BufferedQFCounttable(21, 1 << 12)
    seq = "ATCGGATCGAAATCGGATCGTTTGA"
    b.consume(seq)
    b.addToBufferQuery(seq)
    b.queryBuffer()
    med, avg, dev = b.get_median_count(seq)
    assert med == 1
    assert b.median_at_least(seq, 1)
    b.clearQueryBuffer()
    assert b.get_median_count(seq)[0] == 1
