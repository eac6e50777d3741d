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


# -- round 3: the reference's test_banding.py cases under their
# original names/shapes.

import pytest  # noqa: E402

import khmer_tpu as khmer  # noqa: E402

from . import khmer_tst_utils as utils  # noqa: E402


@pytest.mark.parametrize('ksize,memory,epsilon,numbands', [
    (21, 5e6, 1, 2),
    (21, 5e6, 1, 4),
    (21, 5e6, 1, 8),
    (21, 5e6, 1, 16),
])
def test_banding_in_memory(ksize, memory, epsilon, numbands):
    """Banded counttables vs a normal counttable, functionally."""
    infile = utils.get_test_data('banding-reads.fq')

    ct_normal = khmer.Counttable(ksize, memory / 4, 4)
    ct_normal.consume_seqfile(infile)

    ct_banded = list()
    for band in range(numbands):
        ct = khmer.Counttable(ksize, memory / 4 / numbands, 4)
        ct.consume_seqfile_banding(infile, numbands, band)
        ct_banded.append(ct)

    for n, record in enumerate(utils.screed_open(infile)):
        if not (n > 0 and n % 100 == 0):
            continue
        for kmer in ct_normal.get_kmers(record.sequence):
            abund_normal = ct_normal.get(kmer)
            abunds_banded = [ct.get(kmer) for ct in ct_banded]
            # allow a small false-positive difference
            assert abs(sum(abunds_banded) - abund_normal) <= epsilon

            nonzeros = [a for a in abunds_banded if a > 0]
            # false positives shouldn't appear in multiple bands
            assert len(nonzeros) <= 2
            # false positives shouldn't have high abundance
            if len(nonzeros) > 1:
                assert min(nonzeros) == 1


@pytest.mark.parametrize('ksize,memory,numbands', [
    (21, 5e6, 3),
    (21, 5e6, 11),
    (21, 5e6, 23),
    (21, 5e6, 29),
])
def test_banding_to_disk(ksize, memory, numbands):
    """Banded counting produces the same data structure bytes."""
    infile = utils.get_test_data('banding-reads.fq')
    path1 = utils.get_temp_filename('normal.ct')
    path2 = utils.get_temp_filename('banding.ct')

    ct = khmer.Counttable(ksize, memory / 4, 4)
    ct.consume_seqfile(infile)
    ct.save(path1)
    print('FPR', khmer.calc_expected_collisions(ct))

    ct = khmer.Counttable(ksize, memory / 4, 4)
    for band in range(numbands):
        ct.consume_seqfile_banding(infile, numbands, band)
    ct.save(path2)
    print('FPR', khmer.calc_expected_collisions(ct))

    with open(path1, 'rb') as f1, open(path2, 'rb') as f2:
        assert f1.read() == f2.read()


@pytest.mark.parametrize('sketchclass', [
    (khmer.Nodetable),
    (khmer.Counttable),
])
def test_banding_bad_params(sketchclass):
    sketch = sketchclass(31, 1e5, 4)

    # fails because 13 > 8
    with pytest.raises(ValueError) as ve:
        infile = utils.get_test_data('bogus.fa')
        _ = sketch.consume_seqfile_banding(infile, 8, 13)
    assert "'band' must be in the interval [0, 'num_bands')" in str(ve)

    # fails because file does not exist (one missing-file error text —
    # the errno form — is used everywhere here; the reference mixes
    # 'does not exist' and the errno form between call paths)
    with pytest.raises(OSError) as ose:
        sketch.consume_seqfile_banding('file-no-exist.fa', 16, 3)
    assert 'does not exist' in str(ose) or \
        'No such file or directory' in str(ose)


@pytest.mark.parametrize('sketchclass,num_batches,batch', [
    (khmer.Nodetable, 8, 3),
    (khmer.Counttable, 8, 3),
])
def test_banding(sketchclass, num_batches, batch):
    sketch = sketchclass(31, 1e5, 4)
    infile = utils.get_test_data('bogus.fa')
    nreads, kmersconsumed = \
        sketch.consume_seqfile_banding(infile, num_batches, batch)
    assert nreads == 1
    assert kmersconsumed == 3
    assert sketch.get('CGGCTATTATCTGAGCTCAAGACTAATACGC') == 1
    assert sketch.get('TATTATCTGAGCTCAAGACTAATACGCGCTG') == 1
    assert sketch.get('TGAGCTCAAGACTAATACGCGCTGGCCACTG') == 1
    assert sketch.get('GTACGGCTATTATCTGAGCTCAAGACTAATA') == 0
    assert sketch.get('TTATCTGAGCTCAAGACTAATACGCGCTGGC') == 0
    assert sketch.get('GCTCAAGACTAATACGCGCTGGCCACTGGTA') == 0
