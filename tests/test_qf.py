"""QFCounttable exactness tests (reference semantics: QFStorage over
third-party/cqf/gqf.c — an exact multiset over khash % (nslots*256))."""

import numpy as np
import pytest

import khmer_tpu as khmer
from khmer_tpu.ops.hashing import hash_murmur3_scalar


def _random_seqs(n, length, seed=9):
    rng = np.random.default_rng(seed)
    return [''.join('ACGT'[c] for c in rng.integers(0, 4, length))
            for _ in range(n)]


def test_qf_counts_match_bruteforce_dict():
    qf = khmer.QFCounttable(20, 1024)
    seqs = _random_seqs(30, 50)
    ref = {}
    key_range = 1024 * 256
    for s in seqs:
        qf.consume(s)
        for i in range(len(s) - 19):
            key = hash_murmur3_scalar(s[i:i + 20]) % key_range
            ref[key] = ref.get(key, 0) + 1
    for s in seqs:
        for i in range(len(s) - 19):
            km = s[i:i + 20]
            key = hash_murmur3_scalar(km) % key_range
            assert qf.get(km) == (ref[key] & 0xFFFF)
    assert qf.n_unique_kmers() == len(ref)


def test_qf_geometry():
    qf = khmer.QFCounttable(20, 1024)
    # reference reports xnslots = nslots + 10*sqrt(nslots)
    assert qf.hashsizes() == [1024 + int(10 * 32.0)]
    assert qf.n_tables() == 1
    # non-power-of-two size rounds up
    qf2 = khmer.QFCounttable(20, 1000)
    assert qf2.storage.nslots == 1024


def test_qf_add_returns_was_new():
    qf = khmer.QFCounttable(20, 64)
    km = 'ACGTACGTACGTACGTACGT'
    assert qf.add(km) is True
    assert qf.add(km) is False
    assert qf.get(km) == 2


def test_qf_save_load_roundtrip(tmp_path):
    qf = khmer.QFCounttable(21, 512)
    seqs = _random_seqs(10, 60, seed=3)
    for s in seqs:
        qf.consume(s)
    fn = str(tmp_path / 'table.qf')
    qf.save(fn)
    qf2 = khmer.QFCounttable.load(fn)
    assert qf2.ksize() == 21
    assert qf2.n_unique_kmers() == qf.n_unique_kmers()
    for s in seqs[:3]:
        for i in range(0, len(s) - 20, 7):
            km = s[i:i + 21]
            assert qf2.get(km) == qf.get(km)


def test_qf_abundance_distribution(ref_test_data):
    qf = khmer.QFCounttable(17, 1 << 14)
    infile = ref_test_data + '/test-abund-read-2.fa'
    qf.consume_seqfile(infile)
    dist = qf.abundance_distribution(infile)
    # 1001 identical reads: exact CQF counts are unbounded, so the
    # repeated k-mers land at abundance 1001 (not capped at 255)
    assert dist[1] == 96
    assert dist[1001] == 2


def test_qf_bigcount_unsupported():
    qf = khmer.QFCounttable(20, 64)
    with pytest.raises(ValueError):
        qf.set_use_bigcount(True)
    with pytest.raises(ValueError):
        qf.get_raw_tables()


def test_buffered_qf_counttable():
    b = khmer.BufferedQFCounttable(20, 1024)
    s = _random_seqs(1, 60)[0]
    b.consume(s)
    b.addToBufferQuery(s)
    b.queryBuffer()
    assert b.get_kmer_counts(s) == [1] * (len(s) - 19)
    med, avg, dev = b.get_median_count(s)
    assert med == 1
    b.clearQueryBuffer()
