"""Hashtable/table-layer behavior tests, modeled on the reference test
strategy (tests/test_tabletype.py parametrization across table types)."""

import numpy as np
import pytest

from khmer_tpu import (Counttable, Countgraph, Nodegraph, Nodetable,
                       SmallCountgraph, SmallCounttable)

TABLE_TYPES = [Counttable, SmallCounttable, Nodetable, Countgraph,
               SmallCountgraph, Nodegraph]
COUNTING_TYPES = [Counttable, SmallCounttable, Countgraph, SmallCountgraph]

PARAMS = (20, 1000, 4)


@pytest.fixture(params=TABLE_TYPES)
def tabletype(request):
    return request.param


@pytest.fixture(params=COUNTING_TYPES)
def countingtype(request):
    return request.param


def test_count_get(tabletype):
    tt = tabletype(*PARAMS)
    kmer = "G" * 20
    assert tt.get(kmer) == 0
    tt.count(kmer)
    assert tt.get(kmer) == 1


def test_add_by_hash(tabletype):
    tt = tabletype(*PARAMS)
    h = tt.hash("GATTACAGATTACAGATTAC")
    assert tt.add(h) is True
    assert tt.get(h) == 1


def test_ksize_wrong_length(tabletype):
    tt = tabletype(*PARAMS)
    with pytest.raises(ValueError):
        tt.get("AAA")
    with pytest.raises(ValueError):
        tt.add("A" * 21)


def test_hash_strand_neutral(tabletype):
    from khmer_tpu.ops.hashing import reverse_complement

    tt = tabletype(*PARAMS)
    kmer = "GATTACAGATTACAGATTAC"
    assert tt.hash(kmer) == tt.hash(reverse_complement(kmer))


def test_counting_saturation(countingtype):
    tt = countingtype(*PARAMS)
    kmer = "T" * 20
    for _ in range(20):
        tt.count(kmer)
    maxc = 15 if "Small" in countingtype.__name__ else 20
    assert tt.get(kmer) == maxc


def test_consume(tabletype):
    tt = tabletype(*PARAMS)
    seq = "GATTACAGATTACAGATTACAGGG"
    n = tt.consume(seq)
    assert n == len(seq) - 20 + 1
    for i in range(n):
        assert tt.get(seq[i: i + 20]) >= 1
    with pytest.raises(ValueError):
        tt.consume("AAA")


def test_consume_counts_overlaps(countingtype):
    tt = countingtype(*PARAMS)
    # AAA...A of length 25 contains the same kmer 6 times
    tt.consume("A" * 25)
    assert tt.get("A" * 20) == 6


def test_n_unique_and_occupied(tabletype):
    tt = tabletype(*PARAMS)
    tt.consume("GATTACAGATTACAGATTACAGGG")
    assert tt.n_unique_kmers() == 5
    assert tt.n_occupied() == 5
    tt.consume("GATTACAGATTACAGATTACAGGG")
    assert tt.n_unique_kmers() == 5


def test_get_kmers_and_hashes(tabletype):
    tt = tabletype(*PARAMS)
    seq = "GATTACAGATTACAGATTACA"
    kmers = tt.get_kmers(seq)
    assert kmers == [seq[:20], seq[1:21]]
    hashes = tt.get_kmer_hashes(seq)
    assert hashes == [tt.hash(seq[:20]), tt.hash(seq[1:21])]


def test_get_kmer_counts(countingtype):
    tt = countingtype(*PARAMS)
    seq = "GATTACAGATTACAGATTACA"
    tt.consume(seq)
    assert tt.get_kmer_counts(seq) == [1, 1]
    tt.consume(seq[:20])
    assert tt.get_kmer_counts(seq) == [2, 1]


def test_median_and_stats(countingtype):
    tt = countingtype(*PARAMS)
    seq = "GATTACAGATTACAGATTACAGTTA"
    tt.consume(seq)
    med, avg, stddev = tt.get_median_count(seq)
    assert med == 1
    assert avg == pytest.approx(1.0)
    assert stddev == pytest.approx(0.0)
    assert tt.median_at_least(seq, 1)
    assert not tt.median_at_least(seq, 2)


def test_trim_on_abundance(countingtype):
    tt = countingtype(*PARAMS)
    seq = "GATTACAGATTACAGATTACAG"
    tt.consume(seq)
    # all k-mers have count 1 -> nothing trimmed at cutoff 1
    trimmed, pos = tt.trim_on_abundance(seq, 1)
    assert trimmed == seq
    assert pos == len(seq)
    # cutoff 2: first k-mer below -> trim to 0
    trimmed, pos = tt.trim_on_abundance(seq, 2)
    assert pos == 0


def test_reverse_hash_graph_only():
    cg = Countgraph(*PARAMS)
    kmer = "GATTACAGATTACAGATTAC"
    h = cg.hash(kmer)
    rh = cg.reverse_hash(h)
    # canonical hash: either the kmer or its revcomp
    from khmer_tpu.ops.hashing import reverse_complement

    assert rh in (kmer, reverse_complement(kmer))
    ct = Counttable(*PARAMS)
    with pytest.raises(ValueError):
        ct.reverse_hash(42)


def test_murmur_tables_large_k():
    ct = Counttable(33, 1000, 3)
    seq = "GATTACA" * 6  # 42 bases
    n = ct.consume(seq)
    assert n == 42 - 33 + 1
    with pytest.raises(ValueError):
        Countgraph(33, 1000, 3)


def test_save_load_tables(tmp_path):
    for cls, suffix in ((Countgraph, ".ct"), (Nodegraph, ".ng"),
                        (SmallCountgraph, ".sct")):
        tt = cls(*PARAMS)
        tt.consume("GATTACAGATTACAGATTACAGGG")
        path = str(tmp_path / ("x" + suffix))
        tt.save(path)
        tt2 = cls.load(path)
        assert tt2.ksize() == 20
        assert tt2.hashsizes() == tt.hashsizes()
        assert tt2.get("GATTACAGATTACAGATTAC") == tt.get(
            "GATTACAGATTACAGATTAC")


def test_abundance_distribution(tmp_path):
    cg = Countgraph(*PARAMS)
    trk = Nodegraph(*PARAMS)
    fa = tmp_path / "reads.fa"
    seq = "GATTACAGATTACAGATTACAGGG"
    fa.write_text(">a\n{0}\n>b\n{0}\n".format(seq))
    cg.consume_seqfile(str(fa))
    dist = cg.abundance_distribution(str(fa), trk)
    # 5 distinct kmers, each seen twice
    assert dist[2] == 5
    assert sum(dist) == 5


def test_consume_seqfile(tmp_path):
    cg = Countgraph(*PARAMS)
    fa = tmp_path / "reads.fa"
    fa.write_text(">a\nGATTACAGATTACAGATTACAGGG\n>b\nACCA\n")
    n_reads, n_consumed = cg.consume_seqfile(str(fa))
    assert n_reads == 2
    assert n_consumed == 5
    assert cg.get("GATTACAGATTACAGATTACA"[:20]) == 1


def test_consume_seqfile_banding_union(tmp_path):
    """Banding correctness: union over bands == full count (the
    reference's sharding-equivalence test, tests/test_banding.py)."""
    fa = tmp_path / "reads.fa"
    rng = np.random.default_rng(42)
    seqs = ["".join(rng.choice(list("ACGT"), 50)) for _ in range(20)]
    fa.write_text("".join(">r{}\n{}\n".format(i, s)
                          for i, s in enumerate(seqs)))
    full = Counttable(*PARAMS)
    full.consume_seqfile(str(fa))
    banded = Counttable(*PARAMS)
    for band in range(4):
        banded.consume_seqfile_banding(str(fa), 4, band)
    for s in seqs:
        assert banded.get_kmer_counts(s) == full.get_kmer_counts(s)


def test_consume_seqfile_with_mask(tmp_path):
    fa = tmp_path / "reads.fa"
    seq = "GATTACAGATTACAGATTACAGGG"
    fa.write_text(">a\n{}\n".format(seq))
    mask = Countgraph(*PARAMS)
    mask.consume(seq[:20])  # mask covers the first k-mer only
    cg = Countgraph(*PARAMS)
    cg.consume_seqfile_with_mask(str(fa), mask, 0)
    assert cg.get(seq[:20]) == 0
    assert cg.get(seq[1:21]) == 1


def test_ledger_overflow_count_exactness(monkeypatch, tmp_path):
    """Forcing the deferred counter's ledger to overflow mid-consume
    (tiny KHMER_TPU_DEFER_CAP/KHMER_TPU_CHUNK) must leave BOTH the
    counted table AND n_unique bit-identical to the single-flush
    path: multi-flush claims are exact because keys flush in
    first-occurrence order, so later flushes see earlier claimants as
    pre-count > 0 (ops/deferred.py docstring)."""
    rng = np.random.default_rng(99)
    lut = np.frombuffer(b"ACGT", np.uint8)
    fa = tmp_path / "reads.fa"
    with open(fa, "wb") as f:
        for i in range(2000):
            f.write(b">r%d\n" % i)
            f.write(lut[rng.integers(0, 4, 150)].tobytes() + b"\n")

    full = Countgraph(20, 1_000_000, 4)
    full.consume_seqfile(str(fa))  # default knobs: one flush

    # chunk clamps to one row payload (16384 bases -> ~16k lanes), so
    # max_cap = 32k lanes and the ledger budget = 4*32k = 131072 lanes
    monkeypatch.setenv("KHMER_TPU_CHUNK", "2048")
    monkeypatch.setenv("KHMER_TPU_DEFER_CAP", "4096")
    tiny = Countgraph(20, 1_000_000, 4)
    tiny.consume_seqfile(str(fa))

    assert np.array_equal(np.asarray(tiny.storage.table),
                          np.asarray(full.storage.table))
    assert tiny.n_occupied() == full.n_occupied()
    # ~260k distinct hashes >> the 131k-lane ledger budget: the
    # overflow path must actually have engaged for this test to mean
    # anything
    assert full.n_unique_kmers() > 140_000
    # round 4: multi-flush n_unique is EXACT, not merely close
    assert tiny.n_unique_kmers() == full.n_unique_kmers()


def test_merge_cycle_size_invariance(monkeypatch, tmp_path):
    """The cycle sort size (KHMER_TPU_MERGE_LOG / MERGE_EVERY) is a
    pure performance knob: any value must give a bit-identical table
    AND an identical (retain-path) n_unique.  Protects the hardware
    tuning sweep (benchmarks/tune_consume.py) from silently trading
    correctness for speed."""
    from khmer_tpu.ops.deferred import DeferredCounter

    rng = np.random.default_rng(7)
    lut = np.frombuffer(b"ACGT", np.uint8)
    fa = tmp_path / "reads.fa"
    with open(fa, "wb") as f:
        for i in range(1200):
            f.write(b">r%d\n" % i)
            f.write(lut[rng.integers(0, 4, 150)].tobytes() + b"\n")

    base = Countgraph(20, 1_000_000, 4)
    base.consume_seqfile(str(fa))
    ref_table = np.asarray(base.storage.table)

    for log2 in (17, 19):
        monkeypatch.setattr(DeferredCounter, "MERGE_EVERY", 1 << log2)
        cg = Countgraph(20, 1_000_000, 4)
        cg.consume_seqfile(str(fa))
        assert np.array_equal(np.asarray(cg.storage.table), ref_table), log2
        assert cg.n_unique_kmers() == base.n_unique_kmers(), log2
