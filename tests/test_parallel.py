"""Multi-chip sharding tests on the 8-device virtual CPU mesh:
the sharded consume/query path must be bit-identical to serial."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from khmer_tpu.ops.hashing import kmer_hashes_2bit
from khmer_tpu.ops.sketch_ops import (SketchSpec, alloc_table, sketch_get,
                                      sketch_update)
from khmer_tpu.parallel.sharded import (ShardedDeferredConsumer, band_owner,
                                        make_mesh, make_sharded_query,
                                        merge_tables_saturating)
from khmer_tpu.primes import get_n_primes_near_x

pytestmark = pytest.mark.multichip

K = 20
CHUNK = 256


def _need_devices(n):
    if len(jax.devices()) < n:
        pytest.skip("needs %d devices" % n)


def _ref_n_unique(primes, ordered_hashes):
    """Reference-exact sequential n_unique (storage.hh:176-203,
    :575-628): an occurrence is new iff some table bin is zero
    immediately before its insert, processed in stream order."""
    tables = [np.zeros(int(p), np.uint32) for p in primes]
    n = 0
    for h in np.asarray(ordered_hashes, np.uint64):
        new = False
        for t, p in zip(tables, primes):
            b = int(h % np.uint64(p))
            if t[b] == 0:
                new = True
            t[b] += 1
        n += int(new)
    return n


def _consume_both(mesh, D, S, seed=1):
    spec = SketchSpec("byte", tuple(get_n_primes_near_x(3, 10_000)), True)
    consumer = ShardedDeferredConsumer(spec, K, "2bit", mesh=mesh,
                                       chunk=CHUNK, from_codes=True)
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 4, (D, S, CHUNK), dtype=np.uint8)
    weights = np.ones((D, S, CHUNK), np.uint8)
    weights[..., CHUNK - K + 1:] = 0
    for d in range(D):
        for s in range(S):
            consumer.add_chunk(data[d, s], weights[d, s])
    delta, n_unique, n_consumed, _ = consumer.finish(virgin=True)

    # serial reference
    table = alloc_table(spec)
    z = jnp.zeros((), jnp.uint64)
    all_h = []
    for d in range(D):
        for s in range(S):
            h, _ = kmer_hashes_2bit(
                jnp.asarray(data[d, s][None, :]),
                jnp.asarray([CHUNK], jnp.int32), K)
            hs = h[0][: CHUNK - K + 1]
            all_h.append(np.asarray(hs))
            table, _, _, _ = sketch_update(
                spec, table, z, z, hs,
                jnp.ones(CHUNK - K + 1, jnp.uint32))
    truth = _ref_n_unique(spec.tablesizes, np.concatenate(all_h))
    return (spec, consumer, data, np.asarray(table), delta, n_unique,
            n_consumed, truth)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4), (4, 2)])
def test_sharded_consume_serial_equivalence(shape):
    D, S = shape
    _need_devices(D * S)
    mesh = make_mesh(jax.devices()[: D * S], data=D)
    (spec, consumer, data, serial_table, delta, n_unique, n_consumed,
     truth) = _consume_both(mesh, D, S)

    assert consumer.n_dropped == 0
    assert n_consumed == D * S * (CHUNK - K + 1)
    # reference-exact sequential n_unique (claim rule)
    assert n_unique == truth
    assert np.array_equal(np.asarray(delta), serial_table)

    # query path: psum-before-min must equal serial reads
    h, _ = kmer_hashes_2bit(
        jnp.asarray(data[0, 0][None, :]), jnp.asarray([CHUNK], jnp.int32),
        K)
    hashes = np.asarray(h[0][:100])
    query = make_sharded_query(spec, mesh)
    sharded_counts = np.asarray(query(consumer.tables,
                                      jnp.asarray(hashes)))
    serial_counts = np.asarray(sketch_get(
        spec, jnp.asarray(serial_table), jnp.asarray(hashes)))
    assert np.array_equal(sharded_counts, serial_counts)
    assert sharded_counts.min() >= 1


def test_band_owner_uniform():
    # mixed routing must spread non-uniform (low-entropy) 2-bit hashes
    h = jnp.arange(4096, dtype=jnp.uint64)  # tiny values: all in band 0 raw
    owners = np.asarray(band_owner(h, 8))
    counts = np.bincount(owners, minlength=8)
    assert counts.min() > 0
    assert counts.max() < 4096 / 8 * 2


def test_band_owner_partition():
    # fmix is a bijection: every hash has exactly one owner in range
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.integers(0, 2 ** 63, 1000, dtype=np.int64)
                    .astype(np.uint64))
    owners = np.asarray(band_owner(h, 5))
    assert owners.min() >= 0 and owners.max() < 5


def test_distributed_count_matches_serial(ref_test_data):
    _need_devices(8)
    from khmer_tpu.graph import Countgraph
    from khmer_tpu.native import native_available
    from khmer_tpu.parallel.multihost import distributed_count

    if not native_available():
        pytest.skip("native loader not built")
    infile = ref_test_data + "/100-reads.fq.gz"
    spec = SketchSpec("byte", tuple(get_n_primes_near_x(3, 100000)), True)
    c = distributed_count([infile], spec, 20, chunk=4096)
    g = Countgraph(20, primes=list(spec.tablesizes))
    g.consume_seqfile(infile)
    assert c.n_dropped == 0
    assert c.n_unique_kmers() == g.n_unique_kmers()
    assert np.array_equal(c.merged_table(), np.asarray(g.storage.table))


def test_merge_is_plain_sum():
    spec = SketchSpec("byte", (101,), True)
    t = jnp.ones((2, 2, spec.total_bins + 1), jnp.uint32)
    merged = merge_tables_saturating(t, spec)
    assert np.asarray(merged).max() == 4


# ---------------------------------------------------------------------------
# The deferred sharded consume through the USER-FACING pipeline API
# ---------------------------------------------------------------------------


def _write_fasta(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(">r%d\n%s\n" % (i, s))


def _random_reads(n, length, seed=0):
    rng = np.random.default_rng(seed)
    return ["".join("ACGT"[c] for c in rng.integers(0, 4, length))
            for _ in range(n)]


def test_consume_seqfile_sharded_matches_serial(tmpdir, monkeypatch):
    _need_devices(2)
    from khmer_tpu.graph import Countgraph

    infile = str(tmpdir.join("reads.fa"))
    _write_fasta(infile, _random_reads(300, 90, seed=3) * 3)

    monkeypatch.setenv("KHMER_TPU_SHARDED", "0")
    serial = Countgraph(K, 9973, 3)
    sr, sc = serial.consume_seqfile(infile)

    monkeypatch.setenv("KHMER_TPU_SHARDED", "1")
    sharded = Countgraph(K, 9973, 3)
    assert sharded._use_sharded()
    hr, hc = sharded.consume_seqfile(infile)

    assert (sr, sc) == (hr, hc)
    assert np.array_equal(np.asarray(serial.storage.table),
                          np.asarray(sharded.storage.table))
    assert serial.n_unique_kmers() == sharded.n_unique_kmers()
    assert serial.n_occupied() == sharded.n_occupied()


def test_consume_seqfile_sharded_skewed_polyA(tmpdir, monkeypatch):
    """Round-1 routing dropped overflow lanes under skew (all poly-A
    k-mers own-hash to ONE shard); the deferred router must be exact."""
    _need_devices(2)
    from khmer_tpu.graph import Countgraph

    infile = str(tmpdir.join("polya.fa"))
    # ~27k copies of the same k-mer + a sprinkle of distinct ones
    seqs = ["A" * 300] * 90 + _random_reads(10, 60, seed=7)
    _write_fasta(infile, seqs)

    monkeypatch.setenv("KHMER_TPU_SHARDED", "0")
    serial = Countgraph(K, 9973, 3)
    serial.set_use_bigcount(True)
    sr, sc = serial.consume_seqfile(infile)

    monkeypatch.setenv("KHMER_TPU_SHARDED", "1")
    sharded = Countgraph(K, 9973, 3)
    sharded.set_use_bigcount(True)
    hr, hc = sharded.consume_seqfile(infile)

    assert (sr, sc) == (hr, hc)
    assert np.array_equal(np.asarray(serial.storage.table),
                          np.asarray(sharded.storage.table))
    # bigcount: the poly-A k-mer passed 255 and must resolve exactly
    assert serial.get("A" * K) == sharded.get("A" * K)
    assert sharded.get("A" * K) > 255
    assert serial.storage.resolved_bigcounts() == \
        sharded.storage.resolved_bigcounts()


def test_consume_seqfile_sharded_nodegraph(tmpdir, monkeypatch):
    _need_devices(2)
    from khmer_tpu.graph import Nodegraph

    infile = str(tmpdir.join("reads.fa"))
    _write_fasta(infile, _random_reads(100, 80, seed=11))

    monkeypatch.setenv("KHMER_TPU_SHARDED", "0")
    serial = Nodegraph(K, 4999, 3)
    serial.consume_seqfile(infile)

    monkeypatch.setenv("KHMER_TPU_SHARDED", "1")
    sharded = Nodegraph(K, 4999, 3)
    sharded.consume_seqfile(infile)

    assert np.array_equal(np.asarray(serial.storage.raw_bytes()),
                          np.asarray(sharded.storage.raw_bytes()))
    assert serial.n_unique_kmers() == sharded.n_unique_kmers()


def test_sharded_n_unique_serial_exact_under_saturation(tmpdir,
                                                        monkeypatch):
    """Round-2's VERDICT #4: the n_unique estimator must not depend on
    the device count, even when the table saturates (heavy bin
    collisions).  Both the serial and sharded deferred paths implement
    the reference's exact sequential claim rule, so they agree
    bit-for-bit with each other AND with a host-side replay of the
    reference's serial insert loop."""
    _need_devices(2)
    from khmer_tpu.graph import Countgraph

    infile = str(tmpdir.join("sat.fa"))
    # ~36k distinct k-mers into 3 x ~1000-bin tables: heavily saturated
    reads = _random_reads(400, 110, seed=5)
    _write_fasta(infile, reads)

    monkeypatch.setenv("KHMER_TPU_SHARDED", "0")
    serial = Countgraph(K, primes=[1009, 1013, 1019])
    serial.consume_seqfile(infile)

    monkeypatch.setenv("KHMER_TPU_SHARDED", "1")
    sharded = Countgraph(K, primes=[1009, 1013, 1019])
    sharded.consume_seqfile(infile)

    # reference truth: sequential replay of the serial insert loop
    hashes = [np.asarray(serial.get_kmer_hashes(r), np.uint64)
              for r in reads]
    truth = _ref_n_unique([1009, 1013, 1019], np.concatenate(hashes))

    assert serial.n_unique_kmers() == truth
    assert sharded.n_unique_kmers() == truth
    assert np.array_equal(np.asarray(serial.storage.table),
                          np.asarray(sharded.storage.table))


def test_preloaded_table_n_unique_matches_serial(tmpdir, monkeypatch):
    """Non-virgin consume: the premin gather against the pre-consume
    base must give the same n_unique on serial and sharded paths."""
    _need_devices(2)
    from khmer_tpu.graph import Countgraph

    pre = str(tmpdir.join("pre.fa"))
    infile = str(tmpdir.join("reads.fa"))
    _write_fasta(pre, _random_reads(50, 80, seed=21))
    _write_fasta(infile, _random_reads(200, 90, seed=22))

    results = []
    for mode in ("0", "1"):
        monkeypatch.setenv("KHMER_TPU_SHARDED", "0")
        g = Countgraph(K, 9973, 3)
        g.consume_seqfile(pre)  # same serial preload for both
        monkeypatch.setenv("KHMER_TPU_SHARDED", mode)
        g.consume_seqfile(infile)
        results.append((g.n_unique_kmers(),
                        np.asarray(g.storage.table)))
    assert results[0][0] == results[1][0]
    assert np.array_equal(results[0][1], results[1][1])


def test_bin_sharded_graph_layer_parity(tmpdir):
    """Capacity-scaling layout (VERDICT round-2 #10): the flat bin
    array sharded across the mesh on the BIN axis.  Consume, counts,
    traversal degrees, and find_all_tags partition BFS all run
    UNCHANGED against the sharded table and match the serial graph."""
    _need_devices(2)
    from khmer_tpu.graph import Nodegraph

    rng = np.random.default_rng(17)
    seqs = ["".join("ACGT"[c] for c in rng.integers(0, 4, 120))
            for _ in range(30)]

    serial = Nodegraph(K, 4999, 3)
    sharded = Nodegraph(K, 4999, 3)
    sharded.storage.shard_table()
    for s in seqs:
        serial.consume_and_tag(s)
        sharded.consume_and_tag(s)
    n = serial.storage.table.shape[0]  # sharded table is tail-padded
    assert np.array_equal(np.asarray(serial.storage.table),
                          np.asarray(sharded.storage.table)[:n])
    assert str(sharded.storage.table.sharding) != \
        str(serial.storage.table.sharding)

    for s in seqs[:6]:
        kmer = s[:K]
        assert sharded.get(kmer) == serial.get(kmer)
        assert sharded.kmer_degree(kmer) == serial.kmer_degree(kmer)

    from khmer_tpu.partitioning import SubsetPartition

    sp_a = SubsetPartition(serial)
    sp_b = SubsetPartition(sharded)
    seed = serial.hash(seqs[0][:K])
    tags_a = sp_a.find_all_tags(seed)
    tags_b = sp_b.find_all_tags(seed)
    assert tags_a.tagged_kmers == tags_b.tagged_kmers
