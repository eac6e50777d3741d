"""Multi-chip sharding tests on the 8-device virtual CPU mesh:
the sharded consume/query path must be bit-identical to serial."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from khmer_tpu.ops.hashing import kmer_hashes_2bit, _fmix64_v
from khmer_tpu.ops.sketch_ops import (SketchSpec, alloc_table, sketch_get,
                                      sketch_update)
from khmer_tpu.parallel.sharded import (ShardedCountConsumer, band_owner,
                                        make_mesh, merge_tables_saturating)
from khmer_tpu.primes import get_n_primes_near_x

pytestmark = pytest.mark.multichip

K = 20
CHUNK = 256


def _need_devices(n):
    if len(jax.devices()) < n:
        pytest.skip("needs %d devices" % n)


def _consume_both(mesh, D, S, seed=1):
    spec = SketchSpec("byte", tuple(get_n_primes_near_x(3, 10_000)), True)
    consumer = ShardedCountConsumer(spec, K, "2bit", mesh=mesh, chunk=CHUNK)
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 4, (D, S, CHUNK), dtype=np.uint8)
    weights = np.ones((D, S, CHUNK), np.uint32)
    weights[..., CHUNK - K + 1:] = 0
    consumer.consume_chunks(data, weights)

    # serial reference
    table = alloc_table(spec)
    z = jnp.zeros((), jnp.uint64)
    for d in range(D):
        for s in range(S):
            h, _ = kmer_hashes_2bit(
                jnp.asarray(data[d, s][None, :]),
                jnp.asarray([CHUNK], jnp.int32), K)
            table, _, _, _ = sketch_update(
                spec, table, z, z, h[0][: CHUNK - K + 1],
                jnp.ones(CHUNK - K + 1, jnp.uint32))
    return spec, consumer, data, np.asarray(table)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4), (4, 2)])
def test_sharded_consume_serial_equivalence(shape):
    D, S = shape
    _need_devices(D * S)
    mesh = make_mesh(jax.devices()[: D * S], data=D)
    spec, consumer, data, serial_table = _consume_both(mesh, D, S)

    assert consumer.n_dropped == 0
    merged = consumer.merged_table()
    assert np.array_equal(merged, serial_table)

    # query path: psum-before-min must equal serial reads
    h, _ = kmer_hashes_2bit(
        jnp.asarray(data[0, 0][None, :]), jnp.asarray([CHUNK], jnp.int32),
        K)
    hashes = np.asarray(h[0][:100])
    sharded_counts = consumer.get_counts(hashes)
    serial_counts = np.asarray(sketch_get(
        spec, jnp.asarray(np.concatenate([serial_table])), hashes))
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
