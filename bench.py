"""khmer-tpu headline benchmark: fused k-mer hash+count throughput.

Measures the hot path of `load-into-counting` (reference hot loop:
src/oxli/hashtable.cc:133-158 — >95% of runtime): 2-bit k-mer hashing of
every window of a base stream plus the Count-Min scatter update, on one
chip.  Prints ONE JSON line:

  {"metric": "kmer_count_throughput", "value": <GB/s of bases>,
   "unit": "GB/s", "vs_baseline": <value / 5.0>}

Baseline: the driver-set north-star target of 5 GB/s/chip k-mer hashing
(BASELINE.md; the reference publishes no throughput numbers).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from khmer_tpu.hashtable import _make_consume_fn
    from khmer_tpu.ops.sketch_ops import SketchSpec, alloc_table
    from khmer_tpu.primes import get_n_primes_near_x

    K = 20
    CHUNK = 1 << 24  # 16M bases per device pass
    N_CHUNKS = 8
    WARMUP = 2

    backend = jax.default_backend()
    if backend == "cpu":
        CHUNK = 1 << 20
        N_CHUNKS = 3
        WARMUP = 1

    primes = tuple(get_n_primes_near_x(4, 100_000_000 if backend != "cpu"
                                       else 1_000_000))
    spec = SketchSpec(kind="byte", tablesizes=primes, use_bigcount=False)
    fn = _make_consume_fn(spec, K, "2bit", None, False)

    rng = np.random.default_rng(42)
    table = alloc_table(spec)
    occ = jnp.zeros((), jnp.uint64)
    uniq = jnp.zeros((), jnp.uint64)
    weights = jnp.ones(CHUNK, jnp.uint32)
    chunks = [jnp.asarray(rng.integers(0, 4, CHUNK, dtype=np.uint8))
              for _ in range(min(N_CHUNKS, 4))]

    for i in range(WARMUP):
        table, occ, uniq, _ = fn(table, occ, uniq,
                                 chunks[i % len(chunks)], weights)
    jax.block_until_ready(table)

    t0 = time.perf_counter()
    for i in range(N_CHUNKS):
        table, occ, uniq, _ = fn(table, occ, uniq,
                                 chunks[i % len(chunks)], weights)
    jax.block_until_ready(table)
    dt = time.perf_counter() - t0

    bases = N_CHUNKS * CHUNK
    gbps = bases / dt / 1e9
    print(json.dumps({
        "metric": "kmer_count_throughput",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / 5.0, 4),
    }))


if __name__ == "__main__":
    main()
