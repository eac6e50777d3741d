"""khmer-tpu headline benchmark: k-mer hashing throughput.

Measures the canonical 2-bit k-mer hash kernel — the front of the hot
path of every counting/filtering script (reference hot loop:
src/oxli/hashtable.cc:133-158) — at production shapes on one chip, and
prints ONE JSON line:

  {"metric": "kmer_hash_throughput", "value": <GB/s of bases>,
   "unit": "GB/s", "vs_baseline": <value / 5.0>}

Baseline: the driver-set north-star target of 5 GB/s/chip k-mer hashing
(BASELINE.md; the reference publishes no throughput numbers — its
single-thread CPU hot loop measures in the tens of MB/s).

The full fused consume (hash + Count-Min scatter update) is
benchmarked in tests/test_perf.py; its ceiling is XLA scatter/gather
throughput, tracked separately.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from khmer_tpu.ops.hashing import kmer_hashes_2bit_pm_u32

    K = 20
    backend = jax.default_backend()
    if backend == "cpu":
        R, L = 256, 4115
        iters = 3
    else:
        R, L = 4096, 16403  # ~67M bases per call
        iters = 10

    rng = np.random.default_rng(42)
    codes = jnp.asarray(rng.integers(0, 4, (R, L), dtype=np.uint8))
    lengths = jnp.full((R,), L, jnp.int32)

    # the production kernel emits canonical hashes as (hi, lo) uint32
    # pairs (TPU-native split-radix form, combined to u64 inside the
    # fused consume jit); materialize both halves = full hash output
    fn = jax.jit(lambda c: kmer_hashes_2bit_pm_u32(c, lengths, K)[:2])
    hi, lo = fn(codes)
    _ = np.asarray(hi.ravel()[0:1])  # force real completion
    _ = np.asarray(lo.ravel()[0:1])

    t0 = time.perf_counter()
    for _i in range(iters):
        hi, lo = fn(codes)
    _ = np.asarray(hi.ravel()[0:1])
    _ = np.asarray(lo.ravel()[0:1])
    dt = (time.perf_counter() - t0) / iters

    gbps = R * L / dt / 1e9
    print(json.dumps({
        "metric": "kmer_hash_throughput",
        "value": round(gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(gbps / 5.0, 4),
    }))


if __name__ == "__main__":
    main()
