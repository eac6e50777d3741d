"""Per-kernel throughput counters: the perf regression harness.

Measures each primitive on the consume/query hot path at production
shapes and prints one JSON object — run on any backend; numbers feed
BENCH_KERNELS.json for regression tracking (SURVEY §5 tracing/perf).

Kernels:
  sort_u64         — flat 64-bit lane sort (M lanes/s), the deferred
                     counter's dominant primitive
  combine_lanes    — full dedup pass: sort + scans + compact sort
  scatter_add      — random u32 scatter-add (M lanes/s)
  gather           — random [T, N] gather (M lanes/s)
  flush_virgin     — full distinct-lane flush, claims + sorted scatter
  flush_preloaded  — same with the pre-consume gather (mask paths)
  loader           — native parse+clean+encode+chunk (MB/s of FASTA)
  consume_e2e      — Countgraph.consume_seqfile on a 70MB read set

The hash kernel GB/s is bench.py's number (one protocol, ADVICE r3);
it is deliberately NOT duplicated here.

Usage: python benchmarks/bench_kernels.py [--json-out PATH]
"""

import json
import os
import sys
import tempfile
import time

import numpy as np


def _sync(x):
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(leaves[0].ravel()[0:1])


def timeit(fn, *args, iters=3):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from khmer_tpu.ops.deferred import (combine_lanes, combine_unit_lanes,
                                        make_flush_fn)
    from khmer_tpu.ops.sketch_ops import SketchSpec, alloc_table
    from khmer_tpu.primes import get_n_primes_near_x

    cpu = jax.default_backend() == "cpu"
    res = {"backend": jax.default_backend()}
    rng = np.random.default_rng(0)

    # sort + combine
    n = 1 << (20 if cpu else 24)
    keys = jnp.asarray(rng.integers(0, 1 << 40, n, dtype=np.uint64))
    wgts = jnp.ones(n, jnp.uint32)
    idx = jnp.arange(n, dtype=jnp.uint32)
    s = jax.jit(lambda k, w: lax.sort((k, w), num_keys=1))
    res["sort_u64_mlanes_s"] = round(n / timeit(s, keys, wgts) / 1e6, 1)
    c = jax.jit(combine_lanes)
    res["combine_lanes_mlanes_s"] = round(
        n / timeit(c, keys, wgts, idx) / 1e6, 1)
    cu = jax.jit(combine_unit_lanes)
    res["combine_unit_mlanes_s"] = round(
        n / timeit(cu, keys, idx) / 1e6, 1)

    # scatter / gather at sketch shapes
    bins = 10_000_019 if cpu else 100_000_003
    tbl = jnp.zeros(bins + 1, jnp.uint32)
    idx = jnp.asarray(rng.integers(0, bins, n, dtype=np.int64))
    sc = jax.jit(lambda t, i: t.at[i].add(jnp.uint32(1)))
    res["scatter_add_mlanes_s"] = round(n / timeit(sc, tbl, idx) / 1e6, 1)
    ga = jax.jit(lambda t, i: t[i])
    res["gather_mlanes_s"] = round(n / timeit(ga, tbl, idx) / 1e6, 1)

    # distinct-lane flush: the full per-table sort + claim + sorted
    # scatter pipeline, virgin (load-into-counting) and preloaded
    # (mask/filter) variants.  One number each, in distinct lanes/s —
    # every lane costs n_tables sorted-scatter lanes plus (preloaded)
    # n_tables gather lanes.
    primes = tuple(get_n_primes_near_x(4, 1_000_000 if cpu else bins))
    spec = SketchSpec("byte", primes, False)
    F = 1 << (18 if cpu else 22)
    fk = jnp.asarray(np.sort(rng.integers(0, 1 << 40, F,
                                          dtype=np.uint64)))
    fw = jnp.ones(F, jnp.uint32)
    ff = jnp.arange(F, dtype=jnp.uint32)

    def flush_once(virgin):
        fn = make_flush_fn(spec, virgin, False)
        _sync(fn(alloc_table(spec), fk, fw, ff))
        t0 = time.perf_counter()
        out = fn(alloc_table(spec), fk, fw, ff)
        _sync(out)
        return F / (time.perf_counter() - t0) / 1e6

    res["flush_virgin_mlanes_s"] = round(flush_once(True), 1)
    res["flush_preloaded_mlanes_s"] = round(flush_once(False), 1)

    # native loader: parse + clean + 2-bit encode + chunk batching,
    # pure host work (no device involved) — the parse ceiling for the
    # consume pipeline
    path = os.path.join(tempfile.gettempdir(), "khmer_tpu_bench_reads.fa")
    if os.path.exists(path):
        from khmer_tpu.native import NativeChunkReader, native_available

        if native_available():
            best = 0.0
            for _ in range(3):
                rd = NativeChunkReader(path, 20, 1 << 22)
                t0 = time.perf_counter()
                for _data, _mask in rd:
                    pass
                best = max(best, os.path.getsize(path) /
                           (time.perf_counter() - t0) / 1e6)
                rd.close()
            res["loader_mbps"] = round(best, 1)

    # end-to-end consume (skipped on cpu: dominated by host parse)
    if not cpu:
        import khmer_tpu

        if os.path.exists(path):
            best = 0.0
            for _ in range(2):
                cg = khmer_tpu.Countgraph(20, 100_000_000, 4)
                t0 = time.perf_counter()
                cg.consume_seqfile(path)
                cg.n_unique_kmers()
                best = max(best, os.path.getsize(path) /
                           (time.perf_counter() - t0) / 1e6)
            res["consume_e2e_mbps"] = round(best, 2)

    print(json.dumps(res))
    if "--json-out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json-out") + 1]
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
