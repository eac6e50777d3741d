"""Round-2 probes: scatter/gather vs table size, and pallas in-VMEM scatter.

Decides between: (a) bucketed scatter into VMEM-sized regions, (b) pallas
serial RMW scatter, (c) sort-based LSM counting with one final scatter.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, *args, iters=5):
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    _ = np.asarray(leaves[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    _ = np.asarray(leaves[0].ravel()[0:1])
    return (time.perf_counter() - t0) / iters


def probe_table_sizes():
    N = 1 << 22  # 4M lanes
    rng = np.random.default_rng(0)
    for logM in (16, 20, 24, 27):
        M = 1 << logM
        idx = jnp.asarray(rng.integers(0, M, (N,), dtype=np.int64))
        w = jnp.ones((N,), jnp.uint32)
        table = jnp.zeros(M, jnp.uint32)

        @jax.jit
        def sc(tb, ix, ww):
            return tb.at[ix].add(ww)

        @jax.jit
        def gt(tb, ix):
            return tb[ix]

        dts = timeit(sc, table, idx, w)
        dtg = timeit(gt, table, idx)
        print(f"M=2^{logM:2d}: scatter {N/dts/1e6:7.1f} Mlanes/s   "
              f"gather {N/dtg/1e6:7.1f} Mlanes/s", flush=True)


def probe_pallas_scatter():
    from jax.experimental import pallas as pl

    N = 1 << 22          # total updates
    M = 1 << 24          # table bins
    BLK = 1 << 19        # bins per block (2 MB u32)
    NBLK = M // BLK
    UPB = N // NBLK      # updates per block (pre-bucketed, padded)
    rng = np.random.default_rng(0)
    # pre-bucketed updates: block b gets UPB updates all within its range
    local = rng.integers(0, BLK, (NBLK, UPB), dtype=np.int32)
    idx = jnp.asarray(local)
    w = jnp.ones((NBLK, UPB), jnp.uint32)
    table = jnp.zeros((NBLK, BLK), jnp.uint32)

    def kernel(tb_in_ref, idx_ref, w_ref, tb_ref):
        del tb_in_ref  # aliased with tb_ref
        def body(i, _):
            j = idx_ref[0, i]
            tb_ref[0, j] = tb_ref[0, j] + w_ref[0, i]
            return 0
        lax.fori_loop(0, UPB, body, 0)

    @jax.jit
    def run(tb, ix, ww):
        return pl.pallas_call(
            kernel,
            grid=(NBLK,),
            in_specs=[pl.BlockSpec((1, BLK), lambda b: (b, 0)),
                      pl.BlockSpec((1, UPB), lambda b: (b, 0)),
                      pl.BlockSpec((1, UPB), lambda b: (b, 0))],
            out_specs=pl.BlockSpec((1, BLK), lambda b: (b, 0)),
            out_shape=jax.ShapeDtypeStruct((NBLK, BLK), jnp.uint32),
            input_output_aliases={0: 0},
        )(tb, ix, ww)

    try:
        dt = timeit(run, table, idx, w)
        print(f"pallas serial VMEM scatter: {dt*1e3:8.1f} ms  "
              f"{N/dt/1e6:8.1f} Mlanes/s", flush=True)
    except Exception as e:  # noqa
        print(f"pallas scatter failed: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


def probe_sort_pipeline():
    """Full LSM-chunk step: sort u64 hashes + segsum + compact."""
    N = 1 << 22
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.integers(0, 1 << 63, (N,), dtype=np.uint64))
    w = jnp.ones((N,), jnp.uint32)

    @jax.jit
    def step(hh, ww):
        ks, ws = lax.sort((hh, ww), num_keys=1)
        first = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
        segid = jnp.cumsum(first.astype(jnp.int32)) - 1
        segsum = jnp.zeros(N, jnp.uint32).at[segid].add(
            ws, indices_are_sorted=True)
        uniq = jnp.sum(first.astype(jnp.uint32))
        # compacted keys: firsts sort to front keyed by segid
        return ks, segsum, uniq

    dt = timeit(step, h, w)
    print(f"sort+segsum-scatter (LSM chunk step): {dt*1e3:8.1f} ms  "
          f"{N/dt/1e6:8.1f} Mkeys/s", flush=True)

    @jax.jit
    def step2(hh, ww):
        # cumsum-based run totals: total at LAST lane of each run =
        # csum[last] - csum[last_of_prev]; no scatter at all.
        ks, ws = lax.sort((hh, ww), num_keys=1)
        csum = jnp.cumsum(ws.astype(jnp.uint32))
        last = jnp.concatenate([ks[1:] != ks[:-1], jnp.ones((1,), bool)])
        # propagate "csum at previous run end" via max-scan
        prev_end = jnp.where(
            jnp.concatenate([jnp.zeros((1,), bool), last[:-1]]),
            csum - ws, 0)
        prev_end = lax.associative_scan(jnp.maximum, prev_end)
        total = jnp.where(last, csum - prev_end, 0)
        uniq = jnp.sum(last.astype(jnp.uint32))
        return ks, total, uniq

    dt = timeit(step2, h, w)
    print(f"sort+cumsum-segsum (LSM chunk step): {dt*1e3:8.1f} ms  "
          f"{N/dt/1e6:8.1f} Mkeys/s", flush=True)

    # merge of two sorted deduped runs via concat+sort
    h2 = jnp.asarray(
        np.sort(rng.integers(0, 1 << 63, (2 * N,), dtype=np.uint64)))

    @jax.jit
    def merge(a, b):
        ks = jnp.concatenate([a, b])
        return lax.sort(ks)

    dt = timeit(merge, h2, h2)
    print(f"concat+sort 2x8M sorted u64: {dt*1e3:8.1f} ms  "
          f"{4*N/dt/1e6:8.1f} Mkeys/s", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    probe_table_sizes()
    probe_sort_pipeline()
    probe_pallas_scatter()
