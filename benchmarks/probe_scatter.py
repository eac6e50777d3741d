"""Probe TPU scatter/gather variants to pick the consume fast-path design.

Measures (on the real chip):
  1. plain .at[idx].add  (unsorted lanes)          -- round-1 baseline
  2. scatter_add with indices_are_sorted           -- sorted lanes
  3. scatter_add with sorted+unique                -- after sort+segsum
  4. full sort+segsum+scatter pipeline             -- dedup pipeline cost
  5. gather [T,N] plain vs sorted indices
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


def main():
    print("backend:", jax.default_backend(), flush=True)
    N = 1 << 22          # 4M lanes
    T = 4
    TABLE = 1 << 24      # 16M bins
    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, TABLE, (T * N,), dtype=np.int64)
    idx = jnp.asarray(idx_np)
    idx_sorted = jnp.asarray(np.sort(idx_np))
    w = jnp.ones((T * N,), jnp.uint32)
    table = jnp.zeros(TABLE + 1, jnp.uint32)

    @jax.jit
    def plain(tb, ix, ww):
        return tb.at[ix].add(ww)

    @jax.jit
    def sorted_flag(tb, ix, ww):
        return tb.at[ix].add(ww, indices_are_sorted=True)

    @jax.jit
    def sorted_unique(tb, ix, ww):
        return tb.at[ix].add(ww, indices_are_sorted=True, unique_indices=True)

    dt = timeit(plain, table, idx, w)
    print(f"plain scatter        : {dt*1e3:8.1f} ms  {T*N/dt/1e6:8.1f} Mlanes/s", flush=True)
    dt = timeit(sorted_flag, table, idx_sorted, w)
    print(f"sorted scatter       : {dt*1e3:8.1f} ms  {T*N/dt/1e6:8.1f} Mlanes/s", flush=True)
    dt = timeit(sorted_unique, table, idx_sorted, w)
    print(f"sorted+unique scatter: {dt*1e3:8.1f} ms  {T*N/dt/1e6:8.1f} Mlanes/s", flush=True)

    # 4. full dedup pipeline: sort u64 keys, mark firsts, segsum, scatter
    h_np = rng.integers(0, 1 << 63, (N,), dtype=np.uint64)
    h = jnp.asarray(h_np)

    @jax.jit
    def dedup_pipeline(tb, hh, ww):
        ks, ws = lax.sort((hh, ww[:N]), num_keys=1)
        first = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
        segid = jnp.cumsum(first.astype(jnp.int32)) - 1
        segsum = jnp.zeros(N, jnp.uint32).at[segid].add(
            ws, indices_are_sorted=True)
        # scatter unique keys' bins for T tables (keys at positions
        # where first; the compacted run totals live at segsum[:U])
        uk = jnp.zeros(N, jnp.uint64).at[segid].max(
            ks, indices_are_sorted=True)
        ixs = (uk % jnp.uint64(TABLE)).astype(jnp.int64)
        for t in range(T):
            tb = tb.at[ixs].add(segsum)
        return tb

    dt = timeit(dedup_pipeline, table, h, w)
    print(f"dedup pipeline (x{T}) : {dt*1e3:8.1f} ms  {T*N/dt/1e6:8.1f} eff-Mlanes/s", flush=True)

    # 5. gathers
    @jax.jit
    def gth(tb, ix):
        return tb[ix]

    @jax.jit
    def gth_sorted(tb, ix):
        return tb.at[ix].get(indices_are_sorted=True)

    dt = timeit(gth, table, idx)
    print(f"plain gather         : {dt*1e3:8.1f} ms  {T*N/dt/1e6:8.1f} Mlanes/s", flush=True)
    dt = timeit(gth_sorted, table, idx_sorted)
    print(f"sorted gather        : {dt*1e3:8.1f} ms  {T*N/dt/1e6:8.1f} Mlanes/s", flush=True)

    # 6. sort cost alone
    @jax.jit
    def srt(hh, ww):
        return lax.sort((hh, ww[:N]), num_keys=1)

    dt = timeit(srt, h, w)
    print(f"sort u64+u32 (N)     : {dt*1e3:8.1f} ms  {N/dt/1e6:8.1f} Mkeys/s", flush=True)


if __name__ == "__main__":
    main()
