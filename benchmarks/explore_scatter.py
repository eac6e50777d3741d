"""One-off exploration: which scatter/gather strategy is fastest on
this TPU for the flush path?  Not part of the bench suite; findings
feed the ops/deferred.py flush kernel design."""

import time

import numpy as np

import khmer_tpu._config  # noqa: F401  (x64 + cache)
import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, *args, iters=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0:1])
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    n = 1 << 24
    bins = 100_000_003
    tbl = jnp.zeros(bins + 1, jnp.uint32)
    idx64 = jnp.asarray(rng.integers(0, bins, n, dtype=np.int64))
    idx32 = idx64.astype(jnp.int32)
    idx32_sorted = jnp.asarray(np.sort(np.asarray(idx64)).astype(np.int32))
    v = jnp.ones(n, jnp.uint32)
    keys = jnp.asarray(np.sort(rng.integers(0, 1 << 63, n, dtype=np.uint64)))

    res = {}

    sc64 = jax.jit(lambda t, i, v: t.at[i].add(v))
    res["scatter_i64_random"] = n / timeit(sc64, tbl, idx64, v) / 1e6

    sc32 = jax.jit(lambda t, i, v: t.at[i].add(v))
    res["scatter_i32_random"] = n / timeit(sc32, tbl, idx32, v) / 1e6

    scu = jax.jit(lambda t, i, v: t.at[i].add(v, unique_indices=True))
    res["scatter_i32_unique_claim"] = n / timeit(scu, tbl, idx32, v) / 1e6

    scsu = jax.jit(lambda t, i, v: t.at[i].add(
        v, unique_indices=True, indices_are_sorted=True))
    res["scatter_i32_sorted_unique"] = (
        n / timeit(scsu, tbl, idx32_sorted, v) / 1e6)

    scs = jax.jit(lambda t, i, v: t.at[i].add(v, indices_are_sorted=True))
    res["scatter_i32_sorted_only"] = (
        n / timeit(scs, tbl, idx32_sorted, v) / 1e6)

    ga64 = jax.jit(lambda t, i: t[i])
    res["gather_i64_random"] = n / timeit(ga64, tbl, idx64) / 1e6
    ga32 = jax.jit(lambda t, i: t[i])
    res["gather_i32_random"] = n / timeit(ga32, tbl, idx32) / 1e6
    gas = jax.jit(lambda t, i: t.at[i].get(
        indices_are_sorted=True, unique_indices=True))
    res["gather_i32_sorted"] = n / timeit(gas, tbl, idx32_sorted) / 1e6

    # mod cost: runtime-array prime vs python-constant prime
    P = 99999989

    moda = jax.jit(lambda h, p: (h % p).astype(jnp.int32))
    parr = jnp.asarray(np.uint64(P))
    res["mod_u64_runtime"] = n / timeit(moda, keys, parr) / 1e6

    modc = jax.jit(lambda h: (h % jnp.uint64(P)).astype(jnp.int32))
    res["mod_u64_const"] = n / timeit(modc, keys) / 1e6

    # u32-pair mod by constant: h = hi*2^32+lo; r = (hi*R32 + lo) % P
    # with R32 = 2^32 % P; needs u64 intermediate once — or double-step
    def mod_pair(hi, lo):
        R32 = np.uint64((1 << 32) % P)
        x = hi.astype(jnp.uint64) * R32 + lo.astype(jnp.uint64)
        return (x % jnp.uint64(P)).astype(jnp.int32)

    hi = (keys >> jnp.uint64(32)).astype(jnp.uint32)
    lo = keys.astype(jnp.uint32)
    modp = jax.jit(mod_pair)
    res["mod_pair_const"] = n / timeit(modp, hi, lo) / 1e6

    # sort rates for the redesigned combine
    w = jnp.ones(n, jnp.uint32)
    i = jnp.arange(n, dtype=jnp.uint32)
    s1 = jax.jit(lambda k: lax.sort(k))
    res["sort_k"] = n / timeit(s1, keys) / 1e6
    s2 = jax.jit(lambda k, a: lax.sort((k, a), num_keys=1))
    res["sort_k_u32"] = n / timeit(s2, keys, i) / 1e6
    s3 = jax.jit(lambda k, a, b: lax.sort((k, a, b), num_keys=1))
    res["sort_k_u32x2"] = n / timeit(s3, keys, w, i) / 1e6
    # sort of i32 bins with u32 payload (per-table bin sort)
    b32 = idx32
    s4 = jax.jit(lambda k, a: lax.sort((k, a), num_keys=1))
    res["sort_i32_u32"] = n / timeit(s4, b32, w) / 1e6

    # fused flush candidate: 4 tables, const primes, i32, one jit
    primes = [100000007, 100000037, 100000039, 100000049]
    offs = np.concatenate([[0], np.cumsum(primes)[:-1]]).astype(np.int64)
    total = int(np.sum(primes))
    big = jnp.zeros(total + 1, jnp.uint32)

    def flush_const(t, k, w):
        for p, o in zip(primes, offs):
            ix = (k % jnp.uint64(p)).astype(jnp.int64) + int(o)
            t = t.at[ix].add(w)
        return t

    fc = jax.jit(flush_const, donate_argnums=0)
    big2 = jnp.zeros(total + 1, jnp.uint32)
    out = fc(big, keys, w)
    np.asarray(out.ravel()[0:1])
    t0 = time.perf_counter()
    out2 = fc(big2, keys, w)
    np.asarray(out2.ravel()[0:1])
    res["flush4_const_i64"] = n / (time.perf_counter() - t0) / 1e6

    for k_, v_ in res.items():
        print(f"{k_:32s} {v_:10.1f} Mlanes/s")


if __name__ == "__main__":
    main()
