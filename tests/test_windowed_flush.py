"""Windowed preget/claim-flush equivalence (round-5 kernels).

The dn/trim batch kernels run their unique-key gather and claim-rule
flush in 16 cond-skipped, first-occurrence-ordered windows
(hashtable._windowed_sketch_get/_windowed_claim_flush).  These tests
pin bit-equality against the direct single-call flush across the
boundary cases: distinct counts spanning 0, 1, several, and ALL
windows, pre-loaded tables (claim suppression), and SENTINEL-heavy
tails.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from khmer_tpu.hashtable import (
    _windowed_claim_flush,
    _windowed_sketch_get,
)
from khmer_tpu.ops.deferred import (
    IDX_SENTINEL,
    SENTINEL,
    choose_flush_ops,
)
from khmer_tpu.ops.sketch_ops import SketchSpec, alloc_table, sketch_get
from khmer_tpu.primes import get_n_primes_near_x

U32, U64 = jnp.uint32, jnp.uint64


def _spec():
    return SketchSpec("byte", tuple(get_n_primes_near_x(3, 997)), False)


def _case(n_distinct, N, seed, preload=0):
    rng = np.random.default_rng(seed)
    spec = _spec()
    table = alloc_table(spec)
    if preload:
        pre = rng.integers(0, 1 << 40, preload).astype(np.uint64)
        from khmer_tpu.ops.sketch_ops import sketch_update

        w = jnp.ones(preload, U32)
        table, *_ = sketch_update(
            spec, table, jnp.zeros((), U64), jnp.zeros((), U64),
            jnp.asarray(pre), w, jnp.arange(preload, dtype=U32))
    # compact-front unique keys with SENTINEL tail
    uk = np.full(N, np.uint64(0xFFFFFFFFFFFFFFFF))
    uk[:n_distinct] = np.sort(
        rng.choice(1 << 40, n_distinct, replace=False)).astype(np.uint64)
    totals = np.zeros(N, np.uint32)
    totals[:n_distinct] = rng.integers(1, 9, n_distinct)
    firsts = np.full(N, np.uint32(0xFFFFFFFF))
    firsts[:n_distinct] = rng.permutation(n_distinct).astype(np.uint32)
    return (spec, table, jnp.asarray(uk), jnp.asarray(totals),
            jnp.asarray(firsts))


@pytest.mark.parametrize("n_distinct,N", [
    (0, 4096),          # nothing to flush
    (5, 4096),          # one window
    (1000, 4096),       # ~4 of 16 windows
    (4096, 4096),       # every window active
    (300, 300),         # N not a multiple of 16 (padding path)
])
@pytest.mark.parametrize("preload", [0, 64])
def test_windowed_flush_matches_direct(n_distinct, N, preload):
    spec, table, uk, totals, firsts = _case(n_distinct, N, 7, preload)

    # direct single-window reference: one first-ordered sorted call
    f2, k2, t2 = jax.lax.sort((firsts, uk, totals), num_keys=1)
    ops = choose_flush_ops(spec, N)
    want_tbl, want_new = ops(spec, table, k2, t2, f2, False, False)

    got_tbl, got_new = _windowed_claim_flush(spec, table, uk, totals,
                                             firsts)
    assert int(want_new) == int(got_new)
    assert np.array_equal(np.asarray(want_tbl), np.asarray(got_tbl))


@pytest.mark.parametrize("n_distinct,N", [
    (0, 4096), (5, 4096), (1000, 4096), (4096, 4096), (300, 300),
])
def test_windowed_preget_matches_direct(n_distinct, N):
    spec, table, uk, totals, firsts = _case(n_distinct, N, 11,
                                            preload=128)
    want = sketch_get(spec, table, uk).astype(U32)
    got = _windowed_sketch_get(spec, table, uk,
                               jnp.int32(n_distinct))
    # only the occupied prefix is defined (skipped windows stay 0)
    assert np.array_equal(np.asarray(want)[:n_distinct],
                          np.asarray(got)[:n_distinct])
