"""Pallas attack on the XLA scatter cap (round-5 VERDICT #3).

Round 4 measured XLA scatter/gather hard-capped at 67-108 M lanes/s
(benchmarks/explore_scatter.py), putting the sketch flush at 7.6-13.2
M distinct-lanes/s.  This explorer prototypes Pallas TPU kernels for
the flush's core primitive — scatter-add of N sorted-unique (bin,
val) updates into a [B]-bin table (reference semantics being
replaced: storage.hh:575-628 ByteStorage::add) — and measures them
against the XLA baseline at bench_kernels.py shapes.

Variants:
  xla_sorted    — table.at[idx].add(vals, indices_are_sorted=True)
  pal_vscatter  — Pallas: per-window vector dynamic-index add into a
                  VMEM accumulator (does Mosaic take it, at what rate?)
  pal_loop      — Pallas: fori_loop of scalar dynamic-index adds
  pal_compare   — Pallas: compare-broadcast dense accumulate (VPU)

All Pallas variants stream the table through VMEM in BLK-bin grid
blocks; the sorted updates are windowed by U-aligned DMA rows and
out-of-block lanes are redirected to a trash strip of the VMEM
accumulator, so block boundaries need no exact per-block ranges —
only a searchsorted of window starts.

Usage: python benchmarks/explore_pallas_scatter.py [--small]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(leaves[0].ravel()[0:1])


def timeit(fn, *args, iters=3):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------------------
# scaffolding: table [G, BLK] grid blocks; updates in [NW, U] aligned
# windows; wstart[i]/wcount[i] from one searchsorted outside the
# kernel.  `body(acc, local, vals, inblk)` accumulates one window into
# the (1, BLK+128) VMEM accumulator whose last 128 lanes are trash.


def _make_pallas_scatter(body, B, N, BLK, U, max_win):
    # table block = (8, BCOL) = BLK bins (TPU tiling: sublane 8,
    # lane multiple of 128)
    BCOL = BLK // 8
    assert BCOL % 128 == 0
    G = B // BLK
    NW = N // U

    def kernel(wstart_ref, wcount_ref, idx_ref, val_ref, tbl_ref,
               out_ref, acc, uidx, uval, sidx, sval, sem1, sem2):
        i = pl.program_id(0)
        base = (i * BLK).astype(jnp.int32)
        w0 = wstart_ref[i]
        nw = wcount_ref[i]
        acc[...] = jnp.zeros_like(acc)

        def win(w, _):
            @pl.when(w < nw)
            def _():
                row = w0 + w
                body(acc, base, BLK, BCOL, idx_ref, val_ref, row,
                     uidx, uval, sidx, sval, sem1, sem2)
            return 0

        jax.lax.fori_loop(0, max_win, win, 0)
        out_ref[...] = tbl_ref[...] + acc[:, :BCOL]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # idx [NW, U]
            pl.BlockSpec(memory_space=pl.ANY),   # val [NW, U]
            pl.BlockSpec((8, BCOL), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),  # table block
        ],
        out_specs=pl.BlockSpec((8, BCOL), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, BCOL + 128), jnp.uint32),
            pltpu.VMEM((1, U), jnp.int32),
            pltpu.VMEM((1, U), jnp.uint32),
            pltpu.SMEM((1, U), jnp.int32),
            pltpu.SMEM((1, U), jnp.uint32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G * 8, BCOL), jnp.uint32),
        grid_spec=grid_spec,
        input_output_aliases={4: 0},
    )

    @jax.jit
    def run(table, idx, vals):
        # window w covers updates [w*U, (w+1)*U); block i needs every
        # window containing an idx in [i*BLK, (i+1)*BLK)
        idx = idx.astype(jnp.int32)
        block_lo = jnp.arange(G, dtype=jnp.int32) * BLK
        wstart = jnp.clip(
            jnp.searchsorted(idx, block_lo, side="left") // U, 0, NW - 1)
        wend = jnp.clip(
            (jnp.searchsorted(idx, block_lo + BLK, side="left") + U - 1)
            // U, 0, NW)
        wcount = jnp.maximum(wend - wstart, 0).astype(jnp.int32)
        return call(wstart.astype(jnp.int32), wcount,
                    idx.reshape(NW, U),
                    vals.reshape(NW, U), table.reshape(G * 8, BCOL)
                    ).reshape(-1)

    return run


def _window_vmem(idx_ref, val_ref, row, uidx, uval, sem1, sem2):
    cp1 = pltpu.make_async_copy(idx_ref.at[pl.ds(row, 1), :], uidx,
                                sem1)
    cp2 = pltpu.make_async_copy(val_ref.at[pl.ds(row, 1), :], uval,
                                sem2)
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()


def body_vscatter(acc, base, BLK, BCOL, idx_ref, val_ref, row,
                  uidx, uval, sidx, sval, sem1, sem2):
    # vector dynamic-index accumulate; valid lanes hit unique bins,
    # invalid lanes all hit the trash strip with val 0
    _window_vmem(idx_ref, val_ref, row, uidx, uval, sem1, sem2)
    local = uidx[0, :] - base
    inblk = (local >= 0) & (local < BLK)
    local = jnp.where(inblk, local, BLK)
    vals = jnp.where(inblk, uval[0, :], 0)
    r = jnp.minimum(local // BCOL, 7)
    c = local - r * BCOL
    cur = acc[r, c]
    acc[r, c] = cur + vals


def body_loop(acc, base, BLK, BCOL, idx_ref, val_ref, row,
              uidx, uval, sidx, sval, sem1, sem2):
    # scalar dynamic indexing: operands DMA'd straight into SMEM
    cp1 = pltpu.make_async_copy(idx_ref.at[pl.ds(row, 1), :], sidx,
                                sem1)
    cp2 = pltpu.make_async_copy(val_ref.at[pl.ds(row, 1), :], sval,
                                sem2)
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()
    U = sidx.shape[1]

    def one(u, _):
        b = sidx[0, u] - base

        @pl.when((b >= 0) & (b < BLK))
        def _():
            r = b // BCOL
            c = b - r * BCOL
            acc[r, c] = acc[r, c] + sval[0, u]
        return 0

    jax.lax.fori_loop(0, U, one, 0)


def make_body_compare(BLK_, U, CH=8):
    def body(acc, base, BLK, BCOL, idx_ref, val_ref, row,
             uidx, uval, sidx, sval, sem1, sem2):
        _window_vmem(idx_ref, val_ref, row, uidx, uval, sem1, sem2)
        local = uidx[0, :] - base
        inblk = (local >= 0) & (local < BLK)
        local = jnp.where(inblk, local, BLK).astype(jnp.int32)
        vals = jnp.where(inblk, uval[0, :].astype(jnp.int32), 0)
        bin2d = (jax.lax.broadcasted_iota(jnp.int32, (8, BCOL), 0) * BCOL
                 + jax.lax.broadcasted_iota(jnp.int32, (8, BCOL), 1))
        a = acc[:, :BCOL].astype(jnp.int32)
        if CH == 1:
            # pure-2D variant: one broadcast compare per update
            for u in range(U):
                b = local[u]
                v = vals[u]
                a = a + jnp.where(bin2d == b, v, 0)
        else:
            for c in range(U // CH):
                lc = local[c * CH:(c + 1) * CH]
                vc = vals[c * CH:(c + 1) * CH]
                eq = bin2d[None, :, :] == lc[:, None, None]
                a = a + jnp.sum(
                    jnp.where(eq, vc[:, None, None], 0), axis=0,
                    dtype=jnp.int32)
        acc[:, :BCOL] = a.astype(jnp.uint32)

    return body


def main(small=False):
    rng = np.random.default_rng(0)
    if small:
        B, N, BLK, U = 1 << 16, 1 << 12, 1 << 13, 1 << 10
    else:
        B, N, BLK, U = 100_000_003, 1 << 24, 1 << 13, 1 << 10
    Bp = (B + BLK - 1) // BLK * BLK
    idx_np = np.sort(rng.choice(B, N, replace=False)
                     if N <= B else rng.integers(0, B, N)).astype(np.int64)
    vals_np = rng.integers(1, 5, N).astype(np.uint32)
    table = jnp.zeros(Bp, jnp.uint32)
    idx = jnp.asarray(idx_np)
    vals = jnp.asarray(vals_np)

    xla = jax.jit(lambda t, i, v: t.at[i].add(v, indices_are_sorted=True,
                                              mode="drop"))
    want = np.asarray(xla(table, idx, vals))
    dt = timeit(xla, table, idx, vals)
    print("xla_sorted      %.4fs  %.1f M lanes/s" % (dt, N / dt / 1e6),
          flush=True)

    # a block of BLK bins holds at most BLK sorted-unique updates ->
    # at most BLK/U + 2 aligned windows overlap it
    max_win = BLK // U + 2

    for name, body in [
        ("pal_vscatter", body_vscatter),
        ("pal_loop", body_loop),
        ("pal_compare", make_body_compare(BLK, U)),
        ("pal_compare_2d", make_body_compare(BLK, U, CH=1)),
    ]:
        try:
            run = _make_pallas_scatter(body, Bp, N, BLK, U, max_win)
            got = np.asarray(run(table, idx, vals))
            ok = np.array_equal(got[:B], want[:B])
            dt = timeit(run, table, idx, vals)
            print("%-15s %.4fs  %.1f M lanes/s  correct=%s" %
                  (name, dt, N / dt / 1e6, ok), flush=True)
        except Exception as e:
            print("%-15s FAILED: %s" % (name, str(e)[:300]), flush=True)


if __name__ == "__main__":
    main(small="--small" in sys.argv)
