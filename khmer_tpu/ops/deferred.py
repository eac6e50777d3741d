"""Deferred (sort-based) bulk counting: the TPU-native load path.

The reference's bulk loaders (load-into-counting / load-graph /
abundance-dist-single; hot loop src/oxli/hashtable.cc:133-158) insert
every k-mer occurrence into the sketch as it streams by.  On TPU a
random scatter/gather runs at ~100 M lanes/s while a 64-bit sort runs
at 250-400 M keys/s, so inserting each *occurrence* (T tables x N
windows of random lanes) is the wrong primitive: round 1 measured
12 MB/s end-to-end against a 5.6 GB/s hash kernel.

This module defers the sketch insert with a CYCLE design: chunks of
hashed windows append raw into a device buffer (a dynamic-update-slice
— no random access, no host round trips); when the buffer reaches the
cycle size (~32M lanes), one sort + two elementwise scans combine
duplicate hashes, and the T-table scatter flushes one lane per
*distinct* hash instead of one per occurrence.  For C-times-repeated
data (any real sequencing run, C >= 10) that divides the
random-access lane count by C; the streaming cost is the hash kernel
plus an append, and total sort volume == lanes appended (distinct
survivors are never re-sorted — cross-cycle duplicates are handled by
the scatter-ADD and cycle-sequential premin reads).

Host/device transfer is bit-packed 4 bases + 8 mask bits per 1.5
bytes (hashtable._pack_chunk) because wire bandwidth, not compute, is
the first bottleneck on tunneled/PCIe-fed accelerators.

Flush-time accounting is exactly the round-1 batch semantics with the
batch window equal to the flush window:
  * n_unique += distinct flushed hashes whose pre-flush min-count was
    zero (the reference's is-new test, storage.hh:575-628, applied
    batch-wise);
  * bigcount candidates = flushed hashes whose table-0 bin crosses 255
    (a sound superset, resolved exactly at save time);
  * occurrence totals are exact segment sums, clamped at TOTAL_CLAMP
    (far above MAX_BIGCOUNT, so reads/bigcounts are unaffected).
"""

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from khmer_tpu.ops.sketch_ops import _bin_idx

U32 = jnp.uint32
U64 = jnp.uint64

SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)
# run totals are clamped here at merge time: far above MAX_BIGCOUNT
# (65535) so every count read and bigcount resolution is exact, while
# keeping u32 cumulative sums free of aliasing for any real input
TOTAL_CLAMP = np.uint32(1 << 20)
# largest flush window (device scatter granularity); actual windows
# are bucketed powers of two <= this so tiny consumes stay tiny
FLUSH_SLICE = 1 << 22
# smallest buffer/bucket granule: one hash-kernel row of lanes
MIN_BUCKET = 1 << 14
# buffer sizing hint for the sharded consumer's per-shard cap
MIN_MERGE = 1 << 24


def _next_pow2(n):
    return 1 << max(int(n) - 1, 0).bit_length()


def default_max_cap():
    """Buffer ceiling in lanes (12 bytes/lane): ~1.5 GB of HBM on a
    real accelerator, modest on the CPU test backend.  Override with
    KHMER_TPU_DEFER_CAP (lanes)."""
    import os

    env = os.environ.get("KHMER_TPU_DEFER_CAP")
    if env:
        return int(env)
    if jax.default_backend() == "cpu":
        return 1 << 23
    return 1 << 27


@partial(jax.jit, donate_argnums=(0, 1))
def append_lanes(keys_buf, wgt_buf, fill, keys, weights):
    """Append one chunk's (key, weight) lanes at position `fill`.

    Lanes with weight 0 are stored as SENTINEL keys (they sort to the
    end and are dropped at merge time)."""
    k = jnp.where(weights > 0, keys, SENTINEL)
    keys_buf = lax.dynamic_update_slice(keys_buf, k, (fill,))
    wgt_buf = lax.dynamic_update_slice(
        wgt_buf, weights.astype(U32), (fill,))
    return keys_buf, wgt_buf


@partial(jax.jit, donate_argnums=(1, 2))
def _copy_into(old_keys, new_keys, new_wgts, old_wgts):
    new_keys = lax.dynamic_update_slice(new_keys, old_keys, (0,))
    new_wgts = lax.dynamic_update_slice(new_wgts, old_wgts, (0,))
    return new_keys, new_wgts


def combine_lanes(keys, wgts):
    """Pure function: combine duplicate hashes in a lane buffer
    (sort + scans + compact).

    Returns (keys, totals, n_valid): distinct keys sorted ascending and
    compacted to the front, SENTINEL padding after; totals clamped at
    TOTAL_CLAMP.  Usable standalone (jitted below as merge_buffer) or
    inside a shard_map-local function (khmer_tpu/parallel/sharded.py).
    """
    ks, ws = lax.sort((keys, wgts), num_keys=1)
    last = jnp.concatenate([ks[1:] != ks[:-1],
                            jnp.ones((1,), bool)])
    csum = jnp.cumsum(ws, dtype=U32)
    # csum value at the end of the previous run, propagated forward:
    # at each run's last lane e = csum; shift right one and cummax
    e = jnp.where(last, csum, U32(0))
    prev_end = lax.cummax(
        jnp.concatenate([jnp.zeros((1,), U32), e[:-1]]))
    total = csum - prev_end  # exact modulo 2^32; true total < 2^32
    total = jnp.minimum(total, TOTAL_CLAMP)
    valid = last & (ks != SENTINEL)
    key2 = jnp.where(valid, ks, SENTINEL)
    total = jnp.where(valid, total, U32(0))
    out_k, out_w = lax.sort((key2, total), num_keys=1)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    return out_k, out_w, n_valid


merge_buffer = jax.jit(combine_lanes, donate_argnums=(0, 1))
merge_buffer.__doc__ = combine_lanes.__doc__


@lru_cache(maxsize=None)
def make_flush_slice_fn(spec):
    """Jitted flush of one bucketed window of distinct (key, total)
    lanes into the sketch table, with batch-window n_unique accounting
    and bigcount-crossing candidate compaction.  Cached per spec so
    repeated consumes on same-geometry sketches reuse the compile."""

    track_bigcount = spec.use_bigcount and spec.kind == "byte"

    @partial(jax.jit, donate_argnums=(0,))
    def fn(table, n_unique, keys, totals):
        w = jnp.where(keys != SENTINEL, totals, U32(0))
        idx = _bin_idx(spec, keys)
        dummy = jnp.int64(spec.total_bins)
        idx = jnp.where(w[None, :] > 0, idx, dummy)
        pre = table[idx]  # [T, F] — one lane per DISTINCT hash
        premin = jnp.min(pre, axis=0)
        new = (premin == 0) & (w > 0)
        n_unique = n_unique + jnp.sum(new.astype(U64))
        table = table.at[idx.reshape(-1)].add(jnp.tile(w, spec.n_tables))
        if track_bigcount:
            cross = (pre[0] + w > 255) & (w > 0)
            cand = jnp.where(cross, keys, SENTINEL)
            cand = lax.sort(cand)
            n_cross = jnp.sum(cross.astype(U32))
            return table, n_unique, cand, n_cross
        return table, n_unique
    return fn


def _merge_bucket(n, cap):
    """Merge-window size covering n lanes: next power of two.  The
    shape set must stay SMALL and deterministic — every new shape is a
    fresh XLA compile (tens of seconds on a tunneled TPU)."""
    return min(max(_next_pow2(n), MIN_BUCKET), cap)


_FETCH_POOL = None


def _fetch_async(arr):
    """Fetch a device scalar on a background thread (a blocking fetch
    costs ~30 ms of round trip on a tunneled device)."""
    global _FETCH_POOL
    if _FETCH_POOL is None:
        from concurrent.futures import ThreadPoolExecutor

        _FETCH_POOL = ThreadPoolExecutor(max_workers=1)
    return _FETCH_POOL.submit(lambda a: int(np.asarray(a)), arr)


class DeferredCounter:
    """Device-side deferred counting buffer for one bulk-consume call.

    Cycle design: hashed (key, weight) lanes append into a device
    buffer with ZERO host round trips (appends are async dispatches at
    a host-tracked offset); when the buffer reaches its cycle size
    (~2*MERGE_EVERY lanes), ONE sort combines duplicates, one scalar
    fetch (~30 ms on a tunneled device) learns the distinct count, and
    the distinct lanes flush into the sketch table; the buffer then
    resets.  Distinct survivors are never re-sorted (duplicates across
    cycles are handled by the scatter-ADD and by flush-sequential
    premin reads), so total sort work == lanes appended, exactly.

    Buffers are sized LAZILY from the first appended chunk: tiny
    consumes (the whole test suite, small files) must not pay
    full-cycle buffer allocs, sorts, or flush windows.
    """

    MERGE_EVERY = 1 << 24

    def __init__(self, storage, chunk_lanes, cap=None, max_cap=None):
        import os

        chunk_lanes = int(chunk_lanes)
        if max_cap is None:
            max_cap = default_max_cap()
            if not os.environ.get("KHMER_TPU_DEFER_CAP"):
                max_cap = min(2 * self.MERGE_EVERY, max_cap)
        max_cap = max(int(max_cap), 2 * chunk_lanes)
        self.max_cap = _next_pow2(max_cap)
        self.chunk_lanes = chunk_lanes
        self.storage = storage
        self.spec = storage._read_spec()
        self._fixed_cap = None if cap is None \
            else min(_next_pow2(int(cap)), self.max_cap)
        self.cap = 0
        self.keys = None
        self.wgts = None
        self.fill = 0
        self._flush_fn = make_flush_slice_fn(self.spec)
        self._track_bigcount = (self.spec.use_bigcount
                                and self.spec.kind == "byte")
        self._pending_cycle = None  # (mk, mw, F, distinct-count future)
        self._bc_pending = []       # deferred bigcount candidate fetches

    def append(self, keys, weights):
        """Append one chunk of hashed lanes."""
        lanes = int(keys.shape[0])
        self._make_room(lanes)
        self.keys, self.wgts = append_lanes(
            self.keys, self.wgts, jnp.int32(self.fill), keys, weights)
        self.fill += lanes

    def append_chunk(self, fn, consumed, inputs, extra=(), lanes=None):
        """Append via a fused hash+filter+append kernel `fn` with
        signature (kbuf, wbuf, fill, consumed, *inputs, *extra)
        -> (kbuf, wbuf, consumed); one device dispatch per chunk.
        `inputs` is the kernel's chunk payload (one packed buffer, or
        data + weights); `lanes` = lane count the kernel emits for
        this chunk's shape (defaults to the full-chunk count)."""
        lanes = self.chunk_lanes if lanes is None else int(lanes)
        self._make_room(lanes)
        self.keys, self.wgts, consumed = fn(
            self.keys, self.wgts, jnp.int32(self.fill), consumed,
            *inputs, *extra)
        self.fill += lanes
        return consumed

    def _make_room(self, lanes):
        if self.keys is None:
            cap = self._fixed_cap if self._fixed_cap is not None else \
                min(max(4 * _next_pow2(lanes), MIN_BUCKET), self.max_cap)
            self._alloc(max(cap, _next_pow2(lanes)))
        if self.fill + lanes <= self.cap:
            return
        if self.cap < self.max_cap:
            # sync-free geometric growth up to the cycle size
            self._grow(self.fill + lanes)
            if self.fill + lanes <= self.cap:
                return
        self._cycle()

    def _alloc(self, cap):
        self.cap = int(cap)
        self.keys = jnp.full((self.cap,), SENTINEL, dtype=U64)
        self.wgts = jnp.zeros((self.cap,), dtype=U32)

    def _grow(self, need=0):
        new_cap = min(max(self.cap * 2, _next_pow2(need)), self.max_cap)
        if new_cap <= self.cap:
            return
        nk = jnp.full((new_cap,), SENTINEL, dtype=U64)
        nw = jnp.zeros((new_cap,), dtype=U32)
        self.keys, self.wgts = _copy_into(self.keys, nk, nw, self.wgts)
        self.cap = new_cap

    def _cycle(self):
        """Combine duplicates (one sort), flush distinct lanes into the
        sketch table, reset the buffer — all ASYNC: the first flush
        window is dispatched speculatively (it covers the distinct
        lanes of any real cycle); the distinct count resolves on a
        background thread and any extra windows flush at the NEXT
        cycle boundary, so the streaming path never blocks on the
        device."""
        if self.fill == 0:
            return
        import os
        import time
        t0 = time.perf_counter() if os.environ.get("KHMER_TPU_TIMING") \
            else None
        self._resolve_cycle()
        bucket = _merge_bucket(self.fill, self.cap)
        if bucket >= self.cap:
            mk, mw, n_valid = merge_buffer(self.keys, self.wgts)
        else:
            mk, mw, n_valid = merge_buffer(
                self.keys[:bucket], self.wgts[:bucket])
        self.keys = None  # donated away; reallocated below
        self.wgts = None
        # bucketed flush windows: tiny consumes stay tiny, bulk ones
        # tile in FLUSH_SLICE windows (power-of-two sizes throughout)
        F = min(max(_next_pow2(self.fill), MIN_BUCKET), FLUSH_SLICE,
                bucket)
        self._flush_window(mk, mw, 0, F)
        self._pending_cycle = (mk, mw, F, _fetch_async(n_valid))
        self._alloc(self.cap)
        self.fill = 0
        if t0 is not None:
            print(f"[deferred] cycle bucket={bucket} dispatched "
                  f"{time.perf_counter()-t0:.3f}s", flush=True)

    def _flush_window(self, mk, mw, off, F):
        st = self.storage
        out = self._flush_fn(st.table, st._n_unique, mk[off: off + F],
                             mw[off: off + F])
        st.table, st._n_unique = out[0], out[1]
        st._loaded_occupied = None
        if self._track_bigcount:
            # candidate fetches are deferred to finish(): two blocking
            # round trips per window otherwise
            self._bc_pending.append((out[2], out[3]))

    def _resolve_cycle(self):
        """Flush any extra windows of the previous cycle (distinct
        count beyond the speculative first window — only happens when
        a cycle's distinct lanes exceed FLUSH_SLICE)."""
        if self._pending_cycle is None:
            return
        mk, mw, F, fut = self._pending_cycle
        self._pending_cycle = None
        n = fut.result()
        for off in range(F, n, F):
            self._flush_window(mk, mw, off, F)

    def finish(self):
        """Flush any buffered lanes into the storage table."""
        if self.keys is None:
            return
        self._cycle()
        self._resolve_cycle()
        st = self.storage
        for cand, n_cross in self._bc_pending:
            nc = int(n_cross)
            if nc:
                hs = np.asarray(cand[:nc])
                st.bigcount_candidates.update(int(x) for x in hs)
        self._bc_pending = []
