"""Deferred (sort-based) bulk counting: the TPU-native load path.

The reference's bulk loaders (load-into-counting / load-graph /
abundance-dist-single; hot loop src/oxli/hashtable.cc:133-158) insert
every k-mer occurrence into the sketch as it streams by.  On TPU a
random scatter/gather runs at ~100 M lanes/s while a 64-bit sort runs
at 200-300 M keys/s, so inserting each *occurrence* (T tables x N
windows of random lanes) is the wrong primitive: round 1 measured
12 MB/s end-to-end against a 5.6 GB/s hash kernel.

Round-3 design ("retain mode"): the sketch scatter is deferred to the
very END of the consume.

  * chunks of hashed windows append raw into a device KEY buffer (a
    dynamic-update-slice — no random access, no host round trips).
    The streaming path is unit-weight (a window either counts once or
    is invalid), so only keys move: invalid windows are SENTINEL keys.
  * when the buffer reaches its cycle size, one keys-only sort finds
    duplicate runs, run lengths become the occurrence totals, and one
    compaction sort packs the distinct (key, total) lanes to the
    front.  The compacted lanes are RETAINED in a device-side LEDGER
    (a bag of per-cycle distinct runs) instead of being scattered into
    the sketch; the append buffer resets.
  * finish() combines the ledger (cross-cycle duplicates add), then
    performs ONE flush: a premin/gather phase against the PRE-CONSUME
    table (n_unique and bigcount accounting), then one scatter-add of
    one lane per globally-distinct hash.  When the consume started
    from a virgin (all-zero) table — the load-into-counting case — the
    gather phase is skipped entirely: every distinct key is new and
    bigcount candidates are simply totals > MAX_KCOUNT.

For C-times-repeated data (any real sequencing run, C >= 10) the
random-access lane count is total-distinct, not occurrences, and it is
paid ONCE per consume rather than once per cycle.  Host/device
transfer is bit-packed (hashtable._pack_chunk) because wire bandwidth
is the first bottleneck on tunneled/PCIe-fed accelerators.

n_unique semantics (shared with parallel/sharded.py so the sharded
path is bit-equal): n_unique += the number of distinct consumed
hashes whose min-over-tables count in the PRE-CONSUME table was zero.
For small consumes this is identical to the round-2 batch-window rule
(one window covered the whole file); for bulk consumes it is the
batch rule with the window equal to the consume — deterministic,
device-count-independent, and >= the reference's serial estimate
(within-consume bin collisions never suppress it).  If the ledger
overflows its capacity (more distinct lanes than KHMER_TPU_DEFER_CAP)
the overflowing prefix is flushed mid-consume and the estimator
becomes sequential-batch for the remainder, exactly round-2 behavior.
"""

import os
import time
from collections import defaultdict
from contextlib import contextmanager
from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from khmer_tpu.ops.sketch_ops import _bin_idx

U32 = jnp.uint32
U64 = jnp.uint64
I32 = jnp.int32

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


# -- stage timing (KHMER_TPU_TIMING=1) --------------------------------------

STAGE_TIMES = defaultdict(float)
STAGE_LANES = defaultdict(int)
_TIMING = bool(os.environ.get("KHMER_TPU_TIMING"))


def timing_enabled():
    return _TIMING


def reset_stage_times():
    STAGE_TIMES.clear()
    STAGE_LANES.clear()


def _force(x):
    """Force device completion for timing (block_until_ready returns
    early through the axon tunnel; a 1-element fetch does not)."""
    if x is not None:
        np.asarray(jax.numpy.ravel(x)[0:1])


@contextmanager
def stage(name, lanes=0, sync=None):
    """Accumulate wall time (and lane counts) per pipeline stage when
    KHMER_TPU_TIMING is set; otherwise free.  In timing mode each
    stage drains the device queue (accurate on CPU/PCIe backends; the
    axon tunnel can report barriers early — see memory notes)."""
    if not _TIMING:
        yield
        return
    t0 = time.perf_counter()
    yield
    if sync is not None:
        _force(sync)
    else:
        try:
            jax.effects_barrier()
        except Exception:
            pass
    STAGE_TIMES[name] += time.perf_counter() - t0
    STAGE_LANES[name] += int(lanes)


if _TIMING and os.environ.get("KHMER_TPU_TIMING_OUT"):
    import atexit as _atexit
    import json as _json

    def _dump_stage_times(path=os.environ["KHMER_TPU_TIMING_OUT"]):
        with open(path, "w") as f:
            _json.dump({"times_s": {k: round(v, 4)
                                    for k, v in STAGE_TIMES.items()},
                        "lanes": dict(STAGE_LANES)}, f)

    _atexit.register(_dump_stage_times)


def _next_pow2(n):
    return 1 << max(int(n) - 1, 0).bit_length()


def default_max_cap():
    """Buffer ceiling in lanes (8 bytes/lane for the unit-weight key
    buffer): ~1 GB of HBM on a real accelerator, modest on the CPU
    test backend.  Override with KHMER_TPU_DEFER_CAP (lanes)."""
    env = os.environ.get("KHMER_TPU_DEFER_CAP")
    if env:
        return int(env)
    if jax.default_backend() == "cpu":
        return 1 << 23
    return 1 << 27


# -- appends -----------------------------------------------------------------


@partial(jax.jit, donate_argnums=(0, 1))
def append_lanes(keys_buf, wgt_buf, fill, keys, weights):
    """Append one chunk's (key, weight) lanes at position `fill`
    (non-unit path).  Lanes with weight 0 are stored as SENTINEL keys
    (they sort to the end and are dropped at merge time)."""
    k = jnp.where(weights > 0, keys, SENTINEL)
    keys_buf = lax.dynamic_update_slice(keys_buf, k, (fill,))
    wgt_buf = lax.dynamic_update_slice(
        wgt_buf, weights.astype(U32), (fill,))
    return keys_buf, wgt_buf


@partial(jax.jit, donate_argnums=(0,))
def append_keys(keys_buf, fill, keys, weights):
    """Append one chunk's unit-weight lanes at position `fill`: only
    keys move; invalid lanes (weight 0) are SENTINEL keys."""
    k = jnp.where(weights > 0, keys, SENTINEL)
    return lax.dynamic_update_slice(keys_buf, k, (fill,))


@partial(jax.jit, donate_argnums=(1,))
def _copy_keys_into(old_keys, new_keys):
    return lax.dynamic_update_slice(new_keys, old_keys, (0,))


@partial(jax.jit, donate_argnums=(1, 2))
def _copy_pair_into(old_keys, new_keys, new_wgts, old_wgts):
    new_keys = lax.dynamic_update_slice(new_keys, old_keys, (0,))
    new_wgts = lax.dynamic_update_slice(new_wgts, old_wgts, (0,))
    return new_keys, new_wgts


@partial(jax.jit, donate_argnums=(0, 1))
def _ledger_append(ledger_k, ledger_w, block_k, block_w, off):
    """Append one compacted distinct block into the ledger bag."""
    ledger_k = lax.dynamic_update_slice(ledger_k, block_k, (off,))
    ledger_w = lax.dynamic_update_slice(ledger_w, block_w, (off,))
    return ledger_k, ledger_w


# -- combines ----------------------------------------------------------------


def combine_lanes(keys, wgts):
    """Pure function: combine duplicate hashes in a (key, weight) lane
    buffer (sort + scans + compact sort).

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


def combine_unit_lanes(keys):
    """combine_lanes for the unit-weight streaming path: every valid
    lane counts once, so the first pass is a KEYS-ONLY sort (~1.5x the
    pair sort's throughput) and occurrence totals are run lengths."""
    ks = lax.sort(keys)
    neq = ks[1:] != ks[:-1]
    first = jnp.concatenate([jnp.ones((1,), bool), neq])
    last = jnp.concatenate([neq, jnp.ones((1,), bool)])
    idx = lax.iota(I32, ks.shape[0])
    start = lax.cummax(jnp.where(first, idx, I32(0)))
    runlen = (idx - start + 1).astype(U32)
    valid = last & (ks != SENTINEL)
    total = jnp.where(valid, jnp.minimum(runlen, TOTAL_CLAMP), U32(0))
    key2 = jnp.where(valid, ks, SENTINEL)
    out_k, out_w = lax.sort((key2, total), num_keys=1)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    return out_k, out_w, n_valid


merge_buffer = jax.jit(combine_lanes, donate_argnums=(0, 1))
merge_buffer.__doc__ = combine_lanes.__doc__
merge_unit_buffer = jax.jit(combine_unit_lanes, donate_argnums=(0,))
merge_unit_buffer.__doc__ = combine_unit_lanes.__doc__


# -- flush kernels -------------------------------------------------------------


@lru_cache(maxsize=None)
def make_premin_fn(spec):
    """Jitted PRE-SCATTER accounting over one window of distinct
    (key, total) lanes: gathers the min-over-tables count from the
    (pre-flush) table for n_unique (the reference's is-new test,
    storage.hh:575-628, applied consume-wide) and, for bigcount byte
    sketches, compacts the 255-crossing candidate hashes.

    fn(table, keys, totals) -> (n_new u64[, cand u64[F], n_cross u32])
    The table is NOT donated — every window of a flush premins against
    the same pre-consume state."""
    track_bigcount = spec.use_bigcount and spec.kind == "byte"

    @jax.jit
    def fn(table, keys, totals):
        w = jnp.where(keys != SENTINEL, totals, U32(0))
        idx = _bin_idx(spec, keys)
        dummy = jnp.int64(spec.total_bins)
        idx = jnp.where(w[None, :] > 0, idx, dummy)
        pre = table[idx]  # [T, F] — one lane per DISTINCT hash
        premin = jnp.min(pre, axis=0)
        n_new = jnp.sum(((premin == 0) & (w > 0)).astype(U64))
        if track_bigcount:
            cross = (pre[0] + w > 255) & (w > 0)
            cand = lax.sort(jnp.where(cross, keys, SENTINEL))
            n_cross = jnp.sum(cross.astype(U32))
            return n_new, cand, n_cross
        return n_new
    return fn


@lru_cache(maxsize=None)
def make_virgin_account_fn(track_bigcount):
    """Accounting for a flush into a VIRGIN (all-zero) table: premin
    is identically zero, so n_new = the number of valid lanes and the
    bigcount candidates are simply totals > 255 — no gather at all."""

    @jax.jit
    def fn(keys, totals):
        w = jnp.where(keys != SENTINEL, totals, U32(0))
        n_new = jnp.sum((w > 0).astype(U64))
        if track_bigcount:
            cross = w > 255
            cand = lax.sort(jnp.where(cross, keys, SENTINEL))
            n_cross = jnp.sum(cross.astype(U32))
            return n_new, cand, n_cross
        return n_new
    return fn


@lru_cache(maxsize=None)
def make_scatter_fn(spec):
    """Jitted scatter-add of one window of distinct (key, total) lanes
    into the sketch table: T random lanes per DISTINCT hash — the only
    random table access of the whole consume."""

    @partial(jax.jit, donate_argnums=(0,))
    def fn(table, keys, totals):
        w = jnp.where(keys != SENTINEL, totals, U32(0))
        idx = _bin_idx(spec, keys)
        dummy = jnp.int64(spec.total_bins)
        idx = jnp.where(w[None, :] > 0, idx, dummy)
        return table.at[idx.reshape(-1)].add(jnp.tile(w, spec.n_tables))
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

    Retain/ledger design (module docstring): appends are async
    dispatches at a host-tracked offset; each full buffer is combined
    by sort (one keys-only sort + one compaction sort on the
    unit-weight path) and the distinct survivors are RETAINED in a
    device ledger; finish() combines the ledger and scatters the
    sketch table exactly once, per globally-distinct hash.

    Buffers are sized LAZILY from the first appended chunk: tiny
    consumes (the whole test suite, small files) must not pay
    full-cycle buffer allocs, sorts, or flush windows — for them the
    behavior degenerates to exactly one combine + one flush window.
    """

    # cycle sort size: bigger = fewer sorts per consume, more HBM.
    # KHMER_TPU_MERGE_LOG overrides for hardware tuning sweeps
    # (benchmarks/tune_consume.py).
    MERGE_EVERY = 1 << int(os.environ.get("KHMER_TPU_MERGE_LOG", "25"))

    def __init__(self, storage, chunk_lanes, cap=None, max_cap=None,
                 unit=True):
        chunk_lanes = int(chunk_lanes)
        if max_cap is None:
            max_cap = default_max_cap()
            if not os.environ.get("KHMER_TPU_DEFER_CAP"):
                max_cap = min(2 * self.MERGE_EVERY, max_cap)
        max_cap = max(int(max_cap), 2 * chunk_lanes)
        self.max_cap = _next_pow2(max_cap)
        # the ledger holds DISTINCT lanes only — give it more headroom
        # than the append buffer before the overflow fallback degrades
        # the n_unique estimator to sequential-batch semantics
        self.max_ledger = 4 * self.max_cap
        self.chunk_lanes = chunk_lanes
        self.storage = storage
        self.spec = storage._read_spec()
        self.unit = bool(unit)
        self._fixed_cap = None if cap is None \
            else min(_next_pow2(int(cap)), self.max_cap)
        self.cap = 0
        self.keys = None
        self.wgts = None       # only allocated on the non-unit path
        self.fill = 0
        self._track_bigcount = (self.spec.use_bigcount
                                and self.spec.kind == "byte")
        self._premin_fn = make_premin_fn(self.spec)
        self._virgin_fn = make_virgin_account_fn(self._track_bigcount)
        self._scatter_fn = make_scatter_fn(self.spec)
        # ledger: bag of per-cycle compacted distinct (key,total) runs
        self.ledger_k = None
        self.ledger_w = None
        self.ledger_cap = 0
        self.ledger_fill = 0
        self._pending_cycle = None  # (ck, cw, distinct-count future)
        self._bc_pending = []       # deferred bigcount candidate fetches

    # -- streaming ----------------------------------------------------------

    def append(self, keys, weights):
        """Append one chunk of hashed lanes."""
        lanes = int(keys.shape[0])
        self._make_room(lanes)
        if self.unit:
            self.keys = append_keys(
                self.keys, jnp.int32(self.fill), keys, weights)
        else:
            self.keys, self.wgts = append_lanes(
                self.keys, self.wgts, jnp.int32(self.fill), keys,
                weights)
        self.fill += lanes

    def append_chunk(self, fn, consumed, inputs, extra=(), lanes=None):
        """Append via a fused hash+filter+append kernel `fn` with
        signature (kbuf, fill, consumed, *inputs, *extra)
        -> (kbuf, consumed) on the unit path (the default; weights are
        implied 1 and invalid lanes are SENTINEL keys), or
        (kbuf, wbuf, fill, ...) -> (kbuf, wbuf, consumed) otherwise;
        one device dispatch per chunk."""
        lanes = self.chunk_lanes if lanes is None else int(lanes)
        self._make_room(lanes)
        if self.unit:
            self.keys, consumed = fn(
                self.keys, jnp.int32(self.fill), consumed,
                *inputs, *extra)
        else:
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
        if not self.unit:
            self.wgts = jnp.zeros((self.cap,), dtype=U32)

    def _grow(self, need=0):
        new_cap = min(max(self.cap * 2, _next_pow2(need)), self.max_cap)
        if new_cap <= self.cap:
            return
        nk = jnp.full((new_cap,), SENTINEL, dtype=U64)
        if self.unit:
            self.keys = _copy_keys_into(self.keys, nk)
        else:
            nw = jnp.zeros((new_cap,), dtype=U32)
            self.keys, self.wgts = _copy_pair_into(
                self.keys, nk, nw, self.wgts)
        self.cap = new_cap

    # -- cycle: combine the append buffer, retain in the ledger --------------

    def _cycle(self):
        """Combine duplicates in the append buffer (sorts) and hand the
        compacted distinct lanes to the ledger.  ASYNC: the distinct
        count resolves on a background thread; the ledger append
        happens at the NEXT cycle boundary (or at finish), so the
        streaming path never blocks on the device."""
        if self.fill == 0:
            return
        self._resolve_cycle()
        bucket = _merge_bucket(self.fill, self.cap)
        with stage("combine", lanes=self.fill):
            if bucket >= self.cap:
                seg_k, seg_w = self.keys, self.wgts
            else:
                seg_k = self.keys[:bucket]
                seg_w = None if self.unit else self.wgts[:bucket]
            if self.unit:
                ck, cw, n_valid = merge_unit_buffer(seg_k)
            else:
                ck, cw, n_valid = merge_buffer(seg_k, seg_w)
        self.keys = None  # donated away; reallocated below
        self.wgts = None
        self._pending_cycle = (ck, cw, _fetch_async(n_valid))
        self._alloc(self.cap)
        self.fill = 0

    def _resolve_cycle(self):
        """Fold the previous cycle's compacted distinct lanes into the
        ledger (a pow2-padded block append; the padding lanes are
        SENTINEL and vanish at the final combine)."""
        if self._pending_cycle is None:
            return
        ck, cw, fut = self._pending_cycle
        self._pending_cycle = None
        n = fut.result()
        if n == 0:
            return
        block = min(_next_pow2(n), int(ck.shape[0]))
        if self.ledger_fill + block > self.max_ledger:
            self._ledger_overflow()
        self._ledger_room(self.ledger_fill + block)
        with stage("ledger", lanes=block):
            self.ledger_k, self.ledger_w = _ledger_append(
                self.ledger_k, self.ledger_w, ck[:block], cw[:block],
                jnp.int32(self.ledger_fill))
        self.ledger_fill += block

    def _ledger_room(self, need):
        need = max(_next_pow2(need), MIN_BUCKET)
        if self.ledger_k is None:
            self.ledger_cap = need
            self.ledger_k = jnp.full((need,), SENTINEL, dtype=U64)
            self.ledger_w = jnp.zeros((need,), dtype=U32)
            return
        if need <= self.ledger_cap:
            return
        nk = jnp.full((need,), SENTINEL, dtype=U64)
        nw = jnp.zeros((need,), dtype=U32)
        self.ledger_k, self.ledger_w = _copy_pair_into(
            self.ledger_k, nk, nw, self.ledger_w)
        self.ledger_cap = need

    def _ledger_overflow(self):
        """The ledger outgrew its budget (more distinct hashes than
        KHMER_TPU_DEFER_CAP lanes): flush what it holds now and reset.
        The n_unique estimator becomes sequential-batch from here on
        (round-2 semantics), still deterministic for a serial run."""
        mk, mw, n = self._combined_ledger()
        if n:
            self._flush_distinct(mk, mw, n)
        self.ledger_fill = 0
        self.ledger_k = None
        self.ledger_w = None
        self.ledger_cap = 0

    def _combined_ledger(self):
        """Combine cross-cycle duplicates in the ledger bag; returns
        (keys, totals, n_distinct) compacted to the front."""
        if self.ledger_fill == 0:
            return None, None, 0
        bucket = _merge_bucket(self.ledger_fill, self.ledger_cap)
        with stage("ledger-combine", lanes=self.ledger_fill):
            if bucket >= self.ledger_cap:
                lk, lw = self.ledger_k, self.ledger_w
            else:
                lk = self.ledger_k[:bucket]
                lw = self.ledger_w[:bucket]
            mk, mw, nv = merge_buffer(lk, lw)
        self.ledger_k = None
        self.ledger_w = None
        self.ledger_cap = 0
        self.ledger_fill = 0
        return mk, mw, int(np.asarray(nv))

    # -- flush ---------------------------------------------------------------

    def _flush_distinct(self, mk, mw, n):
        """Flush n distinct (key, total) lanes into the sketch: premin
        phase (all windows, against the CURRENT pre-flush table — the
        pre-consume table on the normal single-flush path), then the
        scatter phase.  Subclasses override _flush_windows for
        different flush-time accounting (abundance_distribution)."""
        F = min(max(_next_pow2(max(n, 1)), MIN_BUCKET), FLUSH_SLICE,
                int(mk.shape[0]))
        self._flush_windows(mk, mw, n, F)

    def _flush_windows(self, mk, mw, n, F):
        st = self.storage
        virgin = getattr(st, "is_virgin", lambda: False)()
        if not virgin:
            with stage("premin", lanes=n * self.spec.n_tables):
                for off in range(0, n, F):
                    out = self._premin_fn(
                        st.table, mk[off: off + F], mw[off: off + F])
                    self._account(st, out)
        else:
            with stage("premin-virgin", lanes=n):
                for off in range(0, n, F):
                    out = self._virgin_fn(
                        mk[off: off + F], mw[off: off + F])
                    self._account(st, out)
        with stage("scatter", lanes=n * self.spec.n_tables):
            for off in range(0, n, F):
                st.table = self._scatter_fn(
                    st.table, mk[off: off + F], mw[off: off + F])
        st._loaded_occupied = None
        if hasattr(st, "mark_dirty"):
            st.mark_dirty()

    def _account(self, st, out):
        if self._track_bigcount:
            n_new, cand, n_cross = out
            # candidate fetches are deferred to finish(): two blocking
            # round trips per window otherwise
            self._bc_pending.append((cand, n_cross))
        else:
            n_new = out
        st._n_unique = st._n_unique + n_new

    def finish(self):
        """Combine everything and flush the sketch table (once, on the
        non-overflow path)."""
        self._cycle()
        if self.ledger_fill == 0 and self._pending_cycle is not None:
            # single-cycle consume (tiny files, or one full buffer):
            # the pending compacted lanes ARE the global distinct set
            ck, cw, fut = self._pending_cycle
            self._pending_cycle = None
            n = fut.result()
            if n:
                self._flush_distinct(ck, cw, n)
        else:
            self._resolve_cycle()
            mk, mw, n = self._combined_ledger()
            if n:
                self._flush_distinct(mk, mw, n)
        st = self.storage
        for cand, n_cross in self._bc_pending:
            nc = int(n_cross)
            if nc:
                hs = np.asarray(cand[:nc])
                st.bigcount_candidates.update(int(x) for x in hs)
        self._bc_pending = []
