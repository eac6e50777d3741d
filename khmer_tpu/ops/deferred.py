"""Deferred (sort-based) bulk counting: the TPU-native load path.

The reference's bulk loaders (load-into-counting / load-graph /
abundance-dist-single; hot loop src/oxli/hashtable.cc:133-158) insert
every k-mer occurrence into the sketch as it streams by.  On TPU a
random scatter/gather runs at ~90 M lanes/s while a 64-bit sort runs
at ~280 M keys/s, so inserting each *occurrence* (T tables x N
windows of random lanes) is the wrong primitive: round 1 measured
12 MB/s end-to-end against a 5.6 GB/s hash kernel.

Design ("retain mode", rounds 3-4):

  * chunks of hashed windows append raw into device KEY + SEQ-INDEX
    buffers (dynamic-update-slices — no random access, no host round
    trips).  The streaming path is unit-weight (a window either counts
    once or is invalid), so keys move as SENTINEL-masked u64 lanes and
    each lane carries its uint32 POSITION in the consume's k-mer
    stream (reads in file order, k-mers left-to-right — the exact
    insertion order of the reference's serial loop).
  * when the buffer reaches its cycle size, one (key, position) sort
    finds duplicate runs; run lengths become occurrence totals and the
    run-minimum position becomes the key's FIRST-OCCURRENCE index.
    A compaction sort packs the distinct (key, total, first) lanes to
    the front; they are RETAINED in a device-side LEDGER instead of
    being scattered into the sketch; the append buffer resets.
  * finish() combines the ledger (cross-cycle duplicates: totals add,
    first-occurrence indices min), then flushes: per sketch table the
    distinct lanes are sorted by (bin, first); the run head of each
    bin run is the bin's FIRST CLAIMANT, run sums are the bin's total
    increment, and one ascending-index scatter-add per table updates
    the sketch.

n_unique semantics — EXACT reference parity (storage.hh:176-203
BitStorage::test_and_set_bits, :575-628 ByteStorage::add): the
reference counts a k-mer occurrence as new iff SOME table's bin held
zero immediately before that occurrence's insert, processing k-mers
strictly sequentially.  Equivalently, a distinct hash h (first
occurrence index i) is new iff for some table t, the pre-consume bin
count is zero AND no hash in this consume with an earlier first
occurrence maps to bin_t(h) — the claim rule.  Both parts are
computed on device: the pre-count by a gather against the pre-flush
table, the claim by the per-table (bin, first) sort.  A hash is
suppressed only when it loses in EVERY table; suppressed hashes are
counted by one sort of the per-table loser lane ids.

This stays exact across multiple flushes (ledger overflow, or
explicit windows): keys are flushed in first-occurrence order, so a
later flush always sees earlier claimants as pre-count > 0 — exactly
what the reference's serial loop would have seen.  The single caveat
is consumes longer than 2**32 k-mer occurrences, where the uint32
position wraps (the reference's own counters are exact but such a
consume would need >4 GB of reads in ONE call; the estimator then
degrades to batch semantics for ties only).
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

U32 = jnp.uint32
U64 = jnp.uint64
I32 = jnp.int32
I64 = jnp.int64

SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)
IDX_SENTINEL = np.uint32(0xFFFFFFFF)
# run totals are clamped here at merge time: far above MAX_BIGCOUNT
# (65535) so every count read and bigcount resolution is exact, while
# keeping u32 cumulative sums free of aliasing for any real input
TOTAL_CLAMP = np.uint32(1 << 20)
# largest flush window (device scatter granularity).  Windows are
# EXACT: the pre-window sort orders distinct keys by first occurrence,
# so window j+1 sees window j's scatters as pre-count > 0 — the same
# state the reference's serial loop would be in.  A single window also
# skips the order-restoring sort entirely, so the ceiling is high on
# accelerators (peak transient: ~3 u64 sort arrays of this length).
# Resolved lazily — jax.default_backend() initializes the backend, and
# importing khmer_tpu must stay cheap for early-bailing CLI scripts.


@lru_cache(maxsize=None)
def _default_flush_log():
    # only the backend-dependent default is cached (backend lookup
    # initializes the backend); KHMER_TPU_FLUSH_LOG is re-read on
    # every call so tests/tuning can change it between flushes
    return 23 if jax.default_backend() == "cpu" else 25


def flush_slice():
    env = os.environ.get("KHMER_TPU_FLUSH_LOG")
    if env:
        try:
            log = int(env)
        except ValueError:
            raise ValueError(
                "KHMER_TPU_FLUSH_LOG must be an integer exponent "
                "(got %r)" % env) from None
        if not 14 <= log <= 30:
            raise ValueError(
                "KHMER_TPU_FLUSH_LOG=%d out of range: expected the "
                "log2 of the flush window, 14..30" % log)
        return 1 << log
    return 1 << _default_flush_log()
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


class _StageHandle:
    __slots__ = ("sync",)

    def __init__(self, sync=None):
        self.sync = sync


@contextmanager
def stage(name, lanes=0, sync=None):
    """Accumulate wall time (and lane counts) per pipeline stage when
    KHMER_TPU_TIMING is set; otherwise free.

    ATTRIBUTION (round-5 VERDICT #2 — round 4 left 68% of the consume
    wall in an unattributed `finish` bucket): in timing mode each
    stage BLOCKS on its own output — the body sets `handle.sync` to a
    device array produced inside, and exit forces a 1-element fetch of
    it (jax.effects_barrier / block_until_ready can return before the
    tunnel-fed device has executed; a fetch cannot).  This serializes
    the normally-async dispatch pipeline, so timing mode trades the
    streaming overlap for per-stage truth: stage sums ≈ device wall,
    while the un-instrumented wall stays the (faster) overlapped one.
    A stage with no sync set falls back to effects_barrier (host-only
    stages)."""
    if not _TIMING:
        yield None
        return
    h = _StageHandle(sync)
    t0 = time.perf_counter()
    yield h
    if h.sync is not None:
        _force(h.sync)
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
    """Buffer ceiling in lanes (12 bytes/lane for the key + position
    buffers): ~1.5 GB of HBM on a real accelerator, modest on the CPU
    test backend.  Override with KHMER_TPU_DEFER_CAP (lanes)."""
    env = os.environ.get("KHMER_TPU_DEFER_CAP")
    if env:
        return int(env)
    if jax.default_backend() == "cpu":
        return 1 << 23
    return 1 << 27


# -- appends -----------------------------------------------------------------


@partial(jax.jit, donate_argnums=(0, 1))
def append_keys(keys_buf, idx_buf, fill, keys, idx, weights):
    """Append one chunk's unit-weight lanes at position `fill`:
    invalid lanes (weight 0) are SENTINEL keys."""
    k = jnp.where(weights > 0, keys, SENTINEL)
    keys_buf = lax.dynamic_update_slice(keys_buf, k, (fill,))
    idx_buf = lax.dynamic_update_slice(
        idx_buf, idx.astype(U32), (fill,))
    return keys_buf, idx_buf


@partial(jax.jit, donate_argnums=(1, 2))
def _copy_pair_into(old_keys, new_keys, new_idx, old_idx):
    new_keys = lax.dynamic_update_slice(new_keys, old_keys, (0,))
    new_idx = lax.dynamic_update_slice(new_idx, old_idx, (0,))
    return new_keys, new_idx


@partial(jax.jit, donate_argnums=(0, 1, 2))
def _ledger_append(ledger_k, ledger_w, ledger_f, block_k, block_w,
                   block_f, off):
    """Append one compacted distinct block into the ledger bag."""
    ledger_k = lax.dynamic_update_slice(ledger_k, block_k, (off,))
    ledger_w = lax.dynamic_update_slice(ledger_w, block_w, (off,))
    ledger_f = lax.dynamic_update_slice(ledger_f, block_f, (off,))
    return ledger_k, ledger_w, ledger_f


@partial(jax.jit, donate_argnums=(1, 2, 3))
def _copy_triple_into(old_k, new_k, new_w, new_f, old_w, old_f):
    new_k = lax.dynamic_update_slice(new_k, old_k, (0,))
    new_w = lax.dynamic_update_slice(new_w, old_w, (0,))
    new_f = lax.dynamic_update_slice(new_f, old_f, (0,))
    return new_k, new_w, new_f


# -- combines ----------------------------------------------------------------


def _run_masks(ks):
    neq = ks[1:] != ks[:-1]
    first = jnp.concatenate([jnp.ones((1,), bool), neq])
    last = jnp.concatenate([neq, jnp.ones((1,), bool)])
    return first, last


def _pack_wf(total, fs):
    """(total <= 2^20, first u32) -> one u64 sort payload.  Sorting a
    single u64 payload runs ~25% faster than two u32 payloads on TPU
    (lane width is what the bitonic network moves)."""
    return (total.astype(U64) << U64(32)) | fs.astype(U64)


def _unpack_wf(p):
    return (p >> U64(32)).astype(U32), p.astype(U32)


def combine_unit_lanes(keys, idx):
    """Combine duplicate hashes in a unit-weight (key, position) lane
    buffer: one (key, position) sort + scans + one compaction sort.

    Returns (keys, totals, firsts, n_valid): distinct keys compacted
    to the front (SENTINEL padding after), each with its occurrence
    total (clamped at TOTAL_CLAMP) and its minimum stream position —
    the first-occurrence index the flush's claim rule needs.  Usable
    standalone (jitted below as merge_unit_buffer) or inside a
    shard_map-local function (khmer_tpu/parallel/sharded.py)."""
    n = keys.shape[0]
    ks, fs = lax.sort((keys, idx), num_keys=2)
    first, last = _run_masks(ks)
    pos = lax.iota(I32, n)
    # run end position propagated backward to the run head
    end = lax.cummin(jnp.where(last, pos, I32(n)), reverse=True)
    runlen = (end - pos + 1).astype(U32)
    valid = first & (ks != SENTINEL)
    key2 = jnp.where(valid, ks, SENTINEL)
    total = jnp.where(valid, jnp.minimum(runlen, TOTAL_CLAMP), U32(0))
    fs = jnp.where(valid, fs, IDX_SENTINEL)
    out_k, out_p = lax.sort((key2, _pack_wf(total, fs)), num_keys=1)
    out_w, out_f = _unpack_wf(out_p)
    n_valid = jnp.sum(valid.astype(I32))
    return out_k, out_w, out_f, n_valid


def combine_lanes(keys, wgts, idx):
    """combine_unit_lanes for weighted lanes (ledger merges, sharded
    owner combines): totals add (clamped), first positions min.  The
    (position, weight) pair rides one u64 payload with the position in
    the high bits, so the second sort key's run head IS the minimum
    first position."""
    n = keys.shape[0]
    pf = (idx.astype(U64) << U64(21)) | \
        jnp.minimum(wgts, TOTAL_CLAMP).astype(U64)
    ks, pp = lax.sort((keys, pf), num_keys=2)
    fs = (pp >> U64(21)).astype(U32)
    ws = (pp & U64((1 << 21) - 1)).astype(U32)
    first, last = _run_masks(ks)
    csum = jnp.cumsum(ws, dtype=U32)
    # csum at the run's LAST lane, propagated backward to the head
    # (csum is monotone, so a reverse cummin of the MAX-masked values
    # lands the NEAREST next run-end csum on every lane of the run)
    e = jnp.where(last, csum, IDX_SENTINEL)
    run_end = lax.cummin(e, reverse=True)
    total = run_end - (csum - ws)  # exact modulo 2^32
    total = jnp.minimum(total, TOTAL_CLAMP)
    valid = first & (ks != SENTINEL)
    key2 = jnp.where(valid, ks, SENTINEL)
    total = jnp.where(valid, total, U32(0))
    fs = jnp.where(valid, fs, IDX_SENTINEL)
    out_k, out_p = lax.sort((key2, _pack_wf(total, fs)), num_keys=1)
    out_w, out_f = _unpack_wf(out_p)
    n_valid = jnp.sum(valid.astype(I32))
    return out_k, out_w, out_f, n_valid


merge_buffer = jax.jit(combine_lanes, donate_argnums=(0, 1, 2))
merge_buffer.__doc__ = combine_lanes.__doc__
merge_unit_buffer = jax.jit(combine_unit_lanes, donate_argnums=(0, 1))
merge_unit_buffer.__doc__ = combine_unit_lanes.__doc__


@jax.jit
def _sort_by_first(keys, totals, firsts):
    """Order distinct lanes by first-occurrence index: the flush-window
    split preserves reference sequentiality (module docstring)."""
    f2, k2, w2 = lax.sort((firsts, keys, totals), num_keys=1)
    return k2, w2, f2


# -- flush -------------------------------------------------------------------


def flush_table_ops(spec, table, keys, totals, firsts, virgin,
                    track_bigcount):
    """Pure function: flush one window of distinct (key, total, first)
    lanes into the sketch and account n_unique by the reference's
    claim rule (module docstring; reference storage.hh:176-203,
    575-628).  Shared by the jitted serial flush (make_flush_fn) and
    the shard_map-local sharded flush (khmer_tpu/parallel/sharded.py).

    Returns (table, n_new) or (table, n_new, cand, n_cross) when
    track_bigcount."""
    n = keys.shape[0]
    valid = (keys != SENTINEL) & (totals > 0)
    lane = lax.iota(U32, n)
    firsts = jnp.where(valid, firsts, IDX_SENTINEL)
    big_idx = spec.total_bins > (1 << 31) - 2
    idt = I64 if big_idx else I32
    losers = []
    cand = None
    n_cross = None
    for t in range(spec.n_tables):
        p = int(spec.tablesizes[t])
        off = int(spec.bin_offsets[t])
        bins = (keys % U64(p)).astype(U32)
        bins = jnp.where(valid, bins, U32(p))
        # pack (bin, first) into the sort key and (total, lane) into
        # one u64 payload: a 2-array u64 sort runs ~1.5x a 4-array one
        kb = (bins.astype(U64) << U64(32)) | firsts.astype(U64)
        pv = (totals.astype(U64) << U64(32)) | lane.astype(U64)
        need_pre = (not virgin) or (track_bigcount and t == 0)
        if need_pre:
            gidx = jnp.where(valid, bins.astype(idt) + idt(off),
                             idt(spec.total_bins))
            pre = table[gidx]
            kb2, pv2, sp = lax.sort((kb, pv, pre), num_keys=1)
        else:
            kb2, pv2 = lax.sort((kb, pv), num_keys=1)
            sp = None
        sb = (kb2 >> U64(32)).astype(U32)
        sv = (pv2 >> U64(32)).astype(U32)
        sl = pv2.astype(U32)
        first_run, last_run = _run_masks(sb)
        valid_s = sb != U32(p)
        # claim: the run head (minimum first-occurrence) of each bin
        if virgin:
            win = first_run
        else:
            win = first_run & (sp == 0)
        loser = valid_s & ~win
        losers.append(jnp.where(loser, sl, IDX_SENTINEL))
        if track_bigcount and t == 0:
            # candidate superset: keys whose table-0 bin may cross 255
            # (exact resolution happens at read time on the compacted
            # candidate set — storage.ByteStorage bigcount notes)
            base0 = sv if virgin else sp + sv
            cross = valid_s & (base0 > U32(255))
            ck = keys[sl]  # gather keys into sorted order, t=0 only
            cand = lax.sort(jnp.where(cross, ck, SENTINEL))
            n_cross = jnp.sum(cross.astype(U32))
        # bin totals: run sum of sv, emitted at the run head; the
        # ascending-bin emission keeps the scatter's indices sorted
        csum = jnp.cumsum(sv, dtype=U32)
        e = jnp.where(last_run, csum, IDX_SENTINEL)
        run_end = lax.cummin(e, reverse=True)
        bt = jnp.minimum(run_end - (csum - sv), TOTAL_CLAMP)
        emit = first_run & valid_s
        filled = lax.cummin(jnp.where(emit, sb, U32(p)), reverse=True)
        gidx = jnp.minimum(filled.astype(idt) + idt(off),
                           idt(spec.total_bins))
        vals = jnp.where(emit, bt, U32(0))
        table = table.at[gidx].add(vals, indices_are_sorted=True)
    # a key is suppressed iff it lost in EVERY table: count lane ids
    # appearing n_tables times in the concatenated loser lists
    alll = lax.sort(jnp.concatenate(losers))
    firstl, lastl = _run_masks(alll)
    posl = lax.iota(I32, alll.shape[0])
    endl = lax.cummin(jnp.where(lastl, posl, I32(alll.shape[0])),
                      reverse=True)
    runl = endl - posl + 1
    n_lost = jnp.sum((firstl & (alll != IDX_SENTINEL) &
                      (runl == spec.n_tables)).astype(U64))
    n_new = jnp.sum(valid.astype(U64)) - n_lost
    if track_bigcount:
        return table, n_new, cand, n_cross
    return table, n_new


def flush_table_ops_dense(spec, table, keys, totals, firsts, virgin,
                          track_bigcount):
    """flush_table_ops with DENSE claim arrays instead of per-table
    sorts: per table, a scatter-min of first positions into a
    [tablesize+1] scratch gives each bin's first claimant; the gather
    back aligns wins per lane, so the cross-table OR needs no loser
    sort.  Bit-identical results; this is the fast strategy on
    XLA:CPU, where a u64 sort runs ~2 M lanes/s against ~170 M/s
    scatter/gather (on TPU the sort strategy wins — make_flush_fn
    picks per backend)."""
    valid = (keys != SENTINEL) & (totals > 0)
    firsts = jnp.where(valid, firsts, IDX_SENTINEL)
    big_idx = spec.total_bins > (1 << 31) - 2
    idt = I64 if big_idx else I32
    new = jnp.zeros(keys.shape, bool)
    cand = None
    n_cross = None
    for t in range(spec.n_tables):
        p = int(spec.tablesizes[t])
        off = int(spec.bin_offsets[t])
        bins = jnp.where(valid, (keys % U64(p)).astype(idt), idt(p))
        gidx = jnp.where(valid, bins + idt(off), idt(spec.total_bins))
        need_pre = (not virgin) or (track_bigcount and t == 0)
        pre = table[gidx] if need_pre else None
        claim = jnp.full(p + 1, IDX_SENTINEL, U32).at[bins].min(firsts)
        own = (claim[bins] == firsts) & valid
        win = own if virgin else own & (pre == 0)
        new = new | win
        if track_bigcount and t == 0:
            base0 = totals if virgin else pre + totals
            cross = valid & (base0 > U32(255))
            cand = lax.sort(jnp.where(cross, keys, SENTINEL))
            n_cross = jnp.sum(cross.astype(U32))
        table = table.at[gidx].add(jnp.where(valid, totals, U32(0)))
    n_new = jnp.sum(new.astype(U64))
    if track_bigcount:
        return table, n_new, cand, n_cross
    return table, n_new


def choose_flush_ops(spec, n_lanes):
    """Strategy chooser: sort-based on accelerators and for small
    windows into huge tables; dense claim arrays on CPU otherwise.
    Both are bit-identical (flush_table_ops_dense docstring); the
    dense path's claim scratch is table-sized, so tiny batches into
    huge sketches must not take it."""
    dense_ok = spec.total_bins <= max(1 << 25, 64 * int(n_lanes))
    if jax.default_backend() == "cpu" and dense_ok:
        return flush_table_ops_dense
    return flush_table_ops


@lru_cache(maxsize=None)
def make_flush_fn(spec, virgin, track_bigcount):
    """Jitted one-window sketch flush (choose_flush_ops strategy)."""

    @partial(jax.jit, donate_argnums=(0,))
    def fn(table, keys, totals, firsts):
        ops = choose_flush_ops(spec, keys.shape[0])
        return ops(spec, table, keys, totals, firsts,
                   virgin, track_bigcount)
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
    by sort and the distinct survivors are RETAINED in a device
    ledger; finish() combines the ledger and scatters the sketch table
    once per globally-distinct hash, computing the reference-exact
    n_unique claim rule along the way.

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
        # than the append buffer before the overflow fallback triggers
        # a mid-consume flush (still exact; module docstring)
        self.max_ledger = 4 * self.max_cap
        self.chunk_lanes = chunk_lanes
        self.storage = storage
        self.spec = storage._read_spec()
        self.unit = bool(unit)
        self._fixed_cap = None if cap is None \
            else min(_next_pow2(int(cap)), self.max_cap)
        self.cap = 0
        self.keys = None
        self.idx = None
        self.fill = 0
        # base stream position of the next appended chunk (host int;
        # the device-side lane positions are base + in-chunk offset)
        self.pos_base = 0
        self._track_bigcount = (self.spec.use_bigcount
                                and self.spec.kind == "byte")
        # ledger: bag of per-cycle compacted distinct (k, w, f) runs
        self.ledger_k = None
        self.ledger_w = None
        self.ledger_f = None
        self.ledger_cap = 0
        self.ledger_fill = 0
        self._pending_cycle = None  # (ck, cw, cf, distinct-count future)
        self._bc_pending = []       # deferred bigcount candidate fetches

    # -- streaming ----------------------------------------------------------

    def append(self, keys, weights, idx=None):
        """Append one chunk of hashed lanes.  `idx` carries each
        lane's position in the consume's k-mer stream; when None, the
        caller's lane order is taken as stream order."""
        lanes = int(keys.shape[0])
        if idx is None:
            idx = jnp.arange(self.pos_base, self.pos_base + lanes,
                             dtype=U32)
        self._make_room(lanes)
        self.keys, self.idx = append_keys(
            self.keys, self.idx, jnp.int32(self.fill), keys, idx,
            weights)
        self.fill += lanes
        self.pos_base += lanes

    def append_chunk(self, fn, consumed, inputs, extra=(), lanes=None,
                     stream_len=None):
        """Append via a fused hash+filter+append kernel `fn` with
        signature (kbuf, ibuf, fill, pos_base, consumed, *inputs,
        *extra) -> (kbuf, ibuf, consumed); one device dispatch per
        chunk.  `stream_len` is the chunk's length in the k-mer
        stream (defaults to the lane count)."""
        lanes = self.chunk_lanes if lanes is None else int(lanes)
        self._make_room(lanes)
        with stage("append", lanes=lanes) as s:
            self.keys, self.idx, consumed = fn(
                self.keys, self.idx, jnp.int32(self.fill),
                jnp.uint32(self.pos_base), consumed, *inputs, *extra)
            if s is not None:
                s.sync = consumed
        self.fill += lanes
        self.pos_base += lanes if stream_len is None else int(stream_len)
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
        self.idx = jnp.full((self.cap,), IDX_SENTINEL, dtype=U32)

    def _grow(self, need=0):
        new_cap = min(max(self.cap * 2, _next_pow2(need)), self.max_cap)
        if new_cap <= self.cap:
            return
        nk = jnp.full((new_cap,), SENTINEL, dtype=U64)
        ni = jnp.full((new_cap,), IDX_SENTINEL, dtype=U32)
        self.keys, self.idx = _copy_pair_into(
            self.keys, nk, ni, self.idx)
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
        with stage("combine", lanes=self.fill) as s:
            if bucket >= self.cap:
                seg_k, seg_i = self.keys, self.idx
            else:
                seg_k = self.keys[:bucket]
                seg_i = self.idx[:bucket]
            ck, cw, cf, n_valid = merge_unit_buffer(seg_k, seg_i)
            if s is not None:
                s.sync = n_valid
        self.keys = None  # donated away; reallocated below
        self.idx = None
        self._pending_cycle = (ck, cw, cf, _fetch_async(n_valid))
        self._alloc(self.cap)
        self.fill = 0

    def _resolve_cycle(self):
        """Fold the previous cycle's compacted distinct lanes into the
        ledger (a pow2-padded block append; the padding lanes are
        SENTINEL and vanish at the final combine)."""
        if self._pending_cycle is None:
            return
        ck, cw, cf, fut = self._pending_cycle
        self._pending_cycle = None
        with stage("cycle-wait"):
            n = fut.result()
        if n == 0:
            return
        block = min(_next_pow2(n), int(ck.shape[0]))
        if self.ledger_fill + block > self.max_ledger:
            self._ledger_overflow()
        self._ledger_room(self.ledger_fill + block)
        with stage("ledger", lanes=block) as s:
            self.ledger_k, self.ledger_w, self.ledger_f = _ledger_append(
                self.ledger_k, self.ledger_w, self.ledger_f,
                ck[:block], cw[:block], cf[:block],
                jnp.int32(self.ledger_fill))
            if s is not None:
                s.sync = self.ledger_k
        self.ledger_fill += block

    def _ledger_room(self, need):
        need = max(_next_pow2(need), MIN_BUCKET)
        if self.ledger_k is None:
            self.ledger_cap = need
            self.ledger_k = jnp.full((need,), SENTINEL, dtype=U64)
            self.ledger_w = jnp.zeros((need,), dtype=U32)
            self.ledger_f = jnp.full((need,), IDX_SENTINEL, dtype=U32)
            return
        if need <= self.ledger_cap:
            return
        nk = jnp.full((need,), SENTINEL, dtype=U64)
        nw = jnp.zeros((need,), dtype=U32)
        nf = jnp.full((need,), IDX_SENTINEL, dtype=U32)
        self.ledger_k, self.ledger_w, self.ledger_f = _copy_triple_into(
            self.ledger_k, nk, nw, nf, self.ledger_w, self.ledger_f)
        self.ledger_cap = need

    def _ledger_overflow(self):
        """The ledger outgrew its budget (more distinct hashes than
        KHMER_TPU_DEFER_CAP lanes): flush what it holds now and reset.
        Still exact — keys in this flush all first-occurred before any
        key of a later flush, so later flushes see them as pre-count
        > 0 (module docstring)."""
        mk, mw, mf, n = self._combined_ledger()
        if n:
            self._flush_distinct(mk, mw, mf, n)
        self.ledger_fill = 0
        self.ledger_k = None
        self.ledger_w = None
        self.ledger_f = None
        self.ledger_cap = 0

    def _combined_ledger(self):
        """Combine cross-cycle duplicates in the ledger bag; returns
        (keys, totals, firsts, n_distinct) compacted to the front."""
        if self.ledger_fill == 0:
            return None, None, None, 0
        bucket = _merge_bucket(self.ledger_fill, self.ledger_cap)
        with stage("ledger-combine", lanes=self.ledger_fill) as s:
            if bucket >= self.ledger_cap:
                lk, lw, lf = self.ledger_k, self.ledger_w, self.ledger_f
            else:
                lk = self.ledger_k[:bucket]
                lw = self.ledger_w[:bucket]
                lf = self.ledger_f[:bucket]
            mk, mw, mf, nv = merge_buffer(lk, lw, lf)
            if s is not None:
                s.sync = nv
        self.ledger_k = None
        self.ledger_w = None
        self.ledger_f = None
        self.ledger_cap = 0
        self.ledger_fill = 0
        return mk, mw, mf, int(np.asarray(nv))

    # -- flush ---------------------------------------------------------------

    def _flush_distinct(self, mk, mw, mf, n):
        """Flush n distinct (key, total, first) lanes into the sketch.
        Oversized flushes split into first-occurrence-ordered windows
        (exact; module docstring).  Subclasses override _flush_windows
        for different flush-time accounting (abundance_distribution)."""
        F = min(max(_next_pow2(max(n, 1)), MIN_BUCKET), flush_slice(),
                int(mk.shape[0]))
        if n > F:
            # order-restoring sort over the OCCUPIED prefix only — the
            # combine compacted the n distinct lanes to the front, so
            # the pow2 cover of n is enough (the tail is SENTINEL)
            P = min(max(_next_pow2(n), MIN_BUCKET), int(mk.shape[0]))
            with stage("order", lanes=P) as s:
                mk, mw, mf = _sort_by_first(mk[:P], mw[:P], mf[:P])
                if s is not None:
                    s.sync = mk
        self._flush_windows(mk, mw, mf, n, F)

    def _flush_windows(self, mk, mw, mf, n, F):
        st = self.storage
        for off in range(0, n, F):
            virgin = getattr(st, "is_virgin", lambda: False)() \
                and off == 0
            fn = make_flush_fn(self.spec, virgin, self._track_bigcount)
            with stage("flush",
                       lanes=min(F, n - off) * self.spec.n_tables) as s:
                out = fn(st.table, mk[off: off + F], mw[off: off + F],
                         mf[off: off + F])
                if s is not None:
                    s.sync = out[1]
            st.table = out[0]
            self._account(st, out[1:])
            if hasattr(st, "_virgin"):
                st._virgin = False
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
            (n_new,) = out
        st._n_unique = st._n_unique + n_new

    def finish(self):
        """Combine everything and flush the sketch table (once, on the
        non-overflow path)."""
        self._cycle()
        if self.ledger_fill == 0 and self._pending_cycle is not None:
            # single-cycle consume (tiny files, or one full buffer):
            # the pending compacted lanes ARE the global distinct set
            ck, cw, cf, fut = self._pending_cycle
            self._pending_cycle = None
            with stage("cycle-wait"):
                n = fut.result()
            if n:
                self._flush_distinct(ck, cw, cf, n)
        else:
            self._resolve_cycle()
            mk, mw, mf, n = self._combined_ledger()
            if n:
                self._flush_distinct(mk, mw, mf, n)
        st = self.storage
        with stage("bigcount-fetch"):
            for cand, n_cross in self._bc_pending:
                nc = int(n_cross)
                if nc:
                    hs = np.asarray(cand[:nc])
                    st.bigcount_candidates.update(int(x) for x in hs)
        self._bc_pending = []
