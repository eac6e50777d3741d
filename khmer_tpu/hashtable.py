"""k-mer-aware table layer: the TPU equivalents of khmer's Hashtable
hierarchy (reference include/oxli/hashtable.hh:132-578 and the Cython
façade khmer/_oxli/graphs.pyx).

Classes:
  Hashtable       — abstract: storage + hash function + consume/query API
  Counttable      — ByteStorage + murmur (graphs.pyx:454)
  SmallCounttable — NibbleStorage + murmur
  Nodetable       — BitStorage + murmur
  Countgraph / SmallCountgraph / Nodegraph — 2-bit exact hash + de Bruijn
      graph semantics (defined in khmer_tpu.graph, subclassing this layer)

Device dataflow: sequences are encoded host-side into flat byte buffers
(reads concatenated; windows that straddle read boundaries are masked),
then a single fused jitted kernel hashes every window and scatters the
batch into the sketch — replacing the reference's per-k-mer hot loop
(src/oxli/hashtable.cc:133-158) with one device pass per ~1M-base chunk.
"""

import math
import os
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from khmer_tpu._config import MAX_BIGCOUNT, MAX_KCOUNT
from khmer_tpu.io.fastx import FastxReader, Read
from khmer_tpu.ops import encode as enc
from khmer_tpu.ops.hashing import (
    forward_hash,
    hash_murmur3_scalar,
    kmer_hashes_2bit,
    kmer_hashes_2bit_pm,
    kmer_hashes_murmur_bytes,
    reverse_hash,
)
from khmer_tpu.ops.rollinghash import kmer_hashes_cyclic_bytes
from khmer_tpu.ops.sketch_ops import sketch_get, sketch_update
from khmer_tpu.primes import get_n_primes_near_x
from khmer_tpu.storage import (BitStorage, ByteStorage, NibbleStorage,
                               QFStorage)

U8 = jnp.uint8
U32 = jnp.uint32
U64 = jnp.uint64

# flat chunk length (bases per device call) for bulk consume, and the
# row payload it is folded into on device ([R, P + k - 1] rows hash far
# better on the VPU than one [1, CHUNK] strip)
CHUNK = 1 << 20
ROW_PAYLOAD = 1 << 14
# width buckets for single-sequence query calls (recompilation control)
_WIDTH_BUCKETS = (64, 128, 256, 512, 1024, 4096, 16384, 65536, CHUNK)


def _bucket_width(n):
    for b in _WIDTH_BUCKETS:
        if n <= b:
            return b
    return -(-n // CHUNK) * CHUNK


def _bytes_hash(hash_kind):
    """Batched byte-stream hash function for a non-2bit hash kind."""
    if hash_kind == "cyclic":
        return kmer_hashes_cyclic_bytes
    return kmer_hashes_murmur_bytes


def _hash_windows(data, k, hash_kind, assume_acgt=False):
    """Hashes of every window of a flat [S] byte/code buffer -> [S-k+1].

    assume_acgt applies to the murmur path only (cleaned bulk consume)."""
    if hash_kind == "2bit":
        h, _ = kmer_hashes_2bit(
            data[None, :], jnp.array([data.shape[0]], jnp.int32), k)
    else:
        h, _ = _bytes_hash(hash_kind)(
            data[None, :], jnp.array([data.shape[0]], jnp.int32), k,
            assume_acgt=assume_acgt)
    return h[0]


def _rows_from_flat(data, k, payload):
    """Fold a flat [C] stream into [R, payload + k - 1] rows, each row
    carrying the next row's first k-1 bases so every window of the
    stream is evaluable in exactly one row."""
    R = data.shape[0] // payload
    main = data.reshape(R, payload)
    tail = jnp.concatenate(
        [main[1:, : k - 1],
         jnp.zeros((1, k - 1), data.dtype)], axis=0)
    return jnp.concatenate([main, tail], axis=1)


def _chunk_hashes_weights(data, weights, k, hash_kind, payload):
    """Fused hashing of a flat chunk: returns (hashes, w, pos) flat
    device arrays covering every window of the chunk exactly once (in
    phase-major order for the 2-bit path).  `pos` is each lane's
    window start position in the flat stream — the insertion order of
    the reference's serial loop, needed for the exact n_unique claim
    rule (ops/deferred.py docstring)."""
    C = data.shape[0]
    R = C // payload
    rows = _rows_from_flat(data, k, payload)
    # a window is real iff it starts in the row's payload region and
    # does not run off the end of the chunk
    w2d = weights.reshape(R, payload)
    limit = jnp.zeros((R, payload), weights.dtype).at[:].set(1)
    limit = limit.at[R - 1, payload - k + 1:].set(0)
    w2d = w2d * limit
    if hash_kind == "2bit":
        canon, _ = kmer_hashes_2bit_pm(
            rows, jnp.full((R,), rows.shape[1], jnp.int32), k)
        P, _, nw = canon.shape
        wpad = jnp.zeros((R, P * nw), weights.dtype)
        wpad = wpad.at[:, :payload].set(w2d)
        w_pm = jnp.transpose(wpad.reshape(R, nw, P), (2, 0, 1))
        # lane (ph, r, j) is the window at stream position
        # r*payload + 16*j + ph (ops/hashing.kmer_hashes_2bit_pm_u32)
        ph_i = jax.lax.broadcasted_iota(jnp.uint32, (P, R, nw), 0)
        r_i = jax.lax.broadcasted_iota(jnp.uint32, (P, R, nw), 1)
        j_i = jax.lax.broadcasted_iota(jnp.uint32, (P, R, nw), 2)
        pos = r_i * jnp.uint32(payload) + j_i * jnp.uint32(P) + ph_i
        return canon.reshape(-1), w_pm.reshape(-1), pos.reshape(-1)
    h, _ = _bytes_hash(hash_kind)(
        rows, jnp.full((R,), rows.shape[1], jnp.int32), k,
        assume_acgt=True)
    # byte rows yield exactly `payload` windows per row, in order
    r_i = jax.lax.broadcasted_iota(jnp.uint32, (R, payload), 0)
    c_i = jax.lax.broadcasted_iota(jnp.uint32, (R, payload), 1)
    pos = r_i * jnp.uint32(payload) + c_i
    return (h[:, :payload].reshape(-1), w2d.reshape(-1),
            pos.reshape(-1))


@lru_cache(maxsize=None)
def _make_consume_fn(spec, k, hash_kind, masked, banded, from_codes=False,
                     consume_masked=False):
    """Fused hash+scatter update kernel over a flat chunk.

    from_codes: the chunk carries 2-bit codes (native loader output)
    rather than ASCII bytes; only relevant for the byte-hash paths.
    consume_masked: invert the mask test (count k-mers whose mask
    count is >= threshold instead of <=; hashtable.cc:186)."""

    def fn(table, occ, uniq, data, weights, *extra):
        if from_codes and hash_kind != "2bit":
            data = _decode_codes(data)
        hashes, w, pos = _chunk_hashes_weights(
            data, weights.astype(U32), k, hash_kind, ROW_PAYLOAD)
        i = 0
        if banded:
            bmin, bmax = extra[i], extra[i + 1]
            i += 2
            w = w * ((hashes >= bmin) & (hashes < bmax)).astype(U32)
        if masked is not None:
            mask_table, threshold = extra[i], extra[i + 1]
            mc = sketch_get(masked, mask_table, hashes)
            if consume_masked:
                keep = mc.astype(U32) >= threshold
            else:
                keep = mc.astype(U32) <= threshold
            w = w * keep.astype(U32)
        table, occ, uniq, aux = sketch_update(
            spec, table, occ, uniq, hashes, w, pos)
        # reference counts only the k-mers that passed the filters
        # (this_n_consumed, hashtable.cc:181-191)
        aux = dict(aux)
        aux["consumed"] = jnp.sum(w.astype(U64))
        return table, occ, uniq, aux

    return jax.jit(fn, donate_argnums=(0,))


def _decode_codes(data):
    """2-bit codes -> ASCII bytes (native loader output feeding a
    byte-stream hash)."""
    return jnp.where(
        data == 0, np.uint8(65),
        jnp.where(data == 1, np.uint8(84),
                  jnp.where(data == 2, np.uint8(67), np.uint8(71))))


def _consume_chunk_size():
    """Per-dispatch chunk (bases) for bulk consumes: bigger on real
    accelerators to amortize transfer/dispatch latency; CHUNK on the
    CPU test backend.  Override with KHMER_TPU_CHUNK."""
    import os

    env = os.environ.get("KHMER_TPU_CHUNK")
    if env:
        # the device kernels tile chunks into [rows, ROW_PAYLOAD(+k-1)]
        # windows, so a chunk below one row payload is not expressible
        return max(int(env), ROW_PAYLOAD)
    if jax.default_backend() == "cpu":
        return CHUNK
    return 1 << 23


@lru_cache(maxsize=None)
def _fit_chunk(k, hash_kind, base):
    """Largest chunk <= base whose lanes tile the deferred counter's
    power-of-two cycle in exactly 4 appends: the cycle sort then
    covers the fill with ~zero overshoot (a chunk that overflows the
    cycle by even one lane doubles the sort bucket)."""
    import os

    from khmer_tpu.ops.deferred import DeferredCounter, default_max_cap

    if os.environ.get("KHMER_TPU_CHUNK"):
        return base  # explicit override wins
    cap = min(2 * DeferredCounter.MERGE_EVERY, default_max_cap())
    cap = 1 << max(cap - 1, 1).bit_length()
    chunk = base
    while chunk > ROW_PAYLOAD and \
            _chunk_lane_count(k, hash_kind, chunk) * 4 > cap:
        chunk -= ROW_PAYLOAD
    return chunk


def _producer_stream(produce, depth=6):
    """Run `produce` (a generator) on a background thread with a
    bounded queue: parsing + packing + h2d enqueue overlap the device
    stream.  Re-raises producer exceptions in the consumer."""
    import queue as _q
    import threading

    q = _q.Queue(maxsize=depth)
    DONE, ERR = object(), object()

    def run():
        try:
            for item in produce():
                q.put(item)
            q.put(DONE)
        except BaseException as e:  # noqa: BLE001 — re-raised below
            q.put((ERR, e))

    t = threading.Thread(target=run, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is DONE:
            break
        if isinstance(item, tuple) and len(item) == 2 and item[0] is ERR:
            raise item[1]
        yield item
    t.join()


@lru_cache(maxsize=None)
def _chunk_lane_count(k, hash_kind, chunk=CHUNK, payload=ROW_PAYLOAD):
    """Static lane count emitted by _chunk_hashes_weights for a chunk."""
    out = jax.eval_shape(
        lambda d, w: _chunk_hashes_weights(d, w, k, hash_kind, payload),
        jax.ShapeDtypeStruct((chunk,), jnp.uint8),
        jax.ShapeDtypeStruct((chunk,), jnp.uint32))
    return int(out[0].shape[0])


# ASCII -> 2-bit code, inverse of _decode_codes (A=0 T=1 C=2 G=3);
# non-ACGT bytes (the chunk separator) map to 0 and are weight-masked
_ASCII_TO_CODE = np.zeros(256, np.uint8)
for _b, _c in ((65, 0), (84, 1), (67, 2), (71, 3)):
    _ASCII_TO_CODE[_b] = _c


def _pack_chunk(codes, weights, from_ascii=False):
    """Host-side transfer packing into ONE buffer: 2-bit codes
    4-per-byte then the validity mask 8-per-byte (5.3x less
    host->device traffic, ONE device_put — both the byte volume and
    the per-put fixed cost dominate on tunneled/PCIe-fed devices).
    ASCII byte streams (murmur tables) are translated to 2-bit codes
    first; the device side restores them via _decode_codes."""
    if from_ascii:
        codes = _ASCII_TO_CODE[codes]
    n = codes.shape[0]
    buf = np.empty(n // 4 + n // 8, np.uint8)
    c = codes.reshape(-1, 4)
    np.bitwise_or(c[:, 0], c[:, 1] << 2, out=buf[: n // 4])
    np.bitwise_or(buf[: n // 4], c[:, 2] << 4, out=buf[: n // 4])
    np.bitwise_or(buf[: n // 4], c[:, 3] << 6, out=buf[: n // 4])
    buf[n // 4:] = np.packbits(weights.astype(bool), bitorder="little")
    return buf


def _unpack_chunk(buf):
    """Device-side inverse of _pack_chunk: u8[3N/8] -> (codes u8[N],
    mask u8[N])."""
    n = (buf.shape[0] * 8) // 3
    shifts2 = jnp.arange(4, dtype=jnp.uint8) * 2
    codes = ((buf[: n // 4, None] >> shifts2[None, :]) & 3).reshape(-1)
    shifts1 = jnp.arange(8, dtype=jnp.uint8)
    mask = ((buf[n // 4:, None] >> shifts1[None, :]) & 1).reshape(-1)
    return codes, mask


@lru_cache(maxsize=None)
def _make_append_fn(k, hash_kind, masked, banded, from_codes=False,
                    consume_masked=False, packed=False):
    """Fused hash + filter + buffer-append kernel for the deferred
    (sort-based) bulk consume path — see khmer_tpu/ops/deferred.py.
    One dispatch per chunk; no random table access at all.  With
    packed=True, `data` is the single bit-packed codes+mask buffer
    (_pack_chunk), unpacked on device, and `weights` is absent.
    UNIT-weight: a window either counts once or is invalid, so the
    key buffer moves as SENTINEL-masked u64 lanes plus a u32 stream
    position per lane (pos_base + window start — the serial insertion
    order the exact n_unique claim rule needs)."""
    from khmer_tpu.ops.deferred import SENTINEL

    def fn(kbuf, ibuf, fill, pos_base, consumed, data, *rest):
        if packed:
            data, weights = _unpack_chunk(data)
            extra = rest
        else:
            weights, extra = rest[0], rest[1:]
        if from_codes and hash_kind != "2bit":
            data = _decode_codes(data)
        hashes, w, pos = _chunk_hashes_weights(
            data, weights.astype(U32), k, hash_kind, ROW_PAYLOAD)
        i = 0
        if banded:
            bmin, bmax = extra[i], extra[i + 1]
            i += 2
            w = w * ((hashes >= bmin) & (hashes < bmax)).astype(U32)
        if masked is not None:
            mask_table, threshold = extra[i], extra[i + 1]
            mc = sketch_get(masked, mask_table, hashes)
            if consume_masked:
                keep = mc.astype(U32) >= threshold
            else:
                keep = mc.astype(U32) <= threshold
            w = w * keep.astype(U32)
        consumed = consumed + jnp.sum(w.astype(U64))
        key = jnp.where(w > 0, hashes, SENTINEL)
        kbuf = jax.lax.dynamic_update_slice(kbuf, key, (fill,))
        ibuf = jax.lax.dynamic_update_slice(
            ibuf, pos_base + pos, (fill,))
        return kbuf, ibuf, consumed

    return jax.jit(fn, donate_argnums=(0, 1))


@lru_cache(maxsize=None)
def _make_hashes_fn(k, hash_kind):
    def fn(data):
        return _hash_windows(data, k, hash_kind)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _make_abund_flush_fn(main_spec, tracking_spec):
    """Abundance-dist flush over DISTINCT lanes (deferred-cycle
    variant of _make_abund_dist_fn): gathers against the main and
    tracking sketches touch one lane per distinct hash of the cycle
    instead of one per occurrence — the same ~C-fold cut the deferred
    consume gets.  Cross-cycle dedup rides the tracking filter's
    membership, exactly the reference's Bloom-tracked semantics
    (hashtable.cc:460-501)."""
    from functools import partial as _partial

    from khmer_tpu._config import MAX_BIGCOUNT
    from khmer_tpu.ops.deferred import SENTINEL

    @_partial(jax.jit, donate_argnums=(0, 4))
    def fn(t_table, t_uniq, keys, main_table, dist):
        valid = keys != SENTINEL
        member = sketch_get(tracking_spec, t_table, keys)
        new = valid & (member == 0)
        counts = sketch_get(main_spec, main_table, keys).astype(U32)
        lane_counts = jnp.where(new, counts, 0)
        dist = dist.at[lane_counts].add(new.astype(U64))
        t_table, _, t_uniq, _ = sketch_update(
            tracking_spec, t_table, jnp.zeros((), U64), t_uniq, keys,
            new.astype(U32))
        return t_table, t_uniq, dist

    return fn


def _make_abund_counter(tracking_storage, chunk_lanes, main_spec,
                        main_table):
    """DeferredCounter whose cycle flush does abundance-dist
    accounting (per-distinct gathers + histogram) instead of
    counting; `dist` accumulates on device."""
    from khmer_tpu._config import MAX_BIGCOUNT
    from khmer_tpu.ops.deferred import DeferredCounter

    class _AbundCounter(DeferredCounter):
        def __init__(self):
            super().__init__(tracking_storage, chunk_lanes)
            self.dist = jnp.zeros(MAX_BIGCOUNT + 1, jnp.uint64)
            self._abund_fn = _make_abund_flush_fn(
                main_spec, tracking_storage._read_spec())

        def _flush_windows(self, mk, mw, mf, n, F):
            st = self.storage
            for off in range(0, n, F):
                st.table, st._n_unique, self.dist = self._abund_fn(
                    st.table, st._n_unique, mk[off: off + F],
                    main_table, self.dist)
            st._loaded_occupied = None
            st.mark_dirty()

    return _AbundCounter()


@lru_cache(maxsize=None)
def _make_abund_dist_fn(spec, tracking_spec, k, hash_kind, want_lanes,
                        packed=False, from_codes=False):
    """One chunk of abundance_distribution (hashtable.cc:460-501):
    k-mers not yet in the tracking filter contribute their count once.

    Returns a dense histogram over [0, read_cap]; with want_lanes the
    per-distinct (count, hash) lanes also come back for host-side
    bigcount-overlay correction (only needed for graphs loaded from
    files carrying a bigcount map).  Cached: a fresh jit per call
    would recompile per invocation."""
    from khmer_tpu._config import MAX_BIGCOUNT

    def fn(table, t_table, t_uniq, data, *rest):
        if packed:
            data, weights = _unpack_chunk(data)
        else:
            weights = rest[0]
        if from_codes and hash_kind != "2bit":
            data = _decode_codes(data)
        hashes, w, _pos = _chunk_hashes_weights(
            data, weights.astype(U32), k, hash_kind, ROW_PAYLOAD)
        # pre-update tracking membership
        member = sketch_get(tracking_spec, t_table, hashes)
        w = w * (member == 0).astype(U32)
        # one histogram lane per distinct new hash: sort, mark firsts
        key = jnp.where(w > 0, hashes, ~jnp.uint64(0))
        ks, ws = jax.lax.sort((key, w), num_keys=1)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), ks[1:] != ks[:-1]]) & (ws > 0)
        counts = sketch_get(spec, table, ks)
        lane_counts = jnp.where(first, counts.astype(U32), 0)
        # non-first lanes add zero weight at index 0 — harmless
        dist = jnp.zeros(MAX_BIGCOUNT + 1, U64).at[lane_counts].add(
            first.astype(U64))
        # membership add: every new lane (duplicates harmless for bloom)
        t_table, _, t_uniq, _ = sketch_update(
            tracking_spec, t_table, jnp.zeros((), U64), t_uniq, hashes, w)
        if want_lanes:
            return t_table, t_uniq, dist, counts, first, ks
        return t_table, t_uniq, dist

    return jax.jit(fn, donate_argnums=(1,))


@lru_cache(maxsize=None)
def _make_row_hashes_fn(k, hash_kind):
    def fn(data, lengths):
        if hash_kind == "2bit":
            h, _ = kmer_hashes_2bit(data, lengths, k)
        else:
            h, _ = _bytes_hash(hash_kind)(data, lengths, k)
        return h

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _make_row_hashes_counts_fn(spec, k, hash_kind):
    def fn(table, data, lengths):
        if hash_kind == "2bit":
            h, _ = kmer_hashes_2bit(data, lengths, k)
        else:
            h, _ = _bytes_hash(hash_kind)(data, lengths, k)
        return h, sketch_get(spec, table, h)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _make_row_counts_fn(spec, k, hash_kind):
    """Counts-only row query: like _make_row_hashes_counts_fn but the
    hashes stay on device — readers that only need counts (trim pass2)
    fetch 2 bytes per k-mer instead of 10."""
    def fn(table, data, lengths):
        if hash_kind == "2bit":
            h, _ = kmer_hashes_2bit(data, lengths, k)
        else:
            h, _ = _bytes_hash(hash_kind)(data, lengths, k)
        return sketch_get(spec, table, h)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _make_trim_pass1_fn(spec, k, hash_kind, do_normalize, L=None):
    """Whole-batch trim-low-abund PASS 1 in one dispatch (reference
    trim-low-abund.py:170-283 semantics, round-4 device port like
    _make_diginorm_fn): per bundle, the minimum over reads of the true
    median of (pre-batch count + additive tally of earlier SAVED
    bundles' k-mers) picks the branch —
      0 = skip (diginorm mode, min coverage >= dn_cov),
      1 = trim now (min coverage >= trim_at; host trims with the
          adjusted counts this fn returns),
      2 = save for pass 2 (consumed on device with the exact n_unique
          claim rule).
    Only the [B] branch flags and the u16 adjusted counts cross back.

    fn(table, uniq, data[B2,L], lengths[B2], real[B2], trim_at,
       dn_cov, cutoff) -> (table, uniq, branch[B], first_bad[B2] i32)

    first_bad is each row's FIRST window whose scan-time adjusted
    count is < cutoff (nw when none) — the only per-window quantity
    trim_record needs (trimming.trim_record_from_first_bad), so the
    per-batch fetch is [B2] i32 instead of the [B2, nw] u16 count
    matrix (8.6 MB -> 128 KB per 16K-pair batch; the count fetch was
    ~40% of trim-low-abund's wall over a 10 MB/s link, round 5)."""
    from khmer_tpu.ops.deferred import (IDX_SENTINEL, SENTINEL,
                                        TOTAL_CLAMP, choose_flush_ops)

    I32_ = jnp.int32
    CMAX = jnp.uint32(0xFFFFFFFF)

    def fn(table, uniq, data, lengths, real, trim_at, dn_cov,
           cutoff):
        if L is not None:
            data = _unpack_rows_2bit(data, L)
        if hash_kind == "2bit":
            h, valid = kmer_hashes_2bit(data, lengths, k)
        else:
            h, valid = _bytes_hash(hash_kind)(data, lengths, k)
        B2, nw = h.shape
        B = B2 // 2
        N = B2 * nw
        flat = jnp.where(valid.reshape(-1), h.reshape(-1), SENTINEL)
        lanepos = jax.lax.iota(U32, N)
        sk, sl = jax.lax.sort((flat, lanepos), num_keys=1)
        firstm = jnp.concatenate(
            [jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        rank = jnp.cumsum(firstm.astype(I32_)) - 1
        inv = jnp.zeros(N, I32_).at[sl].set(rank, unique_indices=True)
        uk = jnp.full(N, SENTINEL, U64).at[
            jnp.where(firstm, rank, I32_(N))].set(
            jnp.where(firstm, sk, SENTINEL), mode="drop")
        n_distinct = rank[-1] + 1
        pre_u = _windowed_sketch_get(spec, table, uk, n_distinct)
        invB = inv.reshape(B, 2, nw)
        preB = pre_u[inv].reshape(B, 2, nw)
        validB = valid.reshape(B, 2, nw)
        realB = real.reshape(B, 2)
        nrow = jnp.sum(validB.astype(I32_), axis=2)  # [B, 2]
        ta = trim_at.astype(U32)
        dc = dn_cov.astype(U32)
        co = cutoff.astype(U32)

        # K-bundle links: see the diginorm kernel's note (identical
        # construction; only kept == (branch == 2) differs)
        K = _SCAN_LINK
        Bp = -(-B // K) * K
        padB = Bp - B
        if padB:
            invB = jnp.concatenate(
                [invB, jnp.zeros((padB, 2, nw), I32_)])
            preB = jnp.concatenate(
                [preB, jnp.zeros((padB, 2, nw), U32)])
            validB = jnp.concatenate(
                [validB, jnp.zeros((padB, 2, nw), bool)])
            realB = jnp.concatenate(
                [realB, jnp.zeros((padB, 2), bool)])
            nrow = jnp.concatenate(
                [nrow, jnp.zeros((padB, 2), I32_)])
        invB = invB.reshape(Bp // K, K, 2, nw)
        preB = preB.reshape(Bp // K, K, 2, nw)
        validB = validB.reshape(Bp // K, K, 2, nw)
        realB = realB.reshape(Bp // K, K, 2)
        nrow = nrow.reshape(Bp // K, K, 2)

        def step(tally, x):
            # branch tests need only median-vs-threshold comparisons:
            # sorted-ascending median s[nr//2] >= T iff at least
            # nr - nr//2 counts are >= T — no in-scan sort
            ids, pr, val, rl, nr = x
            idsf = ids.reshape(K, -1)
            valf = val.reshape(K, -1)
            base = pr + tally[ids]
            eq = (idsf[:, None, :, None] == idsf[None, :, None, :])
            contrib = jnp.sum(
                (eq & valf[:, None, :, None]).astype(U32), axis=2)
            branches, fbs = [], []
            for j in range(K):
                cnt = base[j]
                for i in range(j):
                    cnt = cnt + jnp.where(
                        branches[i] == I32_(2),
                        contrib[i, j].reshape(2, nw), U32(0))
                need = nr[j] - nr[j] // 2

                def all_rows_med_ge(T, cnt=cnt, j=j):
                    ge = jnp.sum(((cnt >= T) & val[j]).astype(I32_),
                                 axis=1)
                    return jnp.where(rl[j], ge >= need, True).all()

                if do_normalize:
                    br = jnp.where(
                        all_rows_med_ge(dc), I32_(0),
                        jnp.where(all_rows_med_ge(ta), I32_(1),
                                  I32_(2)))
                else:
                    br = jnp.where(all_rows_med_ge(ta), I32_(1),
                                   I32_(2))
                branches.append(br)
                wi = jax.lax.broadcasted_iota(I32_, cnt.shape, 1)
                fbs.append(jnp.min(
                    jnp.where((cnt < co) & val[j], wi, I32_(nw)),
                    axis=1))
            branch = jnp.stack(branches)
            add = (val & (branch == I32_(2))[:, None, None]).astype(U32)
            tally = tally.at[ids.reshape(-1)].add(add.reshape(-1))
            return tally, (branch, jnp.stack(fbs))

        tally0 = jnp.zeros(N, U32)
        tally, (branch, fbad) = jax.lax.scan(
            step, tally0, (invB, preB, validB, realB, nrow))
        branch = branch.reshape(-1)[:B]
        fbad = fbad.reshape(-1, 2)[:B].reshape(B2)

        # consume the saved bundles' k-mers with the exact claim rule
        keptlane = valid.reshape(-1) & jnp.repeat(branch == 2, 2 * nw)
        firsts = jnp.full(N, IDX_SENTINEL, U32).at[inv].min(
            jnp.where(keptlane, lanepos, IDX_SENTINEL))
        totals = jnp.minimum(tally, TOTAL_CLAMP)
        table, n_new = _windowed_claim_flush(spec, table, uk, totals,
                                             firsts)
        return table, uniq + n_new, branch, fbad

    return jax.jit(fn, donate_argnums=(0,))


@lru_cache(maxsize=None)
def _make_median_at_least_fn(spec, k, hash_kind):
    """Batched median_at_least (hashtable.cc:341-370): per row, true
    when #(counts >= cutoff) >= int(0.5 + n/2)."""

    def fn(table, data, lengths, cutoff):
        if hash_kind == "2bit":
            h, valid = kmer_hashes_2bit(data, lengths, k)
        else:
            h, valid = _bytes_hash(hash_kind)(data, lengths, k)
        counts = sketch_get(spec, table, h)
        hits = jnp.sum(((counts >= cutoff) & valid).astype(jnp.int32),
                       axis=1)
        n = jnp.sum(valid.astype(jnp.int32), axis=1)
        min_req = (n + 1) // 2  # int(0.5 + n/2)
        return (hits >= min_req) & (n > 0)

    return jax.jit(fn)


# bundles per sequential scan link in the dn/trim batch kernels
# (round 5: each link costs ~28 us of dependent gather->scatter
# latency regardless of body size, so K bundles share one link with
# exact in-link overlap correction)
_SCAN_LINK = int(os.environ.get("KHMER_TPU_SCAN_LINK", "16"))


def _pack_rows_2bit(data):
    """Host-side 4-per-byte packing of a [B, L] 2-bit-code row batch
    (pads L to a multiple of 4): the dn/trim batch kernels' input
    wire drops 4x (round 5: the per-batch upload was ~0.5 s/batch of
    the stamps trim wall over a 10 MB/s tunnel)."""
    B, L = data.shape
    Lp = -(-L // 4) * 4
    if Lp != L:
        pad = np.zeros((B, Lp - L), np.uint8)
        data = np.concatenate([data, pad], axis=1)
    q = data.reshape(B, Lp // 4, 4)
    return (q[:, :, 0] | (q[:, :, 1] << 2) | (q[:, :, 2] << 4)
            | (q[:, :, 3] << 6)), L


def _unpack_rows_2bit(packed, L):
    """Device-side inverse of _pack_rows_2bit."""
    shifts = jnp.arange(4, dtype=jnp.uint8) * 2
    out = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint8(3)
    return out.reshape(packed.shape[0], -1)[:, :L]


def _windowed_sketch_get(spec, table, uk, n_distinct, W=16):
    """sketch_get over compact-front unique keys in W static windows,
    lax.cond-skipping windows wholly past n_distinct (their lanes are
    all SENTINEL).  Exact — a pure gather — but the inactive windows
    cost ~nothing, so the batched dn/trim kernels pay for the
    DISTINCT count instead of the padded lane count (round 5: the
    padded-width preget+flush was ~60% of the per-batch device wall
    at stamps scale)."""
    from khmer_tpu.ops.deferred import SENTINEL

    N = uk.shape[0]
    Wsz = -(-N // W)
    pad = W * Wsz - N
    ukp = jnp.concatenate([uk, jnp.full((pad,), SENTINEL, U64)]) \
        if pad else uk

    def body(w, acc):
        def active(a):
            seg = jax.lax.dynamic_slice(ukp, (w * Wsz,), (Wsz,))
            pre = sketch_get(spec, table, seg).astype(U32)
            return jax.lax.dynamic_update_slice(a, pre, (w * Wsz,))

        return jax.lax.cond(w * Wsz < n_distinct, active,
                            lambda a: a, acc)

    acc = jax.lax.fori_loop(0, W, body, jnp.zeros(W * Wsz, U32))
    return acc[:N]


def _windowed_claim_flush(spec, table, uk, totals, firsts, W=16):
    """Flush the batch kernels' per-unique kept totals into the
    sketch in W first-occurrence-ordered windows, cond-skipping
    windows past the kept-distinct count.  Exactness across windows
    is the deferred flush's argument (ops/deferred.py module
    docstring): windows are ordered by first occurrence and window
    j+1's pre-count gathers see window j's scatters through the
    loop-carried table.  Returns (table, n_new_total)."""
    from khmer_tpu.ops.deferred import (IDX_SENTINEL, SENTINEL,
                                        choose_flush_ops)

    I32_ = jnp.int32
    N = uk.shape[0]
    n_flush = jnp.sum((firsts != IDX_SENTINEL).astype(I32_))
    f2, k2, t2 = jax.lax.sort((firsts, uk, totals), num_keys=1)
    Wsz = -(-N // W)
    pad = W * Wsz - N
    if pad:
        f2 = jnp.concatenate([f2, jnp.full((pad,), IDX_SENTINEL, U32)])
        k2 = jnp.concatenate([k2, jnp.full((pad,), SENTINEL, U64)])
        t2 = jnp.concatenate([t2, jnp.zeros((pad,), U32)])
    ops = choose_flush_ops(spec, Wsz)

    def body(w, carry):
        def active(c):
            tbl, nu = c
            ks = jax.lax.dynamic_slice(k2, (w * Wsz,), (Wsz,))
            ts = jax.lax.dynamic_slice(t2, (w * Wsz,), (Wsz,))
            fs = jax.lax.dynamic_slice(f2, (w * Wsz,), (Wsz,))
            tbl, n_new = ops(spec, tbl, ks, ts, fs, False, False)
            return tbl, nu + n_new

        return jax.lax.cond(w * Wsz < n_flush, active,
                            lambda c: c, carry)

    return jax.lax.fori_loop(0, W, body,
                             (table, jnp.zeros((), U64)))


@lru_cache(maxsize=None)
def _make_diginorm_fn(spec, k, hash_kind, L=None):
    """Whole-batch digital normalization in ONE device dispatch
    (round-4 VERDICT #6): hash every read, compact in-batch k-mer ids,
    replay the reference's sequential keep decision as a lax.scan over
    bundles (a bundle's current count for hash h is pre_batch(h) +
    tally(h), where tally counts every k-mer of bundles kept earlier
    in the batch — exact, because sketch counts are additive and
    saturating reads compare identically against C), then flush the
    scan's per-unique kept-occurrence tally into the sketch with the
    exact n_unique claim rule.  Only the [B] keep flags cross back to
    the host — the previous host replay fetched ~10 bytes per k-mer
    per batch, which was most of diginorm's wall over a tunneled
    device.  Reference semantics: normalize-by-median.py reference
    fork :155-172 (batched queries), Hashtable::get_median_count
    (hashtable.cc:341-370).

    fn(table, uniq, data[B2, L], lengths[B2], real[B2], C)
      -> (table, uniq, keeps[B])  with B = B2 // 2 bundles (row pairs;
    pad rows carry real=False)."""
    from khmer_tpu.ops.deferred import (IDX_SENTINEL, SENTINEL,
                                        TOTAL_CLAMP, choose_flush_ops)

    I32_ = jnp.int32

    def fn(table, uniq, data, lengths, real, C):
        if L is not None:
            data = _unpack_rows_2bit(data, L)
        if hash_kind == "2bit":
            h, valid = kmer_hashes_2bit(data, lengths, k)
        else:
            h, valid = _bytes_hash(hash_kind)(data, lengths, k)
        B2, nw = h.shape
        B = B2 // 2
        N = B2 * nw
        flat = jnp.where(valid.reshape(-1), h.reshape(-1), SENTINEL)
        lanepos = jax.lax.iota(U32, N)
        # compact in-batch ids: rank of each lane's hash
        sk, sl = jax.lax.sort((flat, lanepos), num_keys=1)
        firstm = jnp.concatenate(
            [jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        rank = jnp.cumsum(firstm.astype(I32_)) - 1
        inv = jnp.zeros(N, I32_).at[sl].set(rank, unique_indices=True)
        uk = jnp.full(N, SENTINEL, U64).at[
            jnp.where(firstm, rank, I32_(N))].set(
            jnp.where(firstm, sk, SENTINEL), mode="drop")
        n_distinct = rank[-1] + 1
        pre_u = _windowed_sketch_get(spec, table, uk, n_distinct)
        # K-bundle links (round 5): the sequential chain costs a
        # fixed ~28 us per scan step regardless of body size (the
        # dependent tally gather->scatter latency), so K bundles ride
        # ONE step; in-link sequential exactness is restored by the
        # overlap matrix contrib[i, j, lane] = bundle i's kept-lane
        # occurrences of bundle j's lane k-mer, added for kept i < j
        # -- exactly what the per-bundle tally would have added.
        K = _SCAN_LINK
        Bp = -(-B // K) * K
        padB = Bp - B
        invB = inv.reshape(B, 2, nw)
        preB = pre_u[inv].reshape(B, 2, nw)
        validB = valid.reshape(B, 2, nw)
        realB = real.reshape(B, 2)
        if padB:
            invB = jnp.concatenate(
                [invB, jnp.zeros((padB, 2, nw), I32_)])
            preB = jnp.concatenate(
                [preB, jnp.zeros((padB, 2, nw), U32)])
            validB = jnp.concatenate(
                [validB, jnp.zeros((padB, 2, nw), bool)])
            realB = jnp.concatenate(
                [realB, jnp.zeros((padB, 2), bool)])
        invB = invB.reshape(Bp // K, K, 2, nw)
        preB = preB.reshape(Bp // K, K, 2, nw)
        validB = validB.reshape(Bp // K, K, 2, nw)
        realB = realB.reshape(Bp // K, K, 2)
        Cc = C.astype(U32)

        def step(tally, x):
            ids, pr, val, rl = x
            idsf = ids.reshape(K, -1)
            valf = val.reshape(K, -1)
            base = pr + tally[ids]
            eq = (idsf[:, None, :, None] == idsf[None, :, None, :])
            contrib = jnp.sum(
                (eq & valf[:, None, :, None]).astype(U32), axis=2)
            keeps_l = []
            for j in range(K):
                cnt = base[j]
                for i in range(j):
                    cnt = cnt + jnp.where(
                        keeps_l[i], contrib[i, j].reshape(2, nw),
                        U32(0))
                hits = jnp.sum(((cnt >= Cc) & val[j]).astype(I32_),
                               axis=1)
                nr = jnp.sum(val[j].astype(I32_), axis=1)
                keep_row = rl[j] & ((nr == 0) |
                                    (hits < (nr + 1) // 2))
                keeps_l.append(keep_row.any())
            keep_vec = jnp.stack(keeps_l)
            add = (val & keep_vec[:, None, None]).astype(U32)
            tally = tally.at[ids.reshape(-1)].add(add.reshape(-1))
            return tally, keep_vec

        tally0 = jnp.zeros(N, U32)
        tally, keeps = jax.lax.scan(
            step, tally0, (invB, preB, validB, realB))
        keeps = keeps.reshape(-1)[:B]

        # flush kept occurrences with the exact claim rule: the scan's
        # final tally IS the per-unique kept-occurrence total, and the
        # first kept position per unique comes from one scatter-min
        keptlane = valid.reshape(-1) & jnp.repeat(keeps, 2 * nw)
        firsts = jnp.full(N, IDX_SENTINEL, U32).at[inv].min(
            jnp.where(keptlane, lanepos, IDX_SENTINEL))
        totals = jnp.minimum(tally, TOTAL_CLAMP)
        table, n_new = _windowed_claim_flush(spec, table, uk, totals,
                                             firsts)
        return table, uniq + n_new, keeps

    return jax.jit(fn, donate_argnums=(0,))


class _FlatBatcher:
    """Accumulate encoded reads into fixed-size flat chunks + window masks."""

    def __init__(self, k, chunk=CHUNK):
        self.k = k
        self.chunk = chunk
        self.parts = []
        self.masks = []
        self.filled = 0

    def add(self, codes):
        """Queue one encoded read; yields (data, weights) filled chunks.

        Windows near a chunk boundary cannot be hashed in that chunk, so
        after a flush the read continues with a k-1 base overlap and those
        windows are re-emitted (and re-masked) in the next chunk; no window
        is ever counted twice because windows past position chunk-k are
        dropped when weights are sliced to the hash width.
        """
        k = self.k
        n = codes.shape[0]
        start = 0
        while True:
            space = self.chunk - self.filled
            take = min(n - start, space)
            if take > 0:
                piece = codes[start: start + take]
                m = np.zeros(take, np.uint8)
                nvalid = (n - start) - k + 1  # windows fully inside the read
                if nvalid > 0:
                    m[: min(nvalid, take)] = 1
                self.parts.append(piece)
                self.masks.append(m)
                self.filled += take
            if self.filled == self.chunk:
                yield self._flush()
                # first window not evaluated in the flushed chunk
                start = max(0, start + take - (k - 1))
                if n - start < k:
                    return
            else:
                return

    def _flush(self):
        data = np.concatenate(self.parts) if self.parts else np.zeros(
            0, np.uint8)
        mask = np.concatenate(self.masks) if self.masks else np.zeros(
            0, np.uint8)
        self.parts = []
        self.masks = []
        self.filled = 0
        return data, mask

    def drain(self):
        """Flush the partial tail chunk, padded to the smallest
        power-of-two bucket (>= one hash-kernel row) — small inputs
        must not pay full-chunk kernel costs."""
        if self.filled == 0:
            return None
        data, mask = self._flush()
        bucket = ROW_PAYLOAD
        while bucket < data.shape[0]:
            bucket *= 2
        bucket = min(bucket, self.chunk)
        pad = bucket - data.shape[0]
        if pad:
            data = np.concatenate([data, np.zeros(pad, np.uint8)])
            mask = np.concatenate([mask, np.zeros(pad, np.uint8)])
        return data, mask


class Hashtable:
    """Base k-mer table (count/add/get + bulk consume + per-read stats)."""

    storage_class = None
    hash_kind = None  # '2bit' or 'murmur'

    def __init__(self, ksize, starting_size=None, n_tables=None,
                 primes=None):
        ksize = int(ksize)
        if self.hash_kind == "2bit" and ksize > 32:
            raise ValueError("k-mer size must be <= 32 for this table type")
        if ksize < 1 or ksize > 255:
            raise ValueError("k-mer size must be in [1, 255]")
        if primes is None:
            primes = get_n_primes_near_x(n_tables, starting_size)
            if len(primes) != n_tables:
                raise RuntimeError(
                    "unable to find {} primes < {}".format(
                        n_tables, starting_size))
        self._ksize = ksize
        self.storage = self.storage_class(primes)

    # -- identity/geometry --------------------------------------------------

    def ksize(self):
        return self._ksize

    def hashsizes(self):
        return self.storage.get_tablesizes()

    def n_tables(self):
        return self.storage.n_tables

    def n_occupied(self):
        return self.storage.n_occupied()

    def n_unique_kmers(self):
        return self.storage.n_unique_kmers()

    def set_use_bigcount(self, b):
        self.storage.set_use_bigcount(b)

    def get_use_bigcount(self):
        return self.storage.get_use_bigcount()

    # -- encoding helpers ----------------------------------------------------

    def _encode(self, sequence):
        """Encode a raw sequence for this table's hash function."""
        if self.hash_kind == "2bit":
            return enc.encode_sequence(sequence)
        return np.frombuffer(sequence.encode("ascii"), np.uint8)

    def _sanitize_seq_kmer(self, kmer):
        if len(kmer) != self._ksize:
            raise ValueError(
                "Expected k-mer length {} but got {}.".format(
                    self._ksize, len(kmer)))
        return kmer

    def _valid_sequence(self, sequence):
        if len(sequence) < self._ksize:
            raise ValueError(
                "sequence length ({}) must >= the hashtable k-mer size "
                "({})".format(len(sequence), self._ksize))
        return sequence

    # -- hashing --------------------------------------------------------------

    def hash(self, kmer):
        """Hash of a single k-mer (string or passthrough int)."""
        if isinstance(kmer, (int, np.integer)):
            return int(kmer)
        self._sanitize_seq_kmer(kmer)
        if self.hash_kind == "2bit":
            return forward_hash(kmer, self._ksize)
        if self.hash_kind == "cyclic":
            from khmer_tpu.ops.rollinghash import hash_cyclic_scalar

            return hash_cyclic_scalar(kmer, self._ksize)[0]
        return hash_murmur3_scalar(kmer)

    def reverse_hash(self, khash):
        if self.hash_kind != "2bit":
            # reference raises "not implemented" (hashtable.hh:468-472)
            raise ValueError("not implemented")
        return reverse_hash(khash, self._ksize)

    def get_kmer_hashes(self, sequence):
        """Ordered hashes of every k-mer in sequence."""
        self._valid_sequence(sequence)
        return [int(h) for h in self._hash_array(sequence)]

    def get_kmer_hashes_as_hashset(self, sequence):
        """Hashes of every k-mer in sequence as a HashSet
        (reference khmer/_oxli/graphs.pyx get_kmer_hashes_as_hashset)."""
        from khmer_tpu.hashset import HashSet

        self._valid_sequence(sequence)
        return HashSet(self._ksize, self.get_kmer_hashes(sequence))

    def _hash_array(self, sequence):
        """All k-mer hashes of a sequence as a numpy uint64 array."""
        codes = self._encode(sequence)
        n = codes.shape[0]
        if n < self._ksize:
            return np.zeros(0, np.uint64)
        w = _bucket_width(n)
        data = np.zeros(w, np.uint8)
        data[:n] = codes
        fn = _make_hashes_fn(self._ksize, self.hash_kind)
        hashes = np.asarray(fn(jax.device_put(data)))
        return hashes[: n - self._ksize + 1]

    def _hash_rows(self, sequences):
        """Per-sequence k-mer hash arrays for a batch of sequences,
        computed in ONE padded device call (shapes bucketed to bound
        recompilation)."""
        k = self._ksize
        enc_rows = [self._encode(s) for s in sequences]
        n = len(enc_rows)
        if n == 0:
            return []
        L = max(r.shape[0] for r in enc_rows)
        # power-of-two row width: every distinct (rows, width) shape is
        # a fresh XLA compile, so the bucket set must stay tiny
        L = max(1 << (max(L - 1, 1)).bit_length(), 64) + k
        B = 1
        while B < n:
            B *= 2
        data = np.zeros((B, L), np.uint8)
        lengths = np.zeros(B, np.int32)
        for i, r in enumerate(enc_rows):
            data[i, : r.shape[0]] = r
            lengths[i] = r.shape[0]
        fn = _make_row_hashes_fn(k, self.hash_kind)
        hashes = np.asarray(fn(jax.device_put(data),
                               jax.device_put(lengths)))
        out = []
        for i, r in enumerate(enc_rows):
            w = r.shape[0] - k + 1
            out.append(hashes[i, : max(w, 0)])
        return out

    def _hash_count_rows(self, sequences):
        """Per-sequence (hashes, counts) pairs for a batch of
        sequences, resolved in ONE device call."""
        k = self._ksize
        enc_rows = [self._encode(s) for s in sequences]
        n = len(enc_rows)
        if n == 0:
            return []
        L = max(r.shape[0] for r in enc_rows)
        # power-of-two row width: every distinct (rows, width) shape is
        # a fresh XLA compile, so the bucket set must stay tiny
        L = max(1 << (max(L - 1, 1)).bit_length(), 64) + k
        B = 1
        while B < n:
            B *= 2
        data = np.zeros((B, L), np.uint8)
        lengths = np.zeros(B, np.int32)
        for i, r in enumerate(enc_rows):
            data[i, : r.shape[0]] = r
            lengths[i] = r.shape[0]
        fn = _make_row_hashes_counts_fn(self.storage._read_spec(), k,
                                        self.hash_kind)
        hashes, counts = fn(self.storage.table, jax.device_put(data),
                            jax.device_put(lengths))
        hashes = np.asarray(hashes)
        counts = np.asarray(counts)
        out = []
        for i, r in enumerate(enc_rows):
            w = max(r.shape[0] - k + 1, 0)
            out.append((hashes[i, :w], counts[i, :w]))
        return out

    def diginorm_batch(self, seq_pairs, desired_coverage):
        """Digital-normalization step over a batch of read bundles,
        entirely on device (_make_diginorm_fn): decides keep/drop per
        bundle with the reference's sequential semantics AND consumes
        the kept reads' k-mers (exact n_unique claim rule).  Returns
        the per-bundle keep flags as a device array — fetch lazily.

        seq_pairs: list of (seq0, seq1_or_None) cleaned sequences."""
        from khmer_tpu.ops.deferred import stage

        k = self._ksize
        with stage("dn-pack", lanes=len(seq_pairs)):
            rows, real = [], []
            for s0, s1 in seq_pairs:
                rows.append(self._encode(s0))
                real.append(True)
                rows.append(self._encode(s1) if s1 is not None
                            else np.zeros(0, np.uint8))
                real.append(s1 is not None)
            n = len(rows)
            L = max((r.shape[0] for r in rows), default=1)
            L = max(1 << (max(L - 1, 1)).bit_length(), 64) + k
            B2 = 2
            while B2 < n:
                B2 *= 2
            data = np.zeros((B2, L), np.uint8)
            lengths = np.zeros(B2, np.int32)
            realarr = np.zeros(B2, bool)
            for i, r in enumerate(rows):
                data[i, : r.shape[0]] = r
                lengths[i] = r.shape[0]
                realarr[i] = real[i]
        st = self.storage
        if self.hash_kind == "2bit":
            # 2-bit-packed upload: 4x less wire (_pack_rows_2bit)
            data, Lk = _pack_rows_2bit(data)
        else:
            Lk = None
        fn = _make_diginorm_fn(st._read_spec(), k, self.hash_kind,
                               L=Lk)
        # ONE batched put: 3 separate puts pay the per-transfer fixed
        # cost (~0.2 s tunneled) three times
        d_data, d_len, d_real = jax.device_put((data, lengths, realarr))
        with stage("dn-batch", lanes=n) as _s:
            st.table, st._n_unique, keeps = fn(
                st.table, st._n_unique, d_data, d_len, d_real,
                np.uint32(desired_coverage))
            if _s is not None:
                _s.sync = keeps
        st._loaded_occupied = None
        st._virgin = False
        st.mark_dirty()
        return keeps[: len(seq_pairs)]

    def trim_pass1_batch(self, seq_pairs, trim_at_coverage,
                         diginorm_coverage=None, cutoff=2):
        """trim-low-abund pass-1 step over a batch of read bundles,
        entirely on device (_make_trim_pass1_fn).  Returns (branch,
        first_bad): the per-bundle branch array (0 skip / 1 trim / 2
        saved-and-consumed) and each row's first window whose
        scan-time adjusted count is < cutoff (nw when none) — all
        trim_record needs (trimming.trim_record_from_first_bad).
        Raises ValueError on a real read shorter than k, matching the
        host _median."""
        from khmer_tpu.ops.deferred import stage

        k = self._ksize
        with stage("trim-pack", lanes=len(seq_pairs)):
            rows, real = [], []
            for s0, s1 in seq_pairs:
                for s in (s0, s1):
                    if s is None:
                        rows.append(np.zeros(0, np.uint8))
                        real.append(False)
                        continue
                    if len(s) < k:
                        raise ValueError(
                            "no k-mer counts; read too short?")
                    rows.append(self._encode(s))
                    real.append(True)
            n = len(rows)
            L = max((r.shape[0] for r in rows), default=1)
            L = max(1 << (max(L - 1, 1)).bit_length(), 64) + k
            B2 = 2
            while B2 < n:
                B2 *= 2
            data = np.zeros((B2, L), np.uint8)
            lengths = np.zeros(B2, np.int32)
            realarr = np.zeros(B2, bool)
            for i, r in enumerate(rows):
                data[i, : r.shape[0]] = r
                lengths[i] = r.shape[0]
                realarr[i] = real[i]
        st = self.storage
        if self.hash_kind == "2bit":
            data, Lk = _pack_rows_2bit(data)
        else:
            Lk = None
        fn = _make_trim_pass1_fn(st._read_spec(), k, self.hash_kind,
                                 diginorm_coverage is not None, L=Lk)
        dn = diginorm_coverage if diginorm_coverage is not None else 0
        d_data, d_len, d_real = jax.device_put((data, lengths, realarr))
        with stage("trim-pass1", lanes=n) as _s:
            st.table, st._n_unique, branch, first_bad = fn(
                st.table, st._n_unique, d_data, d_len, d_real,
                np.uint32(trim_at_coverage), np.uint32(dn),
                np.uint32(cutoff))
            if _s is not None:
                _s.sync = branch
        st._loaded_occupied = None
        st._virgin = False
        st.mark_dirty()
        return branch[: len(seq_pairs)], first_bad

    def count_rows(self, sequences):
        """Per-sequence count arrays in ONE device call, fetching
        counts only (2 B per k-mer; _hash_count_rows fetches 10)."""
        k = self._ksize
        enc_rows = [self._encode(s) for s in sequences]
        n = len(enc_rows)
        if n == 0:
            return []
        L = max(r.shape[0] for r in enc_rows)
        L = max(1 << (max(L - 1, 1)).bit_length(), 64) + k
        B = 1
        while B < n:
            B *= 2
        data = np.zeros((B, L), np.uint8)
        lengths = np.zeros(B, np.int32)
        for i, r in enumerate(enc_rows):
            data[i, : r.shape[0]] = r
            lengths[i] = r.shape[0]
        fn = _make_row_counts_fn(self.storage._read_spec(), k,
                                 self.hash_kind)
        from khmer_tpu.ops.deferred import stage

        d_data, d_len = jax.device_put((data, lengths))
        with stage("count-rows", lanes=n):
            counts = np.asarray(fn(self.storage.table, d_data, d_len))
        out = []
        for i, r in enumerate(enc_rows):
            w = max(r.shape[0] - k + 1, 0)
            out.append(counts[i, :w])
        return out

    def get_kmers(self, sequence):
        """All k-mer substrings, in order; too-short sequences raise
        like the reference binding (graphs.pyx get_kmers)."""
        k = self._ksize
        self._valid_sequence(sequence)
        return [sequence[i: i + k] for i in range(len(sequence) - k + 1)]

    # -- single k-mer ops ------------------------------------------------------

    def add(self, kmer):
        """Increment this k-mer's count; True when previously unseen."""
        return self.storage.add(self.hash(kmer) if isinstance(kmer, str)
                                else int(kmer))

    def count(self, kmer):
        self.add(kmer)

    def get(self, kmer):
        """Count of a k-mer (string or int hash).  Floats are a
        TypeError like the reference binding (graphs.pyx get)."""
        if isinstance(kmer, float):
            raise TypeError("k-mer must be a string or an integer hash")
        h = self.hash(kmer) if isinstance(kmer, str) else int(kmer)
        return self.storage.get(h)

    # -- bulk consume -----------------------------------------------------------

    def consume(self, sequence):
        """Count every k-mer in the sequence; returns how many."""
        self._valid_sequence(sequence)
        hashes = self._hash_array(sequence)
        self.storage.add_batch(hashes)
        return int(hashes.shape[0])

    def _run_consume(self, reads_iter, mask=None, threshold=0,
                     num_bands=None, band=None, consume_masked=False):
        """Shared driver for consume_seqfile* variants, running the
        deferred (sort-based) bulk path: chunks append hashed lanes to
        a device buffer; duplicate hashes are combined by sort-merge;
        the sketch scatter happens per DISTINCT hash at flush time
        (khmer_tpu/ops/deferred.py).  Valid because consume_seqfile
        callers never interleave reads with the load (reference usage,
        e.g. scripts/load-into-counting.py:103 then queries after).

        Returns (n_reads, n_consumed); n_consumed counts the k-mers
        that passed the band/mask filters (reference semantics)."""
        from khmer_tpu.ops.hashing import compute_band_interval

        banded = num_bands is not None
        masked_spec = mask.storage._read_spec() if mask is not None else None
        fn = _make_append_fn(self._ksize, self.hash_kind, masked_spec,
                             banded, from_codes=True,
                             consume_masked=consume_masked, packed=True)
        extra = []
        if banded:
            bmin, bmax = compute_band_interval(num_bands, band)
            extra += [jnp.asarray(bmin, U64), jnp.asarray(bmax, U64)]
        if mask is not None:
            extra += [mask.storage.table, jnp.asarray(threshold, U32)]

        from khmer_tpu.ops.deferred import DeferredCounter

        st = self.storage
        chunk = _fit_chunk(self._ksize, self.hash_kind,
                           _consume_chunk_size())
        counter = DeferredCounter(
            st, _chunk_lane_count(self._ksize, self.hash_kind, chunk))
        batcher = _FlatBatcher(self._ksize, chunk)
        n_reads = 0
        consumed = jnp.zeros((), U64)

        def push(data, weights):
            buf = _pack_chunk(data, weights,
                              from_ascii=self.hash_kind != "2bit")
            return counter.append_chunk(
                fn, consumed, (jax.device_put(buf),), extra,
                lanes=_chunk_lane_count(
                    self._ksize, self.hash_kind, data.shape[0]))

        for read in reads_iter:
            seq = read.cleaned_seq if hasattr(read, "cleaned_seq") \
                else str(read)
            n_reads += 1
            codes = self._encode(seq)
            for data, weights in batcher.add(codes):
                consumed = push(data, weights)
        tail = batcher.drain()
        if tail is not None:
            consumed = push(*tail)
        counter.finish()
        return n_reads, int(consumed)

    def _reads(self, parser_or_filename):
        if isinstance(parser_or_filename, str):
            return iter(FastxReader(parser_or_filename))
        return iter(parser_or_filename)

    def consume_seqfile(self, parser_or_filename):
        """Count every k-mer from every (cleaned) read in a file.

        Parity: Hashtable::consume_seqfile, src/oxli/hashtable.cc:133-158.
        Uses the native C++ loader (parse+clean+encode+batch) when
        available; falls back to the python parser otherwise.  With
        more than one JAX device the consume runs sharded over the
        mesh (zero-comms deferred streaming + routed flush,
        khmer_tpu/parallel/sharded.py); disable with
        KHMER_TPU_SHARDED=0."""
        if self._use_sharded(parser_or_filename):
            return self._consume_sharded(parser_or_filename)
        if self._can_use_native(parser_or_filename):
            try:
                return self._consume_native(parser_or_filename)
            except (RuntimeError, OSError, ValueError):
                pass
        return self._run_consume(self._reads(parser_or_filename))

    def _use_sharded(self, parser_or_filename=None):
        import os

        mode = os.environ.get("KHMER_TPU_SHARDED", "auto").lower()
        if mode in ("0", "off", "serial", "false"):
            return False
        if getattr(self.storage, "spec", None) is None:
            return False
        if len(jax.devices()) < 2:
            return False
        if mode in ("1", "on", "force", "always", "true"):
            return True
        # auto: sharding pays off only on bulk inputs — per-spec
        # shard_map compiles and per-shard buffers cost seconds, so
        # small files stay on the single-device deferred path
        min_mb = float(os.environ.get("KHMER_TPU_SHARD_MIN_MB", "64"))
        if not isinstance(parser_or_filename, str):
            return False
        try:
            return os.path.getsize(parser_or_filename) >= min_mb * 1e6
        except OSError:
            return False

    def _consume_sharded(self, parser_or_filename):
        """Multi-device bulk consume: every device hashes and buffers
        its own chunk stream (no communication); distinct lanes route
        to their hash-band owners at flush (parallel/sharded.py)."""
        from khmer_tpu.parallel.sharded import ShardedDeferredConsumer

        st = self.storage
        native = self._can_use_native(parser_or_filename)
        consumer = ShardedDeferredConsumer(
            st._read_spec(), self._ksize, self.hash_kind,
            chunk=CHUNK, from_codes=native)
        if native:
            from khmer_tpu.native import NativeChunkReader

            reader = NativeChunkReader(parser_or_filename, self._ksize,
                                       CHUNK)
            for data, weights in reader:
                consumer.add_chunk(data, weights)
            n_reads, _, _ = reader.stats()
            n_reads = int(n_reads)
            reader.close()
        else:
            batcher = _FlatBatcher(self._ksize)
            n_reads = 0
            for read in self._reads(parser_or_filename):
                seq = read.cleaned_seq if hasattr(read, "cleaned_seq") \
                    else str(read)
                n_reads += 1
                codes = self._encode(seq)
                for data, weights in batcher.add(codes):
                    consumer.add_chunk(data, weights)
            tail = batcher.drain()
            if tail is not None:
                consumer.add_chunk(*tail)
        if st.is_virgin():
            delta, n_unique, n_consumed, cands = consumer.finish(
                virgin=True)
        else:
            delta, n_unique, n_consumed, cands = consumer.finish(st.table)
        st.table = (st.table + delta).astype(U32)
        st._n_unique = st._n_unique + jnp.uint64(n_unique)
        st._loaded_occupied = None
        st.mark_dirty()
        if cands and st.get_use_bigcount():
            st.bigcount_candidates.update(cands)
        return n_reads, n_consumed

    @staticmethod
    def _can_use_native(parser_or_filename):
        if not isinstance(parser_or_filename, str):
            return False
        if parser_or_filename not in ("-", "/dev/stdin") and \
                not os.path.exists(parser_or_filename):
            return False  # python path raises the pretty ENOENT error
        from khmer_tpu.native import native_available

        return native_available()

    def _consume_native(self, filename):
        """Bulk consume through the C++ chunk loader (deferred path,
        bit-packed host->device transfer)."""
        from khmer_tpu.native import NativeChunkReader
        from khmer_tpu.ops.deferred import DeferredCounter

        st = self.storage
        fn = _make_append_fn(self._ksize, self.hash_kind, None, False,
                             from_codes=True, packed=True)
        chunk = _fit_chunk(self._ksize, self.hash_kind,
                           _consume_chunk_size())
        reader = NativeChunkReader(filename, self._ksize, chunk)
        counter = DeferredCounter(
            st, _chunk_lane_count(self._ksize, self.hash_kind, chunk))
        consumed = jnp.zeros((), U64)

        from khmer_tpu.ops.deferred import timing_enabled

        # batch the host->device transfers: one jax.device_put carries
        # a ~0.2 s fixed round-trip cost on tunneled devices, while a
        # BATCHED put of several buffers pays it once and streams the
        # bytes in the background (measured: 8x3MB puts 1.9 s vs one
        # batched put 0.03 s enqueue).  The batch RAMPS 1 -> 2 -> 4 so
        # the device starts on chunk 1 instead of idling behind the
        # host's read+pack of a full batch (measured 0.47 s head).
        PUT_BATCH = 4

        def produce():
            import time as _t

            pend = []
            batch = 1

            def flush_pend():
                t1 = _t.perf_counter()
                devs = jax.device_put(pend)
                if timing_enabled():
                    from khmer_tpu.ops.deferred import STAGE_TIMES

                    STAGE_TIMES["h2d-enqueue"] += _t.perf_counter() - t1
                pend.clear()
                return devs

            for data, weights in reader:
                t0 = _t.perf_counter()
                pend.append(_pack_chunk(data, weights))
                if timing_enabled():
                    from khmer_tpu.ops.deferred import (STAGE_LANES,
                                                        STAGE_TIMES)

                    STAGE_TIMES["pack"] += _t.perf_counter() - t0
                    STAGE_LANES["pack"] += int(data.shape[0])
                if len(pend) >= batch:
                    yield from flush_pend()
                    batch = min(batch * 2, PUT_BATCH)
            if pend:
                yield from flush_pend()

        # per-stage attribution lives inside append_chunk/finish
        # (ops/deferred.py stage() — round-5 VERDICT #2); wrapping them
        # here double-counted and left a 68%-opaque "finish" bucket
        for buf in _producer_stream(produce):
            consumed = counter.append_chunk(fn, consumed, (buf,))
        counter.finish()
        n_reads, n_consumed, _ = reader.stats()
        reader.close()
        return int(n_reads), int(n_consumed)

    def consume_seqfile_with_mask(self, parser_or_filename, mask,
                                  threshold=0, consume_masked=False):
        """Count k-mers whose count in `mask` is <= threshold (or >=
        threshold with consume_masked=True; hashtable.cc:160-198)."""
        return self._run_consume(self._reads(parser_or_filename),
                                 mask=mask, threshold=threshold,
                                 consume_masked=consume_masked)

    def consume_seqfile_banding(self, parser_or_filename, num_bands, band):
        """Count only k-mers whose hash falls in the given band
        (hashtable.hh:302-344)."""
        return self._run_consume(self._reads(parser_or_filename),
                                 num_bands=num_bands, band=band)

    def consume_seqfile_banding_with_mask(self, parser_or_filename,
                                          num_bands, band, mask,
                                          threshold=0,
                                          consume_masked=False):
        return self._run_consume(self._reads(parser_or_filename),
                                 mask=mask, threshold=threshold,
                                 num_bands=num_bands, band=band,
                                 consume_masked=consume_masked)

    # -- per-sequence statistics ------------------------------------------------

    def get_kmer_counts(self, sequence):
        """Ordered counts of every k-mer in sequence."""
        self._valid_sequence(sequence)
        hashes = self._hash_array(sequence)
        return [int(c) for c in self.storage.get_batch(hashes)]

    def get_min_count(self, sequence):
        # reference quirk: the running minimum starts at MAX_KCOUNT, so the
        # result never exceeds 255 even with bigcounts (hashtable.cc:425-443)
        return min(MAX_KCOUNT, min(self.get_kmer_counts(sequence)))

    def get_max_count(self, sequence):
        return max(self.get_kmer_counts(sequence))

    def get_median_count(self, sequence):
        """(median, average, stddev) of k-mer counts
        (hashtable.cc:307-339; median = sorted[n/2], population stddev)."""
        counts = np.asarray(self.get_kmer_counts(sequence), np.float64)
        if counts.size == 0:
            raise ValueError("no k-mer counts for this string; too short?")
        avg = float(counts.mean())
        stddev = float(math.sqrt(((counts - avg) ** 2).mean()))
        med = int(np.sort(counts)[counts.size // 2])
        return med, avg, stddev

    def get_median_count_batch(self, sequences):
        """get_median_count for a batch of sequences resolved in ONE
        device call: returns a list of (median, average, stddev)."""
        out = []
        for _, counts in self._hash_count_rows(sequences):
            counts = np.asarray(counts, np.float64)
            if counts.size == 0:
                out.append((0, 0.0, 0.0))
                continue
            avg = float(counts.mean())
            stddev = float(math.sqrt(((counts - avg) ** 2).mean()))
            med = int(np.sort(counts)[counts.size // 2])
            out.append((med, avg, stddev))
        return out

    def median_at_least(self, sequence, cutoff):
        """True when >= half the k-mers have count >= cutoff
        (hashtable.cc:341-370)."""
        self._valid_sequence(sequence)
        counts = self.storage.get_batch(self._hash_array(sequence))
        n = counts.size
        min_req = int(0.5 + n / 2.0)
        return bool((counts >= cutoff).sum() >= min_req)

    def median_at_least_batch(self, sequences, cutoff):
        """median_at_least for a batch of sequences in ONE device call
        (the fork's batched-query precedent, normalize-by-median.py:
        155-172, generalized): returns a bool numpy array."""
        n = len(sequences)
        if n == 0:
            return np.zeros(0, bool)
        k = self._ksize
        enc_rows = [self._encode(s) for s in sequences]
        L = max(r.shape[0] for r in enc_rows)
        # power-of-two row width: every distinct (rows, width) shape is
        # a fresh XLA compile, so the bucket set must stay tiny
        L = max(1 << (max(L - 1, 1)).bit_length(), 64) + k
        B = 1
        while B < n:
            B *= 2
        data = np.zeros((B, L), np.uint8)
        lengths = np.zeros(B, np.int32)
        for i, r in enumerate(enc_rows):
            data[i, : r.shape[0]] = r
            lengths[i] = r.shape[0]
        fn = _make_median_at_least_fn(self.storage._read_spec(), k,
                                      self.hash_kind)
        out = np.asarray(fn(self.storage.table, jax.device_put(data),
                            jax.device_put(lengths),
                            jnp.asarray(cutoff, U32)))
        return out[:n]

    def _trim_where(self, sequence, bad_mask):
        """Shared trim logic (hashtable.cc:503-570), including the
        reference quirk that a single-k-mer sequence always trims to 0."""
        n = bad_mask.size
        if n == 1:
            return "", 0
        bad = np.nonzero(bad_mask)[0]
        if bad.size == 0:
            return sequence, len(sequence)
        first = int(bad[0])
        if first == 0:
            return "", 0
        trim_at = first + self._ksize - 1
        return sequence[:trim_at], trim_at

    def trim_on_abundance(self, sequence, abundance):
        """Trim at the first k-mer with count below `abundance`."""
        self._valid_sequence(sequence)
        counts = self.storage.get_batch(self._hash_array(sequence))
        return self._trim_where(sequence, counts < abundance)

    def trim_below_abundance(self, sequence, abundance):
        """Trim at the first k-mer with count above `abundance`."""
        self._valid_sequence(sequence)
        counts = self.storage.get_batch(self._hash_array(sequence))
        return self._trim_where(sequence, counts > abundance)

    def find_spectral_error_positions(self, sequence, max_count):
        """Positions of low-abundance k-mer stretches
        (hashtable.cc:572-625)."""
        self._valid_sequence(sequence)
        counts = self.storage.get_batch(self._hash_array(sequence))
        n = counts.size
        posns = []
        i = 0
        while i < n and counts[i] <= max_count:
            i += 1
        if i == n:
            return posns
        if i > 0:
            posns.append(i - 1)
        j = i + 1
        while j < n:
            if counts[j] <= max_count:
                posns.append(j + self._ksize - 1)
                j += 1
                while j < n and counts[j] <= max_count:
                    j += 1
            j += 1
        return posns

    # -- khmer 1.x/2.x compat (see khmer_tpu/legacy.py) -----------------------

    def consume_fasta(self, parser_or_filename):
        """1.x name for consume_seqfile (_cpy_khmer.cc hash_consume_fasta)."""
        return self.consume_seqfile(parser_or_filename)

    def consume_fasta_with_reads_parser(self, parser):
        """1.x name for consume_seqfile on an open parser."""
        return self.consume_seqfile(parser)

    def output_fasta_kmer_pos_freq(self, inputfile, outputfile):
        """Per-read window-count dump (lib/counting.cc)."""
        from khmer_tpu import legacy
        return legacy.output_fasta_kmer_pos_freq(self, inputfile, outputfile)

    def fasta_count_kmers_by_position(self, inputfile, max_read_len,
                                      limit_by_count=0):
        """Positional window-count tallies (lib/counting.cc)."""
        from khmer_tpu import legacy
        return legacy.fasta_count_kmers_by_position(
            self, inputfile, max_read_len, limit_by_count)

    # -- abundance distribution ---------------------------------------------------

    def abundance_distribution(self, parser_or_filename, tracking):
        """Histogram of k-mer counts over a file, deduplicated through the
        `tracking` filter (hashtable.cc:460-501).  Returns a list of
        MAX_BIGCOUNT+1 entries."""
        from khmer_tpu._config import MAX_BIGCOUNT

        st = self.storage
        ts = tracking.storage
        # host-side overlay is only needed when a bigcount map was
        # loaded from disk (live counts are exact in the uint32 table)
        want_lanes = bool(st.get_use_bigcount() and st.bigcounts)
        native = isinstance(parser_or_filename, str) and \
            self._can_use_native(parser_or_filename)
        chunk = CHUNK if want_lanes else _fit_chunk(
            self._ksize, self.hash_kind, _consume_chunk_size())

        fix = np.zeros(MAX_BIGCOUNT + 1, np.int64)
        if want_lanes:
            # rare path (a bigcount map loaded from disk overlays
            # capped reads): per-occurrence kernel that also returns
            # the per-lane arrays for host-side correction
            fn = _make_abund_dist_fn(
                st._read_spec(), ts._read_spec(), self._ksize,
                self.hash_kind, True, packed=True, from_codes=True)
            dist = jnp.zeros(MAX_BIGCOUNT + 1, jnp.uint64)
            t_table, t_uniq = ts.table, ts._n_unique

            def run(buf):
                nonlocal t_table, t_uniq, dist
                t_table, t_uniq, d, counts, first, ks = fn(
                    st.table, t_table, t_uniq, buf)
                counts = np.asarray(counts)
                first = np.asarray(first)
                over = self.storage._overlay_bigcounts(
                    counts, np.asarray(ks))
                for c0, c1 in zip(counts[first], over[first]):
                    if c0 != c1:
                        fix[c0] -= 1
                        fix[c1] += 1
                dist = dist + d
        else:
            # common path: deferred cycles dedup each ~32M-lane window
            # with one sort, then the expensive sketch gathers and the
            # tracking update touch one lane per DISTINCT hash
            counter = _make_abund_counter(
                ts, _chunk_lane_count(self._ksize, self.hash_kind,
                                      chunk),
                st._read_spec(), st.table)
            append = _make_append_fn(self._ksize, self.hash_kind, None,
                                     False, from_codes=True, packed=True)
            consumed = jnp.zeros((), U64)

            def run(buf, lanes=None):
                nonlocal consumed
                consumed = counter.append_chunk(append, consumed,
                                                (buf,), lanes=lanes)

        if native:
            from khmer_tpu.native import NativeChunkReader

            reader = NativeChunkReader(parser_or_filename, self._ksize,
                                       chunk)

            def produce():
                for data, weights in reader:
                    yield jax.device_put(_pack_chunk(data, weights))

            for buf in _producer_stream(produce):
                run(buf)
            reader.close()
        else:
            batcher = _FlatBatcher(self._ksize, chunk)
            from_ascii = self.hash_kind != "2bit"

            def push(data, weights):
                kwargs = {} if want_lanes else {
                    "lanes": _chunk_lane_count(
                        self._ksize, self.hash_kind, data.shape[0])}
                run(jax.device_put(
                    _pack_chunk(data, weights, from_ascii=from_ascii)),
                    **kwargs)

            for read in self._reads(parser_or_filename):
                seq = read.cleaned_seq if hasattr(read, "cleaned_seq") \
                    else str(read)
                codes = self._encode(seq)
                for data, weights in batcher.add(codes):
                    push(data, weights)
            tail = batcher.drain()
            if tail is not None:
                push(*tail)
        if want_lanes:
            ts.table, ts._n_unique = t_table, t_uniq
            ts._loaded_occupied = None
        else:
            counter.finish()
            dist = counter.dist
        out = np.asarray(dist).astype(np.int64) + fix
        return [int(x) for x in out]

    abundance_distribution_with_reads_parser = abundance_distribution

    def get_raw_tables(self):
        """Per-table byte buffers in the OXLI on-disk layout
        (graphs.pyx:508,966).  NOTE: these are snapshots of the device
        table, not live views — re-call after updates."""
        raw = self.storage.raw_bytes()
        out = []
        off = 0
        for nb in self.storage.spec.bytes_per_table:
            out.append(memoryview(raw[off: off + nb]))
            off += nb
        return out

    # -- save/load ----------------------------------------------------------------

    def save(self, file_name):
        from khmer_tpu.io import oxli_format

        oxli_format.save_storage(file_name, self._ksize, self.storage)

    @classmethod
    def load(cls, file_name):
        from khmer_tpu.io import oxli_format

        kind = cls.storage_class.kind
        store, ksize = oxli_format.load_storage(
            file_name, expected_kinds=(kind,))
        obj = cls.__new__(cls)
        obj._ksize = ksize
        obj.storage = store
        obj._post_load()
        return obj

    def _post_load(self):
        pass


class Counttable(Hashtable):
    """Count-Min sketch with murmur hashing (graphs.pyx:454; unbounded k)."""

    storage_class = ByteStorage
    hash_kind = "murmur"


class CyclicCounttable(Hashtable):
    """Counttable over the rolling (cyclic) hash (graphs.pyx:477-491).

    Hash values are bit-identical to the reference's
    CyclicHash<uint64>-based `_hash_cyclic` (kmer_hash.cc:237-278);
    every window is computed closed-form on device instead of rolling
    (see ops/rollinghash.py)."""

    storage_class = ByteStorage
    hash_kind = "cyclic"


class QFCounttable(Hashtable):
    """Counting-quotient-filter counttable (graphs.pyx:413-452).

    Counting semantics are EXACT per key over the CQF key space
    `khash % (nslots * 256)`, matching qf_count_key_value bit-for-bit
    (the CQF stores full quotient+remainder keys; see
    storage.QFStorage).  The slot-shifting insert of gqf.c is replaced
    by a sorted-dictionary merge; hashing still runs as the batched
    device murmur kernel.  On-disk: SAVED_QFCOUNT header framing with
    a sorted (key, count) payload instead of a raw qf block dump."""

    storage_class = QFStorage
    hash_kind = "murmur"

    def __init__(self, k, size, slot_size=None, on_disk=None):
        k = int(k)
        if k < 1 or k > 255:
            raise ValueError("k-mer size must be in [1, 255]")
        size = int(size)
        if size & (size - 1):
            # round up to the next power of two (reference rounds the
            # number of slots to 2^ceil(log2(size)))
            size = 1 << (size - 1).bit_length()
        self.slot_size = slot_size  # MQF remainder width (fork N5)
        self._ksize = k
        self.storage = QFStorage(size, slot_size, on_disk=on_disk)

    @staticmethod
    def _can_use_native(parser_or_filename):
        # the fused native->device consume kernel is bin-table-specific;
        # QF consumes via the generic hashed-chunk path below
        return False

    def _run_consume(self, reads_iter, mask=None, threshold=0,
                     num_bands=None, band=None, consume_masked=False):
        """QF consume: hash chunks on device, aggregate into the
        sorted dictionary (same exactness as the reference loop)."""
        from khmer_tpu.ops.hashing import compute_band_interval

        banded = num_bands is not None
        if banded:
            bmin, bmax = compute_band_interval(num_bands, band)

        batcher = _FlatBatcher(self._ksize)
        n_reads = 0
        n_consumed = 0
        st = self.storage

        def run(data, weights):
            nonlocal n_consumed
            hashes, w, _pos = _chunk_hashes_weights(
                jax.device_put(data),
                jax.device_put(weights.astype(np.uint32)),
                self._ksize, self.hash_kind, ROW_PAYLOAD)
            hashes = np.asarray(hashes)
            w = np.asarray(w)
            if banded:
                w = w * ((hashes >= bmin) & (hashes < bmax))
            if mask is not None:
                mc = np.asarray(mask.storage.get_batch(hashes))
                if consume_masked:
                    w = w * (mc >= threshold)
                else:
                    w = w * (mc <= threshold)
            n_consumed += int(w.sum())
            st.add_batch_fast(hashes, w)

        for read in reads_iter:
            seq = read.cleaned_seq if hasattr(read, "cleaned_seq") \
                else str(read)
            n_reads += 1
            codes = self._encode(seq)
            for data, weights in batcher.add(codes):
                run(data, weights)
        tail = batcher.drain()
        if tail is not None:
            run(*tail)
        return n_reads, n_consumed

    def _hash_count_rows(self, sequences):
        rows = self._hash_rows(sequences)
        if not rows:
            return []
        flat = np.concatenate(rows) if rows else np.zeros(0, np.uint64)
        counts = self.storage.get_batch(flat)
        out = []
        off = 0
        for r in rows:
            out.append((r, counts[off: off + r.shape[0]]))
            off += r.shape[0]
        return out

    def median_at_least_batch(self, sequences, cutoff):
        out = np.zeros(len(sequences), bool)
        for i, (_, counts) in enumerate(self._hash_count_rows(sequences)):
            n = counts.size
            if n:
                min_req = int(0.5 + n / 2.0)
                out[i] = (counts >= cutoff).sum() >= min_req
        return out

    def abundance_distribution(self, parser_or_filename, tracking=None):
        """Histogram of k-mer abundances with exact dedup (the QF's
        distinct keys make a tracking bloom unnecessary)."""
        dist = np.zeros(MAX_BIGCOUNT + 1, np.uint64)
        seen = set()
        batch = []

        def drain():
            if not batch:
                return
            for hashes, counts in self._hash_count_rows(batch):
                for h, c in zip(hashes, counts):
                    h = int(h)
                    if h not in seen:
                        seen.add(h)
                        dist[int(c)] += 1
            batch.clear()

        for read in self._reads(parser_or_filename):
            seq = read.cleaned_seq if hasattr(read, "cleaned_seq") \
                else str(read)
            if len(seq) >= self._ksize:
                batch.append(seq)
                if len(batch) >= 512:
                    drain()
        drain()
        return [int(x) for x in dist]

    abundance_distribution_with_reads_parser = abundance_distribution

    def get_raw_tables(self):
        # reference QFStorage::get_raw_tables returns nullptr
        raise ValueError(
            "get_raw_tables is not supported for QF tables")

    def _post_load(self):
        self.slot_size = None


class OnDiskQFCounttable(QFCounttable):
    """Disk-backed quotient-filter counttable: the fork's onDiskMQF
    (reference third-party/MQF/onDiskMQF.h over stxxl vectors; C++-only
    in the reference — never exposed to its python layer).  Here the
    sorted (key, count) arrays spill to memmap files in `directory`,
    so the filter can exceed RAM; queries page lazily through the OS
    cache, and saves/loads use the same raw MQF dump format as
    QFCounttable."""

    def __init__(self, k, size, slot_size=None, directory=None):
        if directory is None:
            raise ValueError("OnDiskQFCounttable requires a directory")
        super().__init__(k, size, slot_size, on_disk=directory)


class BufferedQFCounttable(QFCounttable):
    """The fork's buffered MQF (reference third-party/MQF/bufferedMQF.h:
    35-45; python class lost in the reference graft, API reconstructed
    from its use at scripts/normalize-by-median.py:155-172,421-422).

    `addToBufferQuery` collects read sequences; `queryBuffer` resolves
    every buffered k-mer's count in ONE device batch; subsequent
    per-read queries are served from the host cache until
    `clearQueryBuffer`.  On TPU this is the native access pattern — the
    class exists so fork-era scripts using --bmqf run unchanged."""

    def __init__(self, k, size, slot_size=None):
        super().__init__(k, size, slot_size)
        self._query_buffer = []
        self._query_cache = {}

    def addToBufferQuery(self, sequence):
        self._query_buffer.append(sequence)

    def queryBuffer(self):
        seqs = [s for s in self._query_buffer if len(s) >= self._ksize]
        if not seqs:
            return
        hashes = [self._hash_array(s) for s in seqs]
        flat = np.concatenate(hashes)
        counts = self.storage.get_batch(flat)
        self._query_cache.update(
            (int(h), int(c)) for h, c in zip(flat, counts))

    def clearQueryBuffer(self):
        self._query_buffer = []
        self._query_cache = {}

    def get_kmer_counts(self, sequence):
        cache = self._query_cache
        if cache:
            hashes = self._hash_array(sequence)
            if all(int(h) in cache for h in hashes):
                return [cache[int(h)] for h in hashes]
        return super().get_kmer_counts(sequence)

    def get_median_count(self, sequence):
        counts = np.asarray(self.get_kmer_counts(sequence), np.float64)
        if counts.size == 0:
            raise ValueError("no k-mer counts for this string; too short?")
        avg = float(counts.mean())
        stddev = float(math.sqrt(((counts - avg) ** 2).mean()))
        med = int(np.sort(counts)[counts.size // 2])
        return med, avg, stddev

    def median_at_least(self, sequence, cutoff):
        counts = np.asarray(self.get_kmer_counts(sequence))
        n = counts.size
        min_req = int(0.5 + n / 2.0)
        return bool((counts >= cutoff).sum() >= min_req)


class SmallCounttable(Hashtable):
    """4-bit Count-Min sketch with murmur hashing."""

    storage_class = NibbleStorage
    hash_kind = "murmur"


class Nodetable(Hashtable):
    """Bloom filter with murmur hashing."""

    storage_class = BitStorage
    hash_kind = "murmur"
