"""Sharded sketch update/query over a jax.sharding.Mesh.

Design (TPU-first, no reference analogue — the reference is single-host):

  mesh axes ("data", "shard").  The sketch state is a uint8 array of
  shape [D, S, total_bytes + 1] sharded PartitionSpec("data", "shard",
  None): every device holds one full-geometry partial table.

  * shard s owns hash band [s*W, (s+1)*W) with W = U64_MAX // S
    (reference banding arithmetic, src/oxli/kmer_hash.cc:290-304; the
    top sliver that reference banding *drops* is assigned to the last
    shard so no k-mer is lost).
  * one step: each device hashes its local read chunk, routes every
    (hash, weight) lane to the band owner with an all_to_all along
    "shard" (fixed per-destination capacity, see below), and scatter-adds
    the received lanes into its own partial table.
  * the serial table equals the saturating sum of all partial tables:
    for each bin, serial = min(cap, total increments), and
    min(cap, sum_d min(cap, x_d)) == min(cap, sum_d x_d) because any
    saturated partial already forces the sum past cap.
  * a count query psums per-table bin values across the mesh *before*
    the min-over-tables reduction, which reproduces the serial
    Count-Min read (min over tables of total bin count) exactly.

Routing capacity: all_to_all needs equal splits, so each device sends a
fixed [S, cap] buffer.  Hashes are uniform, so the per-destination load
is W/S with binomial fluctuation; cap = ceil(W/S) * cap_factor overflows
with negligible probability for the chunk sizes used (overflowing lanes
are dropped and counted in the returned `n_dropped` so callers can
detect and re-run a pathological batch).
"""

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from khmer_tpu.ops.sketch_ops import GET_FNS, UPDATE_FNS, SketchSpec

U8 = jnp.uint8
U32 = jnp.uint32
U64 = jnp.uint64
I32 = jnp.int32
I64 = jnp.int64


def make_mesh(devices=None, data=None, shard=None):
    """Build a ("data", "shard") mesh over the available devices.

    By default all devices go on the "shard" axis (maximum table
    capacity); pass data/shard sizes to split.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None and shard is None:
        data, shard = 1, n
    elif data is None:
        data = n // shard
    elif shard is None:
        shard = n // data
    if data * shard != n:
        raise ValueError(
            "mesh {}x{} does not cover {} devices".format(data, shard, n))
    arr = np.asarray(devices).reshape(data, shard)
    return Mesh(arr, ("data", "shard"))


def band_owner(hashes, n_shards):
    """Owner shard of each hash.

    The band arithmetic follows reference banding (kmer_hash.cc:290-304,
    top sliver folded into the last shard), but over a *mixed* image of
    the hash: the exact 2-bit hash is the raw k-mer value (< 4^k), so
    banding its high bits directly would route every k-mer to shard 0.
    fmix64 (murmur's finalizer) is a bijection, so the bands still
    partition the hash space exactly."""
    if n_shards == 1:
        return jnp.zeros(hashes.shape, I32)
    from khmer_tpu.ops.hashing import _fmix64_v

    mixed = _fmix64_v(hashes.astype(U64))
    band = U64(((1 << 64) - 1) // n_shards)
    return jnp.minimum((mixed // band).astype(I32), n_shards - 1)


def _route_lanes(hashes, weights, n_shards, cap):
    """Pack (hash, weight) lanes into fixed [S, cap] per-destination
    buffers; returns (send_h, send_w, n_dropped)."""
    n = hashes.shape[0]
    owner = jnp.where(weights > 0, band_owner(hashes, n_shards), n_shards)
    order = jnp.argsort(owner)
    h_s = hashes[order]
    w_s = weights[order]
    o_s = owner[order]
    counts = jnp.bincount(o_s, length=n_shards + 1)
    starts = jnp.cumsum(counts) - counts
    pos = jnp.arange(n, dtype=I32) - starts[o_s].astype(I32)
    ok = (o_s < n_shards) & (pos < cap)
    slot = jnp.where(ok, o_s * cap + pos, n_shards * cap)
    send_h = jnp.zeros(n_shards * cap + 1, U64).at[slot].set(h_s)
    send_w = jnp.zeros(n_shards * cap + 1, U32).at[slot].set(
        jnp.where(ok, w_s, 0))
    n_dropped = jnp.sum(((o_s < n_shards) & ~ok).astype(U32))
    return (send_h[:-1].reshape(n_shards, cap),
            send_w[:-1].reshape(n_shards, cap), n_dropped)


def make_sharded_consume_step(spec: SketchSpec, k: int, hash_kind: str,
                              mesh: Mesh, chunk: int, cap_factor: float = 2.0):
    """Build the jitted multi-device consume step.

    Returns (step, state_shardings) where

      step(tables, occ, uniq, data, weights)
        -> (tables, occ, uniq, n_dropped)

      tables: uint8 [D, S, total_bytes + 1]   P("data", "shard", None)
      occ/uniq: uint64 [D, S]                 P("data", "shard")
      data: uint8 [D, S, chunk]               P("data", "shard", None)
        — 2-bit codes ("2bit") or ASCII bytes ("murmur"); each device's
        row is an independent flat chunk of concatenated reads.
      weights: uint32 [D, S, chunk]           window validity/multiplicity.
    """
    from khmer_tpu.hashtable import ROW_PAYLOAD, _chunk_hashes_weights

    D = mesh.shape["data"]
    S = mesh.shape["shard"]
    payload = min(ROW_PAYLOAD, chunk)
    if chunk % payload:
        raise ValueError("chunk must be a multiple of the row payload")
    cap = int(np.ceil(chunk / S) * cap_factor) if S > 1 else chunk
    update = UPDATE_FNS[spec.kind]

    def local_step(table, occ, uniq, data, weights):
        # local blocks: table [1, 1, bins+1], data [1, 1, chunk]
        tbl = table[0, 0]
        hashes, w = _chunk_hashes_weights(
            data[0, 0], weights[0, 0].astype(U32), k, hash_kind, payload)
        if S > 1:
            send_h, send_w, n_drop = _route_lanes(hashes, w, S, cap)
            recv_h = lax.all_to_all(send_h, "shard", 0, 0)
            recv_w = lax.all_to_all(send_w, "shard", 0, 0)
            h, wts = recv_h.reshape(-1), recv_w.reshape(-1)
        else:
            h, wts, n_drop = hashes, w, jnp.zeros((), U32)
        tbl, o, u, _ = update(spec, tbl, occ[0, 0], uniq[0, 0], h, wts)
        return (tbl[None, None], o[None, None], u[None, None],
                n_drop[None, None])

    specs = dict(
        tables=P("data", "shard", None),
        scal=P("data", "shard"),
        data=P("data", "shard", None),
    )
    step = jax.jit(
        jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(specs["tables"], specs["scal"], specs["scal"],
                      specs["data"], specs["data"]),
            out_specs=(specs["tables"], specs["scal"], specs["scal"],
                       specs["scal"]),
        ),
        donate_argnums=(0,),
    )

    shardings = {
        "tables": NamedSharding(mesh, specs["tables"]),
        "scal": NamedSharding(mesh, specs["scal"]),
        "data": NamedSharding(mesh, specs["data"]),
    }
    return step, shardings


def make_sharded_query(spec: SketchSpec, mesh: Mesh):
    """Build the jitted multi-device count query.

    query(tables, hashes[N]) -> uint16 counts[N] with exact serial CMS
    semantics: per-table uint32 bin totals are psum'd across every
    device before the saturating cap and the min-over-tables reduction.
    """
    offs = np.array(spec.bin_offsets, dtype=np.int64)
    sizes = np.array(spec.tablesizes, dtype=np.uint64)
    cap = spec.read_cap

    def local_query(tables, hashes):
        tbl = tables[0, 0]
        bins = hashes[None, :] % jnp.asarray(sizes)[:, None]
        vals = tbl[bins.astype(I64) + jnp.asarray(offs)[:, None]]
        tot = lax.psum(lax.psum(vals, "shard"), "data")
        return jnp.min(jnp.minimum(tot, cap), axis=0).astype(jnp.uint16)

    return jax.jit(
        jax.shard_map(
            local_query, mesh=mesh,
            in_specs=(P("data", "shard", None), P()),
            out_specs=P(),
        )
    )


def merge_tables_saturating(tables, spec: SketchSpec):
    """Sum of the [D, S, bins+1] uint32 partial tables -> serial-equal
    flat working table (saturation is applied at read time, so the
    plain sum IS the serial table; see module docstring)."""
    return jnp.sum(tables.astype(jnp.uint64),
                   axis=tuple(range(tables.ndim - 1))).astype(U32)


class ShardedCountConsumer:
    """Host-side driver: streams read chunks into a mesh-sharded sketch.

    One instance per host process; on multi-host pods each host feeds its
    own file shard (jax.distributed handles the cross-host collectives).
    """

    def __init__(self, spec, k, hash_kind, mesh=None, chunk=1 << 20,
                 cap_factor=2.0):
        self.spec = spec
        self.k = k
        self.hash_kind = hash_kind
        self.mesh = mesh if mesh is not None else make_mesh()
        self.chunk = chunk
        self.D = self.mesh.shape["data"]
        self.S = self.mesh.shape["shard"]
        self.step, self.shardings = make_sharded_consume_step(
            spec, k, hash_kind, self.mesh, chunk, cap_factor)
        self.query = make_sharded_query(spec, self.mesh)
        nbins = spec.total_bins + 1
        self.tables = jax.device_put(
            jnp.zeros((self.D, self.S, nbins), U32),
            self.shardings["tables"])
        self.occ = jax.device_put(
            jnp.zeros((self.D, self.S), U64), self.shardings["scal"])
        self.uniq = jax.device_put(
            jnp.zeros((self.D, self.S), U64), self.shardings["scal"])
        self.dropped = jax.device_put(
            jnp.zeros((self.D, self.S), U32), self.shardings["scal"])
        # replicated-output reducers: REQUIRED on multi-process meshes,
        # where eager reads of partially-addressable arrays fail
        rep = NamedSharding(self.mesh, P())
        self._sum_scal = jax.jit(
            lambda x: jnp.sum(x.astype(U64)), out_shardings=rep)
        self._merge = jax.jit(
            lambda t: merge_tables_saturating(t, spec), out_shardings=rep)

    def consume_chunks(self, data, weights):
        """data/weights: [D, S, chunk] host arrays (one chunk/device),
        identical on every process of a multi-host run."""
        data = jax.device_put(np.asarray(data, np.uint8),
                              self.shardings["data"])
        weights = jax.device_put(np.asarray(weights, np.uint32),
                                 self.shardings["data"])
        self.consume_chunks_arrays(data, weights)

    def consume_chunks_arrays(self, data, weights):
        """Same as consume_chunks for already-sharded global jax
        arrays (multi-host callers build them with
        jax.make_array_from_process_local_data)."""
        self.tables, self.occ, self.uniq, dropped = self.step(
            self.tables, self.occ, self.uniq, data, weights)
        self.dropped = self.dropped + dropped

    @property
    def n_dropped(self):
        return int(np.asarray(self._sum_scal(self.dropped)))

    def get_counts(self, hashes):
        return np.asarray(
            self.query(self.tables, jnp.asarray(hashes, U64)))

    def merged_table(self):
        return np.asarray(self._merge(self.tables))

    def n_unique_kmers(self):
        # per-shard uniq sums are exact per band (bands partition the
        # hash space); cross-band FP suppression makes this >= the
        # serial estimate, never less accurate.
        return int(np.asarray(self._sum_scal(self.uniq)))


# ---------------------------------------------------------------------------
# Round 2: deferred sharded consume (zero-comms streaming, routed flush)
# ---------------------------------------------------------------------------
#
# The round-1 consumer above routes EVERY hashed occurrence through an
# all_to_all with a fixed per-destination cap, which (a) pays the
# random-scatter price per occurrence and (b) can overflow the cap on
# skewed data (poly-A tails all own-hash to one shard).  The deferred
# design fixes both: each device streams hashes into a LOCAL lane
# buffer (khmer_tpu/ops/deferred.py) with no communication at all;
# duplicate hashes are combined locally by sort-merge; only DISTINCT
# (hash, total) lanes are routed to their band owner at flush time.
# Skew from repeated k-mers collapses before routing (a poly-A chunk
# becomes ONE lane), and any residual overflow lanes stay local and
# are re-routed by the host drain loop until none remain — drops are
# structurally impossible.


def _route_with_leftover(hashes, weights, n_shards, cap):
    """Pack (hash, weight) lanes into fixed [S, cap] per-destination
    buffers; lanes that do not fit stay local.

    Returns (send_h, send_w, left_h, left_w, n_left); leftover lanes
    are SENTINEL-masked in place (order irrelevant — the next drain
    round re-sorts)."""
    from khmer_tpu.ops.deferred import SENTINEL

    n = hashes.shape[0]
    owner = jnp.where(weights > 0, band_owner(hashes, n_shards),
                      n_shards).astype(jnp.uint32)
    o_s, h_s, w_s = lax.sort((owner, hashes, weights), num_keys=1)
    counts = jnp.bincount(o_s.astype(I32), length=n_shards + 1)
    starts = jnp.cumsum(counts) - counts
    pos = jnp.arange(n, dtype=I32) - starts[o_s.astype(I32)].astype(I32)
    real = o_s < n_shards
    ok = real & (pos < cap)
    slot = jnp.where(ok, o_s.astype(I32) * cap + pos, n_shards * cap)
    send_h = jnp.full(n_shards * cap + 1, SENTINEL, U64).at[slot].set(h_s)
    send_w = jnp.zeros(n_shards * cap + 1, U32).at[slot].set(
        jnp.where(ok, w_s, 0))
    left = real & ~ok
    left_h = jnp.where(left, h_s, SENTINEL)
    left_w = jnp.where(left, w_s, 0)
    n_left = jnp.sum(left.astype(I32))
    return (send_h[:-1].reshape(n_shards, cap),
            send_w[:-1].reshape(n_shards, cap), left_h, left_w, n_left)


@lru_cache(maxsize=None)
def make_routed_update_step(spec: SketchSpec, mesh: Mesh,
                            cap_dest: int, with_base: bool = False):
    """Jitted step: dedup local lanes, route distinct lanes to their
    band owners (one all_to_all), owner-side dedup, then the T-table
    scatter with batch-window n_unique accounting.  Cached per
    (spec, mesh, cap) so repeated consumes reuse the compile; lane
    windows of different (power-of-two) sizes retrace inside the jit.

    step(tables, uniq, keys, wgts[, base])
      -> (tables, uniq, keys', wgts', n_left[, cand, n_cross])

    tables [D,S,bins+1] P(d,s,None); uniq/n_left [D,S] P(d,s);
    keys/wgts [D,S,F] P(d,s,None); base [bins+1] replicated
    (the pre-consume serial table — premin reads base+partial so
    n_unique matches the single-device deferred path exactly when the
    consume started from `base`).  Overflow lanes come back compacted
    in keys'/wgts'; callers loop until sum(n_left) == 0.
    """
    from khmer_tpu.ops.deferred import SENTINEL, combine_lanes
    from khmer_tpu.ops.sketch_ops import _bin_idx

    S = mesh.shape["shard"]
    track_bigcount = spec.use_bigcount and spec.kind == "byte"

    def local(tables, uniq, keys, wgts, *maybe_base):
        tbl = tables[0, 0]
        u = uniq[0, 0]
        k2, w2, _ = combine_lanes(keys[0, 0], wgts[0, 0])
        if S > 1:
            send_h, send_w, left_h, left_w, n_left = _route_with_leftover(
                k2, w2, S, cap_dest)
            recv_h = lax.all_to_all(send_h, "shard", 0, 0)
            recv_w = lax.all_to_all(send_w, "shard", 0, 0)
            rk, rw, _ = combine_lanes(recv_h.reshape(-1),
                                      recv_w.reshape(-1))
        else:
            rk, rw = k2, w2
            left_h = jnp.full(k2.shape, SENTINEL, U64)
            left_w = jnp.zeros(w2.shape, U32)
            n_left = jnp.zeros((), I32)
        wv = jnp.where(rk != SENTINEL, rw, U32(0))
        idx = _bin_idx(spec, rk)
        dummy = jnp.int64(spec.total_bins)
        idx = jnp.where(wv[None, :] > 0, idx, dummy)
        pre = tbl[idx]
        if with_base:
            pre = pre + maybe_base[0][idx]
        premin = jnp.min(pre, axis=0)
        u = u + jnp.sum(((premin == 0) & (wv > 0)).astype(U64))
        tbl = tbl.at[idx.reshape(-1)].add(jnp.tile(wv, spec.n_tables))
        outs = [tbl[None, None], u[None, None], left_h[None, None],
                left_w[None, None], n_left[None, None]]
        if track_bigcount:
            cross = (pre[0] + wv > 255) & (wv > 0)
            cand = lax.sort(jnp.where(cross, rk, SENTINEL))
            n_cross = jnp.sum(cross.astype(U32))
            outs += [cand[None, None], n_cross[None, None]]
        return tuple(outs)

    tbl_s = P("data", "shard", None)
    scal_s = P("data", "shard")
    lane_s = P("data", "shard", None)
    in_specs = [tbl_s, scal_s, lane_s, lane_s]
    if with_base:
        in_specs.append(P(None))
    out_specs = [tbl_s, scal_s, lane_s, lane_s, scal_s]
    if track_bigcount:
        out_specs += [lane_s, scal_s]
    return jax.jit(
        jax.shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                      out_specs=tuple(out_specs)),
        donate_argnums=(0, 2, 3),
    )


@lru_cache(maxsize=None)
def make_sharded_append_step(k: int, hash_kind: str, mesh: Mesh,
                             chunk: int, cap: int, from_codes: bool = False):
    """Jitted zero-communication append: each device hashes its own
    chunk and appends the lanes to its local deferred buffer.

    step(keys, wgts, fill, consumed, data, weights)
      -> (keys, wgts, consumed)

    keys/wgts [D,S,cap] P(d,s,None); data/weights [D,S,chunk]
    P(d,s,None); fill scalar (replicated); consumed [D,S] P(d,s)."""
    from khmer_tpu.hashtable import (ROW_PAYLOAD, _chunk_hashes_weights,
                                     _decode_codes)
    from khmer_tpu.ops.deferred import SENTINEL

    payload = min(ROW_PAYLOAD, chunk)

    def local(keys, wgts, fill, consumed, data, weights):
        d = data[0, 0]
        if from_codes and hash_kind != "2bit":
            d = _decode_codes(d)
        hashes, w = _chunk_hashes_weights(
            d, weights[0, 0].astype(U32), k, hash_kind, payload)
        c = consumed[0, 0] + jnp.sum(w.astype(U64))
        key = jnp.where(w > 0, hashes, SENTINEL)
        kb = lax.dynamic_update_slice(keys[0, 0], key, (fill,))
        wb = lax.dynamic_update_slice(wgts[0, 0], w, (fill,))
        return kb[None, None], wb[None, None], c[None, None]

    lane_s = P("data", "shard", None)
    scal_s = P("data", "shard")
    return jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(lane_s, lane_s, P(), scal_s, lane_s, lane_s),
            out_specs=(lane_s, lane_s, scal_s)),
        donate_argnums=(0, 1),
    )


@lru_cache(maxsize=None)
def make_sharded_merge_step(mesh: Mesh):
    """Jitted per-device lane compaction (no communication): each
    device combines duplicate hashes in its buffer prefix.

    step(keys[D,S,bucket], wgts) -> (keys, wgts, n_valid[D,S])."""
    from khmer_tpu.ops.deferred import combine_lanes

    def local(keys, wgts):
        k2, w2, nv = combine_lanes(keys[0, 0], wgts[0, 0])
        return k2[None, None], w2[None, None], nv[None, None]

    lane_s = P("data", "shard", None)
    scal_s = P("data", "shard")
    return jax.jit(
        jax.shard_map(local, mesh=mesh, in_specs=(lane_s, lane_s),
                      out_specs=(lane_s, lane_s, scal_s)),
        donate_argnums=(0, 1),
    )


@lru_cache(maxsize=None)
def make_partials_reduce(mesh: Mesh):
    """Jitted sum of the per-device partial tables into one flat
    serial-equal table (saturation applies at read, so the plain sum
    IS the serial table; see module docstring)."""

    def fn(tables):
        return jnp.sum(tables, axis=(0, 1))

    return jax.jit(fn, out_shardings=NamedSharding(mesh, P()))


class ShardedDeferredConsumer:
    """Transient multi-device deferred counter for ONE bulk consume.

    Lifecycle: created with empty per-device partial tables; chunks
    stream in S at a time with zero communication; local merges combine
    duplicates; `finish(base)` routes distinct lanes to band owners,
    accounts n_unique/bigcount against `base` (the storage's
    pre-consume table), and returns (delta_table, n_unique_delta,
    n_consumed, bigcount_candidates) for the host Storage to adopt.

    Parity: counts serial-exact (sum of partials; saturation at read);
    n_unique exact vs the single-device deferred path (premin reads
    base + own partial; bands partition the hash space so each hash's
    total lives in exactly one partial).
    """

    def __init__(self, spec, k, hash_kind, mesh=None, chunk=1 << 20,
                 cap=None, from_codes=False):
        from khmer_tpu.ops import deferred as dfr

        self.spec = spec
        self.mesh = mesh if mesh is not None else make_mesh()
        self.D = self.mesh.shape["data"]
        self.S = self.mesh.shape["shard"]
        if self.D != 1:
            raise ValueError("deferred consumer uses a [1, S] mesh")
        self.chunk = chunk
        self.k = k
        self.hash_kind = hash_kind
        from khmer_tpu.hashtable import _chunk_lane_count

        self.chunk_lanes = _chunk_lane_count(k, hash_kind, chunk,
                                             min(1 << 14, chunk))
        if cap is None:
            cap = max(4 * self.chunk_lanes,
                      min(2 * dfr.MIN_MERGE, dfr.default_max_cap()))
        # power-of-two per-shard cap: any power-of-two flush window
        # tiles it exactly, so merge/flush buckets can track `fill`
        self.cap = dfr._next_pow2(max(int(cap), 2 * self.chunk_lanes))
        self.max_flush = min(dfr.FLUSH_SLICE, self.cap)
        self._append = make_sharded_append_step(
            k, hash_kind, self.mesh, chunk, self.cap, from_codes)
        self._merge_step = make_sharded_merge_step(self.mesh)
        self._reduce = make_partials_reduce(self.mesh)
        lane_sh = NamedSharding(self.mesh, P("data", "shard", None))
        scal_sh = NamedSharding(self.mesh, P("data", "shard"))
        self.lane_sh, self.scal_sh = lane_sh, scal_sh
        self.keys = jax.device_put(
            jnp.full((1, self.S, self.cap), dfr.SENTINEL, U64), lane_sh)
        self.wgts = jax.device_put(
            jnp.zeros((1, self.S, self.cap), U32), lane_sh)
        self.tables = jax.device_put(
            jnp.zeros((1, self.S, spec.total_bins + 1), U32), lane_sh)
        self.uniq = jax.device_put(jnp.zeros((1, self.S), U64), scal_sh)
        self.consumed = jax.device_put(
            jnp.zeros((1, self.S), U64), scal_sh)
        self.fill = 0
        self._merge_at = min(dfr.MIN_MERGE, self.cap)
        self.bigcount_candidates = set()
        self._track_bigcount = (spec.use_bigcount and spec.kind == "byte")
        self._pending = []

    # -- streaming ---------------------------------------------------------

    def add_chunk(self, data, weights):
        """Queue one host chunk (<= [chunk] uint8 codes/bytes +
        weights; short tail chunks are zero-padded); dispatches when S
        chunks are pending."""
        if data.shape[0] < self.chunk:
            pad = self.chunk - data.shape[0]
            data = np.concatenate([data, np.zeros(pad, np.uint8)])
            weights = np.concatenate(
                [weights, np.zeros(pad, weights.dtype)])
        self._pending.append((data, weights))
        if len(self._pending) == self.S:
            self._dispatch()

    def _dispatch(self):
        if not self._pending:
            return
        while len(self._pending) < self.S:
            self._pending.append(
                (np.zeros(self.chunk, np.uint8),
                 np.zeros(self.chunk, np.uint8)))
        data = np.stack([d for d, _ in self._pending])[None]
        mask = np.stack([m for _, m in self._pending])[None]
        self._pending.clear()
        if self.fill + self.chunk_lanes > min(self._merge_at, self.cap):
            self._merge()
        data = jax.device_put(np.asarray(data, np.uint8), self.lane_sh)
        mask = jax.device_put(np.asarray(mask, np.uint8), self.lane_sh)
        self.keys, self.wgts, self.consumed = self._append(
            self.keys, self.wgts, jnp.int32(self.fill), self.consumed,
            data, mask)
        self.fill += self.chunk_lanes

    def _merge(self):
        from khmer_tpu.ops import deferred as dfr

        if self.fill == 0:
            return
        bucket = min(max(dfr._next_pow2(self.fill), dfr.MIN_BUCKET),
                     self.cap)
        step = self._merge_step
        if bucket >= self.cap:
            self.keys, self.wgts, nv = step(self.keys, self.wgts)
        else:
            mk, mw, nv = step(self.keys[:, :, :bucket],
                              self.wgts[:, :, :bucket])
            self.keys = lax.dynamic_update_slice(
                self.keys, mk, (0, 0, 0))
            self.wgts = lax.dynamic_update_slice(
                self.wgts, mw, (0, 0, 0))
        self.fill = int(np.max(np.asarray(nv)))
        self._merge_at = min(max(dfr.MIN_MERGE, 2 * self.fill), self.cap)

    # -- flush -------------------------------------------------------------

    def finish(self, base_table):
        """Drain everything: local merge, routed flush of every lane
        window, then reduce partials.  Returns (delta_table [bins+1],
        n_unique_delta, n_consumed, bigcount_candidates)."""
        from khmer_tpu.ops import deferred as dfr

        self._dispatch()
        self._merge()
        base = jax.device_put(base_table,
                              NamedSharding(self.mesh, P()))
        # bucketed window + matching all_to_all per-destination cap:
        # tiny consumes route tiny buffers, bulk ones tile max_flush
        F = min(max(dfr._next_pow2(self.fill), dfr.MIN_BUCKET),
                self.max_flush)
        cap_dest = max(64, 2 * (-(-F // self.S)))
        update_step = make_routed_update_step(
            self.spec, self.mesh, cap_dest, with_base=True)
        for off in range(0, max(self.fill, 1), F):
            keys = self.keys[:, :, off: off + F]
            wgts = self.wgts[:, :, off: off + F]
            while True:
                out = update_step(self.tables, self.uniq, keys,
                                  wgts, base)
                self.tables, self.uniq, keys, wgts, n_left = out[:5]
                if self._track_bigcount:
                    cand, n_cross = out[5], out[6]
                    nc = np.asarray(n_cross).reshape(-1)
                    ch = np.asarray(cand).reshape(self.S, -1)
                    for s in range(self.S):
                        if nc[s]:
                            self.bigcount_candidates.update(
                                int(x) for x in ch[s, : nc[s]])
                if int(np.sum(np.asarray(n_left))) == 0:
                    break
        delta = self._reduce(self.tables)
        n_unique = int(np.sum(np.asarray(self.uniq)))
        n_consumed = int(np.sum(np.asarray(self.consumed)))
        return delta, n_unique, n_consumed, self.bigcount_candidates
