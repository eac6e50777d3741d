"""Sharded sketch update/query over a jax.sharding.Mesh.

Design (TPU-first, no reference analogue — the reference is single-host):

  mesh axes ("data", "shard").  The sketch state is a uint32 array of
  shape [D, S, total_bins + 1] sharded PartitionSpec("data", "shard",
  None): every device holds one full-geometry partial table.

  * shard s owns hash band [s*W, (s+1)*W) with W = U64_MAX // S
    (reference banding arithmetic, src/oxli/kmer_hash.cc:290-304; the
    top sliver that reference banding *drops* is assigned to the last
    shard so no k-mer is lost).
  * STREAMING IS ZERO-COMMUNICATION: each device hashes its own
    bit-packed chunk stream into a local lane buffer
    (khmer_tpu/ops/deferred.py design); duplicate hashes are combined
    locally by sort-merge, survivors retained in the buffer.
  * at finish() the locally-distinct (hash, total) lanes are routed to
    their band owners (one all_to_all per window; overflow lanes stay
    local and are re-routed by the host drain loop until none remain —
    drops are structurally impossible).  Owners COLLECT received lanes
    in a ledger bag, combine them once (cross-source/round duplicates
    add exactly), and scatter their partial table ONCE per
    globally-distinct hash.
  * the serial table equals the saturating sum of all partial tables:
    for each bin, serial = min(cap, total increments), and
    min(cap, sum_d min(cap, x_d)) == min(cap, sum_d x_d) because any
    saturated partial already forces the sum past cap.
  * n_unique is BIT-EQUAL to the single-device deferred path and
    EXACT reference parity (ops/deferred.py docstring): every lane
    carries its position in the consume's global k-mer stream (chunks
    are numbered in file order across the mesh); a hash is new iff for
    some table the pre-consume bin (`base`) is zero AND the hash is
    the bin's first claimant.  Claims cross shard boundaries — a
    serial bin collects keys from many band owners — so each flush
    builds per-table dense claim arrays (scatter-min of first
    positions) and all-reduce-mins them over the mesh.  Each hash
    lives on exactly one owner, so the per-shard news partition the
    global set.
  * a count query psums per-table bin values across the mesh *before*
    the min-over-tables reduction, which reproduces the serial
    Count-Min read (min over tables of total bin count) exactly.
"""

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from khmer_tpu.ops.deferred import stage
from khmer_tpu.ops.sketch_ops import SketchSpec, _bin_idx

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


# ---------------------------------------------------------------------------
# Deferred sharded consume: zero-comms streaming, routed collect, one flush
# ---------------------------------------------------------------------------


def _route_with_leftover(hashes, weights, firsts, n_shards, cap):
    """Pack (hash, weight, first-position) lanes into fixed [S, cap]
    per-destination buffers; lanes that do not fit stay local.

    Returns (send_h, send_w, send_f, left_h, left_w, left_f, n_left);
    leftover lanes are SENTINEL-masked in place (order irrelevant —
    the next drain round re-sorts)."""
    from khmer_tpu.ops.deferred import IDX_SENTINEL, SENTINEL

    n = hashes.shape[0]
    owner = jnp.where(weights > 0, band_owner(hashes, n_shards),
                      n_shards).astype(jnp.uint32)
    o_s, h_s, w_s, f_s = lax.sort((owner, hashes, weights, firsts),
                                  num_keys=1)
    counts = jnp.bincount(o_s.astype(I32), length=n_shards + 1)
    starts = jnp.cumsum(counts) - counts
    pos = jnp.arange(n, dtype=I32) - starts[o_s.astype(I32)].astype(I32)
    real = o_s < n_shards
    ok = real & (pos < cap)
    slot = jnp.where(ok, o_s.astype(I32) * cap + pos, n_shards * cap)
    send_h = jnp.full(n_shards * cap + 1, SENTINEL, U64).at[slot].set(h_s)
    send_w = jnp.zeros(n_shards * cap + 1, U32).at[slot].set(
        jnp.where(ok, w_s, 0))
    send_f = jnp.full(n_shards * cap + 1, IDX_SENTINEL, U32).at[slot].set(
        jnp.where(ok, f_s, IDX_SENTINEL))
    left = real & ~ok
    left_h = jnp.where(left, h_s, SENTINEL)
    left_w = jnp.where(left, w_s, 0)
    left_f = jnp.where(left, f_s, IDX_SENTINEL)
    n_left = jnp.sum(left.astype(I32))
    return (send_h[:-1].reshape(n_shards, cap),
            send_w[:-1].reshape(n_shards, cap),
            send_f[:-1].reshape(n_shards, cap), left_h, left_w, left_f,
            n_left)


_AXES = ("data", "shard")  # banding flattens both mesh axes: D*S bands

# comm/compute accounting of the most recent finish() on this process
# (read by benchmarks/bench_scaling.py for the decomposition table)
LAST_CONSUME_STATS = {}


@lru_cache(maxsize=None)
def make_sharded_append_step(k: int, hash_kind: str, mesh: Mesh,
                             chunk: int, cap: int):
    """Jitted zero-communication append: each device unpacks and
    hashes its own BIT-PACKED chunk (2-bit codes + validity mask,
    hashtable._pack_chunk — 13x less wire than raw bytes + u32 mask)
    and appends the unit-weight lanes to its local key buffer.

    step(keys, idx, fill, batch, consumed, packed)
      -> (keys, idx, consumed)

    keys/idx [D,S,cap] P(d,s,None); packed [D,S,3*chunk/8] P(d,s,None);
    fill/batch scalars (replicated); consumed [D,S] P(d,s).  Each lane
    records its GLOBAL stream position: chunk (batch*D*S + flat mesh
    rank) times the static lane span, plus the in-chunk window start —
    file order across the whole mesh, as the exact n_unique claim rule
    requires (ops/deferred.py docstring)."""
    from khmer_tpu.hashtable import (ROW_PAYLOAD, _chunk_hashes_weights,
                                     _decode_codes, _unpack_chunk)
    from khmer_tpu.ops.deferred import SENTINEL

    payload = min(ROW_PAYLOAD, chunk)
    NS = mesh.shape["data"] * mesh.shape["shard"]
    S = mesh.shape["shard"]

    def local(keys, idx, fill, batch, consumed, packed):
        d, m = _unpack_chunk(packed[0, 0])
        # the wire format is always 2-bit codes (the packer translates
        # ASCII); byte-stream hashes need the ASCII restored
        if hash_kind != "2bit":
            d = _decode_codes(d)
        hashes, w, pos = _chunk_hashes_weights(
            d, m.astype(U32), k, hash_kind, payload)
        rank = (lax.axis_index("data") * S +
                lax.axis_index("shard")).astype(U32)
        span = U32(pos.shape[0])
        base = (batch.astype(U32) * U32(NS) + rank) * span
        c = consumed[0, 0] + jnp.sum(w.astype(U64))
        key = jnp.where(w > 0, hashes, SENTINEL)
        kb = lax.dynamic_update_slice(keys[0, 0], key, (fill,))
        ib = lax.dynamic_update_slice(idx[0, 0], base + pos, (fill,))
        return kb[None, None], ib[None, None], c[None, None]

    lane_s = P("data", "shard", None)
    scal_s = P("data", "shard")
    return jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(lane_s, lane_s, P(), P(), scal_s, lane_s),
            out_specs=(lane_s, lane_s, scal_s)),
        donate_argnums=(0, 1),
    )


@lru_cache(maxsize=None)
def make_sharded_merge_step(mesh: Mesh, unit: bool, bucket: int):
    """Jitted per-device lane compaction (no communication): each
    device combines duplicate hashes in its buffer prefix [0, bucket)
    in place.  With unit=True every lane weighs 1 (keys-only first
    sort); otherwise lanes below `s_end` carry retained totals in
    `wgts` and lanes at or above it are fresh unit appends.

    The idx buffer carries stream positions for fresh lanes and
    first-occurrence positions for retained lanes (the combine mins
    them, which is exactly the first-occurrence merge).

    step(keys[D,S,cap], wgts[D,S,cap], idx[D,S,cap], s_end)
      -> (keys, wgts, idx, n_valid[D,S])."""
    from khmer_tpu.ops.deferred import combine_lanes, combine_unit_lanes

    def local(keys, wgts, idxs, s_end):
        k = keys[0, 0]
        w = wgts[0, 0]
        f = idxs[0, 0]
        kseg = lax.dynamic_slice(k, (0,), (bucket,))
        fseg = lax.dynamic_slice(f, (0,), (bucket,))
        if unit:
            k2, w2, f2, nv = combine_unit_lanes(kseg, fseg)
        else:
            wseg = lax.dynamic_slice(w, (0,), (bucket,))
            pos = lax.iota(I32, bucket)
            w_eff = jnp.where(pos < s_end, wseg, U32(1))
            k2, w2, f2, nv = combine_lanes(kseg, w_eff, fseg)
        k = lax.dynamic_update_slice(k, k2, (0,))
        w = lax.dynamic_update_slice(w, w2, (0,))
        f = lax.dynamic_update_slice(f, f2, (0,))
        return k[None, None], w[None, None], f[None, None], nv[None, None]

    lane_s = P("data", "shard", None)
    scal_s = P("data", "shard")
    return jax.jit(
        jax.shard_map(local, mesh=mesh,
                      in_specs=(lane_s, lane_s, lane_s, P()),
                      out_specs=(lane_s, lane_s, lane_s, scal_s)),
        donate_argnums=(0, 1, 2),
    )


@lru_cache(maxsize=None)
def make_routed_collect_step(mesh: Mesh, F: int, cap_dest: int,
                             from_buffer: bool):
    """Jitted routing round: each device routes one window of its
    locally-distinct (hash, total) lanes to the band owners (one
    all_to_all over BOTH mesh axes — D*S bands); owners APPEND the
    received block into their ledger bag at the host-tracked offset.
    Lanes that overflow a destination's fixed capacity stay local and
    come back compacted for the next drain round (from_buffer=False).

    step(ledger_k, ledger_w, ledger_f, keys, wgts, idxs, off, loff)
      -> (ledger_k, ledger_w, ledger_f, left_k[D,S,F], left_w, left_f,
          n_left[D,S])

    from_buffer=True: keys/wgts/idxs are the full [D,S,cap] buffers and
    the window [off, off+F) is sliced on device; otherwise they are
    [D,S,F] leftover arrays from the previous round (off ignored)."""
    from khmer_tpu.ops.deferred import IDX_SENTINEL, SENTINEL

    NS = mesh.shape["data"] * mesh.shape["shard"]

    def local(ledger_k, ledger_w, ledger_f, keys, wgts, idxs, off, loff):
        if from_buffer:
            k = lax.dynamic_slice(keys[0, 0], (off,), (F,))
            w = lax.dynamic_slice(wgts[0, 0], (off,), (F,))
            f = lax.dynamic_slice(idxs[0, 0], (off,), (F,))
        else:
            k, w, f = keys[0, 0], wgts[0, 0], idxs[0, 0]
        if NS > 1:
            (send_h, send_w, send_f, left_h, left_w, left_f,
             n_left) = _route_with_leftover(k, w, f, NS, cap_dest)
            recv_h = lax.all_to_all(send_h, _AXES, 0, 0).reshape(-1)
            recv_w = lax.all_to_all(send_w, _AXES, 0, 0).reshape(-1)
            recv_f = lax.all_to_all(send_f, _AXES, 0, 0).reshape(-1)
        else:
            recv_h, recv_w, recv_f = k, w, f
            left_h = jnp.full(k.shape, SENTINEL, U64)
            left_w = jnp.zeros(w.shape, U32)
            left_f = jnp.full(f.shape, IDX_SENTINEL, U32)
            n_left = jnp.zeros((), I32)
        lk = lax.dynamic_update_slice(ledger_k[0, 0], recv_h, (loff,))
        lw = lax.dynamic_update_slice(ledger_w[0, 0], recv_w, (loff,))
        lf = lax.dynamic_update_slice(ledger_f[0, 0], recv_f, (loff,))
        return (lk[None, None], lw[None, None], lf[None, None],
                left_h[None, None], left_w[None, None],
                left_f[None, None], n_left[None, None])

    lane_s = P("data", "shard", None)
    scal_s = P("data", "shard")
    return jax.jit(
        jax.shard_map(local, mesh=mesh,
                      in_specs=(lane_s, lane_s, lane_s, lane_s, lane_s,
                                lane_s, P(), P()),
                      out_specs=(lane_s, lane_s, lane_s, lane_s, lane_s,
                                 lane_s, scal_s)),
        donate_argnums=(0, 1, 2),
    )


@lru_cache(maxsize=None)
def make_claims_step(spec: SketchSpec, mesh: Mesh, virgin: bool):
    """Jitted exact n_unique accounting over the FULL owner-distinct
    lane set (reference claim rule; ops/deferred.py docstring).

    Claims cross shard boundaries — a serial-table bin collects keys
    from many band owners — so each table builds a dense claim array
    (scatter-min of first positions over local keys) and all-reduce-
    mins it across the mesh; a shard's key is new iff for some table
    the pre-consume bin is zero AND the mesh-wide minimum first
    position at its bin is its own.  Keys are band-partitioned, so the
    per-shard new counts partition the global count exactly.

    step(uniq, keys, wgts, firsts[, base]) -> uniq"""
    from khmer_tpu.ops.deferred import IDX_SENTINEL, SENTINEL

    def local(uniq, keys, wgts, firsts, *maybe_base):
        k = keys[0, 0]
        w = wgts[0, 0]
        f = firsts[0, 0]
        valid = (k != SENTINEL) & (w > 0)
        fv = jnp.where(valid, f, IDX_SENTINEL)
        newflag = jnp.zeros(k.shape, bool)
        for t in range(spec.n_tables):
            p = int(spec.tablesizes[t])
            off = int(spec.bin_offsets[t])
            bins = jnp.where(valid, (k % U64(p)).astype(I64),
                             jnp.int64(p))
            claim = jnp.full(p + 1, IDX_SENTINEL, U32).at[bins].min(fv)
            claim = lax.pmin(lax.pmin(claim, "shard"), "data")
            own = claim[bins] == fv
            if virgin:
                win = own
            else:
                base = maybe_base[0]
                gidx = jnp.where(valid, bins + off,
                                 jnp.int64(spec.total_bins))
                win = own & (base[gidx] == 0)
            newflag = newflag | (valid & win)
        n_new = jnp.sum(newflag.astype(U64))
        return (uniq[0, 0] + n_new)[None, None]

    scal_s = P("data", "shard")
    lane_s = P("data", "shard", None)
    in_specs = [scal_s, lane_s, lane_s, lane_s]
    if not virgin:
        in_specs.append(P(None))
    return jax.jit(
        jax.shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                      out_specs=scal_s))


@lru_cache(maxsize=None)
def make_sharded_flush_step(spec: SketchSpec, mesh: Mesh, F: int,
                            virgin: bool, track_bigcount: bool):
    """Jitted flush of one window of owner-distinct (key, total) lanes
    into the per-shard partial tables (n_unique is accounted
    separately by make_claims_step).  Bigcount candidates are
    all_gathered so every process can read them (multi-host safety).

    step(tables, keys, wgts, off[, base])
      -> (tables[, cand [D*S*F] replicated, n_cross [D*S] repl.])
    """
    from khmer_tpu.ops.deferred import SENTINEL

    def local(tables, keys, wgts, off, *maybe_base):
        tbl = tables[0, 0]
        rk = lax.dynamic_slice(keys[0, 0], (off,), (F,))
        rw = lax.dynamic_slice(wgts[0, 0], (off,), (F,))
        w = jnp.where(rk != SENTINEL, rw, U32(0))
        idx = _bin_idx(spec, rk)
        dummy = jnp.int64(spec.total_bins)
        idx = jnp.where(w[None, :] > 0, idx, dummy)
        tbl = tbl.at[idx.reshape(-1)].add(jnp.tile(w, spec.n_tables))
        outs = [tbl[None, None]]
        if track_bigcount:
            if virgin:
                pre0 = jnp.zeros(w.shape, U32)
            else:
                pre0 = maybe_base[0][idx[0]]
            cross = (pre0 + w > 255) & (w > 0)
            cand = lax.sort(jnp.where(cross, rk, SENTINEL))
            n_cross = jnp.sum(cross.astype(U32))
            outs += [lax.all_gather(cand, _AXES).reshape(-1),
                     lax.all_gather(n_cross, _AXES).reshape(-1)]
        return tuple(outs)

    tbl_s = P("data", "shard", None)
    lane_s = P("data", "shard", None)
    in_specs = [tbl_s, lane_s, lane_s, P()]
    if not virgin and track_bigcount:
        in_specs.append(P(None))
    out_specs = [tbl_s]
    kwargs = {}
    if track_bigcount:
        out_specs += [P(), P()]
        # the candidate outputs ARE replicated (all_gather over every
        # mesh axis), but the static varying-axes check cannot infer it
        kwargs["check_vma"] = False
    return jax.jit(
        jax.shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                      out_specs=tuple(out_specs), **kwargs),
        donate_argnums=(0,),
    )


@lru_cache(maxsize=None)
def make_partials_reduce(mesh: Mesh):
    """Jitted sum of the per-device partial tables into one flat
    serial-equal table (saturation applies at read, so the plain sum
    IS the serial table; see module docstring).  Replicated output:
    safe to read on every process of a multi-host run."""

    def fn(tables):
        return jnp.sum(tables, axis=(0, 1))

    return jax.jit(fn, out_shardings=NamedSharding(mesh, P()))


@lru_cache(maxsize=None)
def make_scalar_sum(mesh: Mesh):
    """Replicated-output scalar reducer: REQUIRED on multi-process
    meshes, where eager reads of partially-addressable arrays fail."""
    return jax.jit(lambda x: jnp.sum(x.astype(jnp.int64)),
                   out_shardings=NamedSharding(mesh, P()))


@lru_cache(maxsize=None)
def make_scalar_max(mesh: Mesh):
    return jax.jit(lambda x: jnp.max(x.astype(jnp.int64)),
                   out_shardings=NamedSharding(mesh, P()))


@lru_cache(maxsize=None)
def _make_grow_copy(mesh: Mesh):
    @partial(jax.jit, donate_argnums=(1, 2, 3),
             static_argnums=())
    def fn(old_k, new_k, new_w, new_f, old_w, old_f):
        new_k = lax.dynamic_update_slice(new_k, old_k, (0, 0, 0))
        new_w = lax.dynamic_update_slice(new_w, old_w, (0, 0, 0))
        new_f = lax.dynamic_update_slice(new_f, old_f, (0, 0, 0))
        return new_k, new_w, new_f

    return fn


class ShardedDeferredConsumer:
    """Transient multi-device deferred counter for ONE bulk consume.

    Lifecycle: created with empty per-device partial tables; bit-packed
    chunks stream in (one per device) with zero communication; local
    merges combine duplicates (survivors retained in the buffer);
    `finish()` routes locally-distinct lanes to their band owners
    (D*S bands over both mesh axes), owner-combines them exactly,
    flushes each partial table once per globally-distinct hash with
    n_unique/bigcount accounted against the pre-consume table, and
    returns (delta_table, n_unique_delta, n_consumed,
    bigcount_candidates) for the host Storage to adopt.

    Parity: counts serial-exact (sum of partials; saturation at read);
    n_unique BIT-EQUAL to the single-device deferred path and exact
    reference parity (module docstring claim rule; bands partition the
    hash space so each hash lives on exactly one owner, and claims are
    all-reduce-min'd across the mesh).  Drops are structurally
    impossible: routing
    overflow lanes stay local and the drain loop re-routes until none
    remain.

    Multi-process safe: every host-read value comes from a
    replicated-output jit; the host control flow (merge points, window
    count, drain rounds, ledger growth) is a pure function of
    host-tracked fills and replicated reductions, so all processes
    issue identical collective sequences.  On multi-process meshes
    each process queues chunks for its OWN devices only
    (jax.make_array_from_process_local_data assembles the batch)."""

    def __init__(self, spec, k, hash_kind, mesh=None, chunk=1 << 20,
                 cap=None, from_codes=False):
        from khmer_tpu.ops import deferred as dfr

        self.spec = spec
        self.mesh = mesh if mesh is not None else make_mesh()
        self.D = self.mesh.shape["data"]
        self.S = self.mesh.shape["shard"]
        self.NS = self.D * self.S
        if chunk % 8:
            raise ValueError("chunk must be a multiple of 8 (bit packing)")
        self.chunk = chunk
        self.k = k
        self.hash_kind = hash_kind
        self.from_codes = from_codes
        from khmer_tpu.hashtable import _chunk_lane_count

        self.chunk_lanes = _chunk_lane_count(k, hash_kind, chunk,
                                             min(1 << 14, chunk))
        if cap is None:
            cap = max(4 * self.chunk_lanes,
                      min(2 * dfr.MIN_MERGE, dfr.default_max_cap()))
        # power-of-two per-shard cap: any power-of-two flush window
        # tiles it exactly, so merge/flush buckets can track `fill`
        self.cap = dfr._next_pow2(max(int(cap), 2 * self.chunk_lanes))
        self.max_flush = min(dfr.flush_slice(), self.cap)
        self._append = make_sharded_append_step(
            k, hash_kind, self.mesh, chunk, self.cap)
        self._reduce = make_partials_reduce(self.mesh)
        self._sum = make_scalar_sum(self.mesh)
        self._max = make_scalar_max(self.mesh)
        lane_sh = NamedSharding(self.mesh, P("data", "shard", None))
        scal_sh = NamedSharding(self.mesh, P("data", "shard"))
        self.lane_sh, self.scal_sh = lane_sh, scal_sh
        self._multi = jax.process_count() > 1
        self._n_local = sum(d.process_index == jax.process_index()
                            for d in self.mesh.devices.flat)
        self._batch_rows = self._n_local if self._multi else self.NS
        self.keys = jax.device_put(
            jnp.full((self.D, self.S, self.cap), dfr.SENTINEL, U64),
            lane_sh)
        self.wgts = jax.device_put(
            jnp.zeros((self.D, self.S, self.cap), U32), lane_sh)
        self.idx = jax.device_put(
            jnp.full((self.D, self.S, self.cap), dfr.IDX_SENTINEL, U32),
            lane_sh)
        self.batch = 0  # dispatched chunk batches (global chunk order)
        self.tables = jax.device_put(
            jnp.zeros((self.D, self.S, spec.total_bins + 1), U32),
            lane_sh)
        self.uniq = jax.device_put(
            jnp.zeros((self.D, self.S), U64), scal_sh)
        self.consumed = jax.device_put(
            jnp.zeros((self.D, self.S), U64), scal_sh)
        self.fill = 0
        self.survivors = 0
        self._merge_at = min(dfr.MIN_MERGE, self.cap)
        self.bigcount_candidates = set()
        self._track_bigcount = (spec.use_bigcount and spec.kind == "byte")
        self._pending = []
        self._bc_pending = []
        # owner-side ledger bag (allocated at finish)
        self.ledger_k = None
        self.ledger_w = None
        self.ledger_f = None
        self.ledger_cap = 0
        self.ledger_fill = 0

    @property
    def n_dropped(self):
        """Routing drops are structurally impossible in the deferred
        design (overflow lanes stay local and drain until none)."""
        return 0

    # -- streaming ---------------------------------------------------------

    def add_chunk(self, data, weights):
        """Queue one host chunk (<= [chunk] uint8 codes/bytes +
        weights; short tail chunks are zero-padded); dispatches when
        every device of this process has a pending chunk."""
        from khmer_tpu.hashtable import _pack_chunk

        if data.shape[0] < self.chunk:
            pad = self.chunk - data.shape[0]
            data = np.concatenate([data, np.zeros(pad, np.uint8)])
            weights = np.concatenate(
                [weights, np.zeros(pad, weights.dtype)])
        self._pending.append(_pack_chunk(
            data, weights, from_ascii=not self.from_codes
            and self.hash_kind != "2bit"))
        if len(self._pending) == self._batch_rows:
            self._dispatch()

    def add_packed(self, packed):
        """Queue one already-packed chunk buffer (u8[3*chunk/8])."""
        self._pending.append(packed)
        if len(self._pending) == self._batch_rows:
            self._dispatch()

    def _dispatch(self, force=False):
        """Send the pending chunk batch to the devices.  On
        multi-process meshes every process MUST call this the same
        number of times (pad with empty chunks via force=True)."""
        if not self._pending and not force:
            return
        packed_len = self.chunk // 4 + self.chunk // 8
        while len(self._pending) < self._batch_rows:
            self._pending.append(np.zeros(packed_len, np.uint8))
        stack = np.stack(self._pending)
        self._pending.clear()
        if self.fill + self.chunk_lanes > min(self._merge_at, self.cap):
            self._merge()
        if self._multi:
            packed = jax.make_array_from_process_local_data(
                self.lane_sh, stack.reshape(1, self._n_local, packed_len))
        else:
            packed = jax.device_put(
                stack.reshape(self.D, self.S, packed_len), self.lane_sh)
        with stage("shard-append", lanes=self.chunk_lanes) as _s:
            self.keys, self.idx, self.consumed = self._append(
                self.keys, self.idx, jnp.int32(self.fill),
                jnp.int32(self.batch), self.consumed, packed)
            if _s is not None:
                _s.sync = self.consumed
        self.fill += self.chunk_lanes
        self.batch += 1

    def _merge(self):
        from khmer_tpu.ops import deferred as dfr

        if self.fill == 0 or self.fill == self.survivors:
            return
        bucket = min(max(dfr._next_pow2(self.fill), dfr.MIN_BUCKET),
                     self.cap)
        step = make_sharded_merge_step(self.mesh, self.survivors == 0,
                                       bucket)
        with stage("shard-merge", lanes=bucket) as _s:
            self.keys, self.wgts, self.idx, nv = step(
                self.keys, self.wgts, self.idx,
                jnp.int32(self.survivors))
            if _s is not None:
                _s.sync = nv
        self.fill = int(np.asarray(self._max(nv)))
        self.survivors = self.fill
        self._merge_at = min(max(dfr.MIN_MERGE, 2 * self.fill), self.cap)

    # -- flush -------------------------------------------------------------

    def _ledger_room(self, need):
        from khmer_tpu.ops import deferred as dfr

        need = max(dfr._next_pow2(need), dfr.MIN_BUCKET)
        if self.ledger_k is None or need > self.ledger_cap:
            nk = jax.device_put(jnp.full((self.D, self.S, need),
                                         dfr.SENTINEL, U64), self.lane_sh)
            nw = jax.device_put(jnp.zeros((self.D, self.S, need), U32),
                                self.lane_sh)
            nf = jax.device_put(jnp.full((self.D, self.S, need),
                                         dfr.IDX_SENTINEL, U32),
                                self.lane_sh)
            if self.ledger_k is not None:
                grow = _make_grow_copy(self.mesh)
                nk, nw, nf = grow(self.ledger_k, nk, nw, nf,
                                  self.ledger_w, self.ledger_f)
            self.ledger_k, self.ledger_w, self.ledger_f = nk, nw, nf
            self.ledger_cap = need

    def finish(self, base_table=None, virgin=None):
        """Drain everything: final local merge, routed collect of every
        lane window (+ overflow drain rounds), ONE owner-side combine
        and ONE flush per partial table, then reduce.  Returns
        (delta_table [bins+1], n_unique_delta, n_consumed,
        bigcount_candidates).

        `base_table` is the consuming Storage's pre-consume serial
        table; pass virgin=True (or base_table=None) when it is known
        all-zero — the claims step then skips the base gather."""
        from khmer_tpu.ops import deferred as dfr

        self._dispatch()
        self._merge()
        if virgin is None:
            virgin = base_table is None
        n = self.fill
        if n == 0:
            delta = self._reduce(self.tables)
            return delta, 0, int(np.asarray(self._sum(self.consumed))), \
                self.bigcount_candidates
        # -- routed collect: windows + drain rounds -------------------------
        F = min(max(dfr._next_pow2(n), dfr.MIN_BUCKET), self.max_flush)
        # per-destination capacity: fmix-mixed owners are uniform, so
        # a 15% margin over the mean practically never overflows (the
        # drain loop guarantees correctness when it does); the margin
        # directly sets the all_to_all padding overhead
        mean = -(-F // self.NS)
        cap_dest = max(64, (mean + mean // 7 + 7) & ~7)
        block = self.NS * cap_dest
        n_win = -(-n // F)
        self._ledger_room(n_win * block + 2 * block)
        first = make_routed_collect_step(self.mesh, F, cap_dest, True)
        drain = make_routed_collect_step(self.mesh, F, cap_dest, False)
        loff = 0
        self.routed_bytes = 0      # all_to_all payload (16 B/lane)
        self.route_rounds = 0
        self.drain_rounds = 0
        for off in range(0, n, F):
            keys, wgts, idxs, step = self.keys, self.wgts, self.idx, first
            woff = jnp.int32(off)
            while True:
                self._ledger_room(loff + block)
                with stage("shard-route", lanes=block) as _s:
                    out = step(self.ledger_k, self.ledger_w,
                               self.ledger_f, keys, wgts, idxs,
                               woff, jnp.int32(loff))
                    if _s is not None:
                        _s.sync = out[-1]
                (self.ledger_k, self.ledger_w, self.ledger_f,
                 keys, wgts, idxs, n_left) = out
                self.routed_bytes += block * 16
                self.route_rounds += 1
                if step is drain:
                    self.drain_rounds += 1
                step, woff = drain, jnp.int32(0)
                loff += block
                if int(np.asarray(self._sum(n_left))) == 0:
                    break
        self.ledger_fill = loff
        self.keys = None
        self.wgts = None
        self.idx = None
        # -- owner-side exact combine ---------------------------------------
        bucket = min(max(dfr._next_pow2(self.ledger_fill),
                         dfr.MIN_BUCKET), self.ledger_cap)
        merge = make_sharded_merge_step(self.mesh, False, bucket)
        with stage("shard-owner-combine", lanes=bucket) as _s:
            ok, ow, of, nv = merge(self.ledger_k, self.ledger_w,
                                   self.ledger_f,
                                   jnp.int32(self.ledger_fill))
            if _s is not None:
                _s.sync = nv
        self.ledger_k = None
        self.ledger_w = None
        self.ledger_f = None
        self.ledger_cap = 0
        n_max = int(np.asarray(self._max(nv)))
        # -- exact n_unique claims over the full owner-distinct set ----------
        base_args = ()
        if not virgin:
            base_args = (jax.device_put(
                base_table, NamedSharding(self.mesh, P())),)
        claims = make_claims_step(self.spec, self.mesh, bool(virgin))
        with stage("shard-claims", lanes=int(ok.shape[-1])) as _s:
            self.uniq = claims(self.uniq, ok, ow, of, *base_args)
            if _s is not None:
                _s.sync = self.uniq
        # -- one flush per partial table -------------------------------------
        Fw = min(max(dfr._next_pow2(max(n_max, 1)), dfr.MIN_BUCKET),
                 self.max_flush, int(ok.shape[-1]))
        bc_base = base_args if (self._track_bigcount and not virgin) \
            else ()
        flush = make_sharded_flush_step(self.spec, self.mesh, Fw,
                                        bool(virgin), self._track_bigcount)
        for off in range(0, max(n_max, 1), Fw):
          with stage("shard-flush", lanes=Fw * self.spec.n_tables) as _s:
            out = flush(self.tables, ok, ow, jnp.int32(off), *bc_base)
            if _s is not None:
                _s.sync = out[0]
            self.tables = out[0]
            if self._track_bigcount:
                self._bc_pending.append((out[1], out[2]))
        for cand, n_cross in self._bc_pending:
            nc = np.asarray(n_cross).reshape(self.NS)
            ch = np.asarray(cand).reshape(self.NS, -1)
            for s in range(self.NS):
                if nc[s]:
                    self.bigcount_candidates.update(
                        int(x) for x in ch[s, : nc[s]])
        self._bc_pending = []
        delta = self._reduce(self.tables)
        n_unique = int(np.asarray(self._sum(self.uniq)))
        n_consumed = int(np.asarray(self._sum(self.consumed)))
        LAST_CONSUME_STATS.clear()
        LAST_CONSUME_STATS.update(
            routed_bytes=self.routed_bytes,
            route_rounds=self.route_rounds,
            drain_rounds=self.drain_rounds,
            n_distinct_max=n_max,
            n_consumed=n_consumed,
            devices=self.NS,
        )
        return delta, n_unique, n_consumed, self.bigcount_candidates
