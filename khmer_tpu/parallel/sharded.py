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

from functools import partial

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
        self.n_dropped = 0

    def consume_chunks(self, data, weights):
        """data/weights: [D, S, chunk] host arrays (one chunk/device)."""
        data = jax.device_put(jnp.asarray(data, U8), self.shardings["data"])
        weights = jax.device_put(
            jnp.asarray(weights, U32), self.shardings["data"])
        self.tables, self.occ, self.uniq, dropped = self.step(
            self.tables, self.occ, self.uniq, data, weights)
        self.n_dropped += int(jnp.sum(dropped))

    def get_counts(self, hashes):
        return np.asarray(
            self.query(self.tables, jnp.asarray(hashes, U64)))

    def merged_table(self):
        return np.asarray(
            merge_tables_saturating(self.tables, self.spec))

    def n_unique_kmers(self):
        # per-shard uniq sums are exact per band (bands partition the
        # hash space); cross-band FP suppression makes this >= the
        # serial estimate, never less accurate.
        return int(jnp.sum(self.uniq))
