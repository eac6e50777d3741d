"""Device-side sketch update/query primitives.

The reference updates its sketches one k-mer at a time with saturating
atomic RMW ops (ByteStorage::add, reference include/oxli/storage.hh:
575-628; BitStorage::test_and_set_bits, storage.hh:176-203;
NibbleStorage::add, storage.hh:324-363).  The TPU-native design keeps
ONE flat uint32 working counter per bin for every storage kind and
applies the per-kind saturation only when *reading*:

    reference cell value  ==  min(cap, total increments)
                          ==  min(cap, uint32 bin total)

because saturating increments commute — once the running value reaches
cap it stays there, and the uncapped total is then >= cap too.  This
turns the update into a single wrap-free `scatter-add` (no sort, no
read-modify-write) — the fastest XLA primitive available for random
updates — while staying bit-exact with the reference's saturating
semantics for every read, save, and merge.

Statistics:
  * `n_occupied` (bins of table 0 ever touched) == nonzero bins of
    table 0 now — computed lazily by a dense reduction, exact.
  * `n_unique_kmers` needs the pre-batch state: the update gathers the
    per-table pre-values, takes the min, and counts distinct batch
    hashes whose pre-min was zero (distinctness via one 64-bit sort).
  * bigcount (counts past 255, storage.hh:610-621) is free on reads —
    the uint32 total is simply capped at 65535 instead of 255.  For the
    OXLI *file format*'s sparse bigcount section the update also
    returns the lanes whose table-0 value crossed 255 (a sound
    superset of saturated hashes) for host-side tracking.

Memory note: the working table spends 4 bytes/bin where the reference
spends 1 (byte), 0.5 (nibble) or 1/8 (bit).  On-disk OXLI layouts are
produced losslessly at save time; capacity scaling across chips comes
from hash-band sharding (khmer_tpu.parallel) rather than sub-byte
packing, which HBM cannot update efficiently.
"""

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

U8 = jnp.uint8
U16 = jnp.uint16
U32 = jnp.uint32
U64 = jnp.uint64
I32 = jnp.int32
I64 = jnp.int64

# read caps per storage kind (reference MAX_KCOUNT oxli.hh:81, nibble
# storage.hh:258, bloom membership)
_CAPS = {"byte": 255, "bit": 1, "nibble": 15}
BIGCOUNT_CAP = 65535
# per-batch device->host candidate budget for bigcount tracking; far
# above anything real data produces per ~1M-base chunk
BIGCOUNT_LANES = 1 << 16


@dataclass(frozen=True)
class SketchSpec:
    """Static geometry of a sketch (hashable; closed over by jitted fns)."""

    kind: str  # 'byte' | 'bit' | 'nibble'
    tablesizes: tuple  # bins per table
    use_bigcount: bool = False

    @property
    def n_tables(self):
        return len(self.tablesizes)

    @property
    def bin_offsets(self):
        offs = []
        o = 0
        for s in self.tablesizes:
            offs.append(o)
            o += int(s)
        return tuple(offs)

    @property
    def total_bins(self):
        return sum(int(s) for s in self.tablesizes)

    @property
    def bytes_per_table(self):
        """OXLI on-disk bytes per table (reference storage.cc layouts)."""
        if self.kind == "byte":
            return tuple(int(s) for s in self.tablesizes)
        if self.kind == "bit":
            return tuple(int(s) // 8 + 1 for s in self.tablesizes)
        if self.kind == "nibble":
            return tuple(int(s) // 2 + 1 for s in self.tablesizes)
        raise ValueError(self.kind)

    @property
    def total_bytes(self):
        return sum(self.bytes_per_table)

    @property
    def max_count(self):
        return _CAPS[self.kind]

    @property
    def read_cap(self):
        if self.kind == "byte" and self.use_bigcount:
            return BIGCOUNT_CAP
        return _CAPS[self.kind]


def alloc_table(spec: SketchSpec):
    """Fresh flat uint32 working table (+1 dummy bin for padded lanes)."""
    return jnp.zeros(spec.total_bins + 1, dtype=U32)


def _bin_idx(spec, h):
    """[T, N] global bin indices of hashes in every table."""
    sizes = jnp.asarray(np.array(spec.tablesizes, dtype=np.uint64))[:, None]
    offs = jnp.asarray(np.array(spec.bin_offsets, dtype=np.int64))[:, None]
    return (h[None, :] % sizes).astype(I64) + offs


@partial(jax.jit, static_argnums=0, donate_argnums=(1,))
def sketch_update(spec: SketchSpec, table, n_occupied, n_unique, hashes,
                  weights, positions=None):
    """Batched sketch add for every storage kind.

    hashes: uint64 [N]; weights: uint32 [N] (0 = padded/masked lane);
    positions: optional uint32 [N] giving each lane's position in the
    caller's k-mer stream (defaults to lane order).  Returns (table,
    n_occupied, n_unique, aux); n_occupied passes through (it is
    computed lazily from the table).  aux carries the per-lane
    pre-batch min counts, the per-lane reference-exact "is_new" flags
    and, when use_bigcount, compacted bigcount-crossing candidates.

    n_unique is EXACT reference parity (storage.hh:176-203,:575-628):
    an occurrence is new iff some table's bin was zero immediately
    before its sequential insert — i.e. its pre-batch count is zero
    AND it is the bin's first claimant (minimum position) within this
    batch.  Occurrences suppressed in every table are not new; later
    duplicates of a hash lose every bin to their own first occurrence,
    so no separate key-level dedup is needed.
    """
    h = hashes.reshape(-1)
    w = weights.reshape(-1).astype(U32)
    n = h.shape[0]
    if positions is None:
        pos = lax.iota(U32, n)
    else:
        pos = positions.reshape(-1).astype(U32)
    idx = _bin_idx(spec, h)  # [T, N]
    dummy = jnp.int64(spec.total_bins)
    idx = jnp.where(w[None, :] > 0, idx, dummy)

    pre = table[idx]  # [T, N] gather
    premin = jnp.min(pre, axis=0)

    table = table.at[idx.reshape(-1)].add(
        jnp.tile(w, spec.n_tables))

    # reference claim rule, per table; two bit-identical strategies:
    # on CPU a dense claim array (scatter-min of positions, gather
    # back) — XLA:CPU sorts are ~100x slower than its scatter/gather;
    # on accelerators a (bin, position) sort whose run head claims,
    # with the flags scattered back to lane order by the lane id.
    pos_key = jnp.where(w > 0, pos, ~U32(0))
    is_new = jnp.zeros(n, bool)
    # the dense strategy allocates a total_bins-sized claim scratch:
    # only worth it when the batch is large relative to the sketch
    # (tiny batches into huge tables would pay a GB-scale memset)
    dense_ok = spec.total_bins <= max(1 << 25, 64 * n)
    if jax.default_backend() == "cpu" and dense_ok:
        # the [T, N] bin indices are already offset per table, so ONE
        # flat claim array covers every table
        claim = jnp.full(spec.total_bins + 1, ~U32(0), U32)
        claim = claim.at[idx.reshape(-1)].min(
            jnp.tile(pos_key, spec.n_tables))
        own = claim[idx] == pos_key[None, :]
        is_new = ((pre == 0) & own).any(axis=0)
    else:
        lane = lax.iota(I32, n)
        for t in range(spec.n_tables):
            sb, sp, sl = lax.sort((idx[t], pos_key, lane), num_keys=2)
            claim_s = jnp.concatenate(
                [jnp.ones((1,), bool), sb[1:] != sb[:-1]])
            claim = jnp.zeros(n, bool).at[sl].set(claim_s,
                                                  unique_indices=True)
            is_new = is_new | ((pre[t] == 0) & claim)
    is_new = is_new & (w > 0)
    n_unique = n_unique + jnp.sum(is_new.astype(U64))

    track_bigcount = spec.use_bigcount and spec.kind == "byte"
    aux = {"premin": premin, "is_new": is_new}
    if track_bigcount:
        # lanes whose table-0 bin crossed 255: a sound superset of
        # hashes that may now exceed 255.  One candidate lane per
        # distinct crossing hash, compacted by one ascending sort so
        # only a small list crosses to the host (jnp.nonzero(size=...)
        # lowers to a cumsum+scatter that costs ~10x a sort on TPU).
        cross = (table[idx[0]] > 255) & (w > 0)
        key = jnp.where(w > 0, h, ~jnp.uint64(0))
        ks, cs = lax.sort((key, cross.astype(U32)), num_keys=1)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), ks[1:] != ks[:-1]])
        lanes = min(BIGCOUNT_LANES, n)
        fc = first & (cs > 0) & (ks != ~jnp.uint64(0))
        cand_key = jnp.where(fc, ks, ~jnp.uint64(0))
        cand_sorted = lax.sort(cand_key)
        n_cross = jnp.sum(fc.astype(U32))
        aux["bigcount_hashes"] = cand_sorted[:lanes]
        aux["bigcount_valid"] = (
            jnp.arange(lanes, dtype=U32) < jnp.minimum(
                n_cross, U32(lanes)))
        aux["bigcount_overflow"] = n_cross > U32(lanes)
    return table, n_occupied, n_unique, aux


@partial(jax.jit, static_argnums=0)
def sketch_get(spec: SketchSpec, table, hashes):
    """Batched count read: min over tables of the bin totals, capped at
    the kind's saturation value (255/65535 for byte, 15 nibble, 1 bit).
    Mirrors ByteStorage::get_count storage.hh:631-653 etc."""
    h = hashes.reshape(-1)
    idx = _bin_idx(spec, h)
    tot = jnp.min(table[idx], axis=0)
    return jnp.minimum(tot, spec.read_cap).astype(U16).reshape(hashes.shape)


@partial(jax.jit, static_argnums=0)
def occupied_bins(spec: SketchSpec, table):
    """n_occupied: nonzero bins of table 0 (lazy, exact)."""
    t0 = table[: spec.tablesizes[0]]
    return jnp.sum((t0 > 0).astype(U64))


# ---------------------------------------------------------------------------
# OXLI byte-layout packing (save/load)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=0)
def pack_oxli_bytes(spec: SketchSpec, table):
    """Working uint32 table -> OXLI on-disk byte stream per table.

    byte: one uint8/bin capped at 255; nibble: two 4-bit counters per
    byte capped at 15 (+ trailing pad nibble); bit: 8 bins per byte
    (+ trailing pad bits).  Layout parity: reference storage.cc."""
    outs = []
    for t in range(spec.n_tables):
        size = int(spec.tablesizes[t])
        off = spec.bin_offsets[t]
        vals = table[off: off + size]
        if spec.kind == "byte":
            outs.append(jnp.minimum(vals, 255).astype(U8))
        elif spec.kind == "nibble":
            nb = size // 2 + 1
            padded = jnp.zeros(nb * 2, U32).at[:size].set(
                jnp.minimum(vals, 15))
            pair = padded.reshape(nb, 2)
            # even bin -> high nibble, odd -> low (storage.hh:268-276)
            outs.append((pair[:, 1] | (pair[:, 0] << 4)).astype(U8))
        else:  # bit
            nb = size // 8 + 1
            padded = jnp.zeros(nb * 8, U32).at[:size].set(
                (vals > 0).astype(U32))
            byte = padded.reshape(nb, 8)
            acc = jnp.zeros(nb, U32)
            for b in range(8):
                acc = acc | (byte[:, b] << b)
            outs.append(acc.astype(U8))
    return jnp.concatenate(outs)


@partial(jax.jit, static_argnums=0)
def _sparse_extract(spec: SketchSpec, table):
    """Compact (bin index, value) pairs of nonzero bins to the front
    (one device sort — sparse saves fetch ~12 bytes per OCCUPIED bin
    instead of the dense byte stream)."""
    n = spec.total_bins
    idx = jnp.arange(n, dtype=jnp.uint32)
    key = jnp.where(table[:n] != 0, idx, jnp.uint32(0xFFFFFFFF))
    ks, vs = lax.sort((key, table[:n]), num_keys=1)
    return ks, vs


def host_pack_oxli_bytes(spec: SketchSpec, table):
    """Numpy mirror of pack_oxli_bytes (byte-identical output) for
    host-side assembly after a sparse fetch."""
    outs = []
    for t in range(spec.n_tables):
        size = int(spec.tablesizes[t])
        off = spec.bin_offsets[t]
        vals = table[off: off + size]
        if spec.kind == "byte":
            outs.append(np.minimum(vals, 255).astype(np.uint8))
        elif spec.kind == "nibble":
            nb = size // 2 + 1
            padded = np.zeros(nb * 2, np.uint32)
            padded[:size] = np.minimum(vals, 15)
            pair = padded.reshape(nb, 2)
            outs.append((pair[:, 1] | (pair[:, 0] << 4)).astype(np.uint8))
        else:  # bit
            nb = size // 8 + 1
            padded = np.zeros(nb * 8, np.uint8)
            padded[:size] = (vals > 0)
            outs.append(np.packbits(padded.reshape(nb, 8), axis=1,
                                    bitorder="little").reshape(-1))
    return np.concatenate(outs)


def sparse_raw_bytes(spec: SketchSpec, table, n_nonzero):
    """OXLI byte stream via a SPARSE fetch: device-compact the
    occupied (bin, value) pairs, pull only those, assemble the byte
    stream on the host.  For typical occupancies this replaces a
    table-sized device->host transfer with a few MB."""
    cap = 1 << max(int(n_nonzero) - 1, 0).bit_length()
    cap = min(max(cap, 1 << 10), spec.total_bins)
    ks, vs = _sparse_extract(spec, table)
    idx = np.asarray(ks[:cap])
    vals = np.asarray(vs[:cap])
    valid = idx != 0xFFFFFFFF
    idx = idx[valid].astype(np.int64)
    vals = vals[valid]
    if spec.kind == "byte":
        # bins map 1:1 to stream bytes: one sparse store, zero
        # full-table passes
        out = np.zeros(spec.total_bytes, np.uint8)
        out[idx] = np.minimum(vals, 255).astype(np.uint8)
        return out
    full = np.zeros(spec.total_bins + 1, np.uint32)
    full[idx] = vals
    return host_pack_oxli_bytes(spec, full)


def host_unpack_to_u32(spec: SketchSpec, data):
    """Numpy mirror of the byte-stream -> u32 widening (load path)."""
    table = np.zeros(spec.total_bins + 1, np.uint32)
    boff = 0
    for t in range(spec.n_tables):
        size = int(spec.tablesizes[t])
        off = spec.bin_offsets[t]
        nb = spec.bytes_per_table[t]
        raw = np.frombuffer(
            np.ascontiguousarray(data[boff: boff + nb]), np.uint8)
        if spec.kind == "byte":
            table[off: off + size] = raw
        elif spec.kind == "nibble":
            inter = np.empty(nb * 2, np.uint32)
            inter[0::2] = raw >> 4
            inter[1::2] = raw & 0xF
            table[off: off + size] = inter[:size]
        else:  # bit
            bits = np.unpackbits(raw, bitorder="little")
            table[off: off + size] = bits[:size]
        boff += nb
    return table


def unpack_oxli_bytes(spec: SketchSpec, data):
    """OXLI byte stream (host numpy) -> working uint32 table.

    Sparse tables (the common case) upload only the occupied
    (bin, value) pairs and scatter them into device zeros — a few MB
    over the wire.  Dense tables upload the RAW bytes (one
    device_put, 4x less wire than the widened u32 table) and widen on
    device."""
    host = host_unpack_to_u32(spec, data)
    nz = np.nonzero(host)[0]
    if nz.size * 12 * 2 < spec.total_bytes:
        cap = 1 << max(int(nz.size) - 1, 0).bit_length()
        cap = max(cap, 1 << 10)
        idx = np.full(cap, spec.total_bins, np.int64)  # dummy bin
        vals = np.zeros(cap, np.uint32)
        idx[: nz.size] = nz
        vals[: nz.size] = host[nz]
        table = alloc_table(spec)
        return table.at[jax.device_put(idx)].set(jax.device_put(vals))
    d = jax.device_put(np.ascontiguousarray(data, np.uint8))
    parts = []
    boff = 0
    for t in range(spec.n_tables):
        size = int(spec.tablesizes[t])
        nb = spec.bytes_per_table[t]
        raw = d[boff: boff + nb]
        if spec.kind == "byte":
            parts.append(raw[:size].astype(jnp.uint32))
        elif spec.kind == "nibble":
            inter = jnp.stack([raw >> 4, raw & 0xF],
                              axis=1).reshape(-1)
            parts.append(inter[:size].astype(jnp.uint32))
        else:  # bit
            shifts = jnp.arange(8, dtype=jnp.uint8)
            bits = ((raw[:, None] >> shifts[None, :]) & 1).reshape(-1)
            parts.append(bits[:size].astype(jnp.uint32))
        boff += nb
    parts.append(jnp.zeros(1, jnp.uint32))
    return jnp.concatenate(parts)


# backwards-compatible aliases (all kinds share the implementation)
UPDATE_FNS = {k: sketch_update for k in _CAPS}
GET_FNS = {k: sketch_get for k in _CAPS}
