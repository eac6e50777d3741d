"""Device-side sketch update/query primitives.

The reference updates its sketches one k-mer at a time with atomic RMW ops
(ByteStorage::add, reference include/oxli/storage.hh:575-628; BitStorage::
test_and_set_bits, storage.hh:176-203; NibbleStorage::add, storage.hh:
324-363).  On TPU the whole batch updates in one pass:

  1. compute each k-mer's bin in every table (`hash % prime`),
  2. sort the flattened (table, bin) indices and segment-reduce duplicate
     bins into per-bin multiplicities,
  3. gather old cell values, apply the saturating/bit-OR/nibble update,
     scatter back — every target cell is written exactly once, so the
     batched result equals the reference's sequential result for the cell
     contents (saturating adds commute).

Statistics semantics:
  * `n_occupied` counts bins of table 0 that go 0 -> nonzero — exact.
  * `n_unique_kmers` counts distinct new k-mers.  A k-mer is "new" when
    its pre-batch min-count is zero.  This matches the reference for all
    k-mers except the (astronomically rare, and already thread-racy in
    the reference) case where one batch k-mer's bins are entirely covered
    by another batch k-mer's bins.
  * bigcount escapes (counts past 255) are detected on device and applied
    to the host-side sparse map by the caller.

All tables of a sketch live in ONE flat uint8 device array (byte layouts
identical to the OXLI on-disk layout, so save/load is a slice copy), plus
one trailing "dummy" byte that absorbs padded scatter lanes.
"""

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

U8 = jnp.uint8
U32 = jnp.uint32
U64 = jnp.uint64
I64 = jnp.int64


@dataclass(frozen=True)
class SketchSpec:
    """Static geometry of a sketch (hashable; closed over by jitted fns)."""

    kind: str  # 'byte' | 'bit' | 'nibble'
    tablesizes: tuple  # bins per table (NOT bytes)
    use_bigcount: bool = False

    @property
    def n_tables(self):
        return len(self.tablesizes)

    @property
    def bytes_per_table(self):
        if self.kind == "byte":
            return tuple(int(s) for s in self.tablesizes)
        if self.kind == "bit":
            return tuple(int(s) // 8 + 1 for s in self.tablesizes)
        if self.kind == "nibble":
            return tuple(int(s) // 2 + 1 for s in self.tablesizes)
        raise ValueError(self.kind)

    @property
    def offsets(self):
        offs = []
        o = 0
        for b in self.bytes_per_table:
            offs.append(o)
            o += b
        return tuple(offs)

    @property
    def total_bytes(self):
        return sum(self.bytes_per_table)

    @property
    def max_count(self):
        return {"byte": 255, "bit": 1, "nibble": 15}[self.kind]


def alloc_table(spec: SketchSpec):
    """Fresh flat table (+1 dummy byte)."""
    return jnp.zeros(spec.total_bytes + 1, dtype=U8)


def _bins(spec, h):
    """[T, N] bins of hashes in every table."""
    sizes = jnp.asarray(np.array(spec.tablesizes, dtype=np.uint64))[:, None]
    return h[None, :] % sizes


def _segments(keys, weights):
    """Sort keys; return (sorted keys, segment ids, first-lane mask,
    per-segment weight sums gathered back to lanes, lane order)."""
    order = jnp.argsort(keys)
    ks = keys[order]
    ws = weights[order]
    n = keys.shape[0]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    seg = jnp.cumsum(first) - 1
    segw = jnp.zeros(n, dtype=ws.dtype).at[seg].add(ws)
    return ks, ws, first, seg, segw, order


# ---------------------------------------------------------------------------
# ByteStorage (Count-Min sketch, 8-bit counters)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=0, donate_argnums=(1,))
def byte_update(spec: SketchSpec, table, n_occupied, n_unique, hashes, weights):
    """Batched ByteStorage::add (reference storage.hh:575-628).

    hashes: uint64 [N]; weights: uint32 [N] (0 = padded lane).
    Returns (table, n_occupied, n_unique, aux) where aux carries per-lane
    pre-batch min counts and (if use_bigcount) per-distinct-hash bigcount
    trigger counts.
    """
    h = hashes.reshape(-1)
    w = weights.reshape(-1).astype(U32)
    n = h.shape[0]
    T = spec.n_tables
    offs = jnp.asarray(np.array(spec.offsets, dtype=np.int64))[:, None]
    bins = _bins(spec, h)
    idx = bins.astype(I64) + offs  # [T, N]

    pre = table[idx].astype(U32)  # [T, N]
    premin = jnp.min(pre, axis=0)  # [N]

    # --- per-bin saturating add ---
    fidx = idx.reshape(-1)
    fw = jnp.tile(w, T)
    dummy = jnp.int64(spec.total_bytes)
    s_idx, s_w, first, seg, _, _ = _segments(fidx, fw)
    m = jnp.zeros(T * n, dtype=U32).at[seg].add(s_w)  # per segment, at seg id
    uidx = jnp.full(T * n, dummy, dtype=I64).at[seg].set(s_idx)
    old = table[uidx].astype(U32)
    newv = jnp.where(m > 0, jnp.minimum(old + m, spec.max_count), old)
    table = table.at[uidx].set(newv.astype(U8))

    # occupied bins: table-0 bins going 0 -> nonzero
    t0_end = jnp.int64(spec.bytes_per_table[0])
    occ = jnp.sum(((uidx < t0_end) & (old == 0) & (m > 0)).astype(U64))
    n_occupied = n_occupied + occ

    # --- distinct-hash statistics ---
    hs, _, hfirst, hseg, _, horder = _segments(h, w)
    hw = jnp.zeros(n, dtype=U32).at[hseg].add(w[horder])
    pm_first = jnp.zeros(n, dtype=U32).at[hseg].set(premin[horder])
    seg_exists = hw > 0
    uniq = jnp.sum((seg_exists & (pm_first == 0)).astype(U64))
    n_unique = n_unique + uniq

    aux = {"premin": premin}
    if spec.use_bigcount:
        uh = jnp.zeros(n, dtype=U64).at[hseg].set(hs)
        room = jnp.uint32(spec.max_count) - jnp.minimum(
            pm_first, spec.max_count)
        trig = jnp.where(seg_exists, jnp.maximum(hw, room) - room,
                         jnp.uint32(0))
        aux["bigcount_hashes"] = uh
        aux["bigcount_triggers"] = trig
    return table, n_occupied, n_unique, aux


@partial(jax.jit, static_argnums=0)
def byte_get(spec: SketchSpec, table, hashes):
    """Batched ByteStorage::get_count (min over tables; storage.hh:631-653).

    bigcount overlay (counts > 255) is applied by the caller."""
    h = hashes.reshape(-1)
    offs = jnp.asarray(np.array(spec.offsets, dtype=np.int64))[:, None]
    idx = _bins(spec, h).astype(I64) + offs
    return jnp.min(table[idx], axis=0).astype(jnp.uint16).reshape(hashes.shape)


# ---------------------------------------------------------------------------
# BitStorage (Bloom filter)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=0, donate_argnums=(1,))
def bit_update(spec: SketchSpec, table, n_occupied, n_unique, hashes, weights):
    """Batched BitStorage::test_and_set_bits (reference storage.hh:176-203)."""
    h = hashes.reshape(-1)
    w = weights.reshape(-1).astype(U32)
    n = h.shape[0]
    T = spec.n_tables
    offs = jnp.asarray(np.array(spec.offsets, dtype=np.int64))[:, None]
    bins = _bins(spec, h)
    bytei = (bins >> U64(3)).astype(I64) + offs  # [T, N]
    bit = (bins & U64(7)).astype(U32)

    pre = (table[bytei].astype(U32) >> bit) & 1  # [T, N]
    premin = jnp.min(pre, axis=0)

    # global bit key; dedup bits, then group bits into bytes
    key = bytei * 8 + bit.astype(I64)
    fkey = key.reshape(-1)
    fw = jnp.tile(w, T)
    s_key, s_w, first, seg, _, _ = _segments(fkey, fw)
    kw = jnp.zeros(T * n, dtype=U32).at[seg].add(s_w)
    kb = s_key >> 3  # sorted byte index per lane
    bfirst = jnp.concatenate([jnp.ones((1,), bool), kb[1:] != kb[:-1]])
    bseg = jnp.cumsum(bfirst) - 1
    contrib = jnp.where(
        first & (kw[seg] > 0),
        (jnp.uint32(1) << (s_key & 7).astype(U32)),
        jnp.uint32(0),
    )
    ormask = jnp.zeros(T * n, dtype=U32).at[bseg].add(contrib)
    dummy = jnp.int64(spec.total_bytes)
    ubyte = jnp.full(T * n, dummy, dtype=I64).at[bseg].set(kb)
    old = table[ubyte].astype(U32)
    newb = old | ormask
    table = table.at[ubyte].set(newb.astype(U8))

    # occupied = newly set bits within table 0's byte range
    t0_end = jnp.int64(spec.bytes_per_table[0])
    newly = jnp.where(ubyte < t0_end, newb & ~old, 0)
    occ = jnp.sum(lax.population_count(newly).astype(U64))
    n_occupied = n_occupied + occ

    hs, _, hfirst, hseg, _, horder = _segments(h, w)
    hw = jnp.zeros(n, dtype=U32).at[hseg].add(w[horder])
    pm_first = jnp.zeros(n, dtype=U32).at[hseg].set(premin[horder])
    uniq = jnp.sum(((hw > 0) & (pm_first == 0)).astype(U64))
    n_unique = n_unique + uniq

    aux = {"premin": premin}
    return table, n_occupied, n_unique, aux


@partial(jax.jit, static_argnums=0)
def bit_get(spec: SketchSpec, table, hashes):
    """Batched BitStorage::get_count (membership AND; storage.hh:211-223)."""
    h = hashes.reshape(-1)
    offs = jnp.asarray(np.array(spec.offsets, dtype=np.int64))[:, None]
    bins = _bins(spec, h)
    bytei = (bins >> U64(3)).astype(I64) + offs
    bit = (bins & U64(7)).astype(U32)
    b = (table[bytei].astype(U32) >> bit) & 1
    return jnp.min(b, axis=0).astype(jnp.uint16).reshape(hashes.shape)


# ---------------------------------------------------------------------------
# NibbleStorage (Count-Min sketch, 4-bit counters)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=0, donate_argnums=(1,))
def nibble_update(spec: SketchSpec, table, n_occupied, n_unique, hashes,
                  weights):
    """Batched NibbleStorage::add (reference storage.hh:324-363).

    Even bins use the high nibble, odd bins the low nibble
    (storage.hh:268-276)."""
    h = hashes.reshape(-1)
    w = weights.reshape(-1).astype(U32)
    n = h.shape[0]
    T = spec.n_tables
    offs = jnp.asarray(np.array(spec.offsets, dtype=np.int64))[:, None]
    bins = _bins(spec, h)
    bytei = (bins >> U64(1)).astype(I64) + offs
    oddb = (bins & U64(1)).astype(U32)  # 1 -> low nibble
    shift = jnp.where(oddb == 1, 0, 4).astype(U32)

    pre = (table[bytei].astype(U32) >> shift) & 0xF
    premin = jnp.min(pre, axis=0)

    key = bytei * 2 + oddb.astype(I64)  # global nibble index
    fkey = key.reshape(-1)
    fw = jnp.tile(w, T)
    fpre = pre.reshape(-1)
    s_key, s_w, first, seg, _, order = _segments(fkey, fw)
    m = jnp.zeros(T * n, dtype=U32).at[seg].add(s_w)  # per nibble segment
    prenib = jnp.zeros(T * n, dtype=U32).at[seg].set(fpre[order])
    newnib = jnp.minimum(prenib + m, spec.max_count)

    kb = s_key >> 1
    bfirst = jnp.concatenate([jnp.ones((1,), bool), kb[1:] != kb[:-1]])
    bseg = jnp.cumsum(bfirst) - 1
    # per distinct touched nibble (m>0): contribute value + clear-mask
    lane_seg_m = m[seg]
    active = first & (lane_seg_m > 0)
    lane_shift = jnp.where((s_key & 1) == 1, 0, 4).astype(U32)
    contrib = jnp.where(active, newnib[seg] << lane_shift, jnp.uint32(0))
    clear = jnp.where(active, jnp.uint32(0xF) << lane_shift, jnp.uint32(0))
    csum = jnp.zeros(T * n, dtype=U32).at[bseg].add(contrib)
    msum = jnp.zeros(T * n, dtype=U32).at[bseg].add(clear)
    dummy = jnp.int64(spec.total_bytes)
    ubyte = jnp.full(T * n, dummy, dtype=I64).at[bseg].set(kb)
    old = table[ubyte].astype(U32)
    newb = (old & ~msum) | csum
    table = table.at[ubyte].set(newb.astype(U8))

    # occupied: distinct table-0 nibbles going 0 -> nonzero
    t0_end = jnp.int64(spec.bytes_per_table[0]) * 2
    occ = jnp.sum(
        (first & (s_key < t0_end) & (prenib[seg] == 0) &
         (lane_seg_m > 0)).astype(U64))
    n_occupied = n_occupied + occ

    hs, _, hfirst, hseg, _, horder = _segments(h, w)
    hw = jnp.zeros(n, dtype=U32).at[hseg].add(w[horder])
    pm_first = jnp.zeros(n, dtype=U32).at[hseg].set(premin[horder])
    uniq = jnp.sum(((hw > 0) & (pm_first == 0)).astype(U64))
    n_unique = n_unique + uniq

    aux = {"premin": premin}
    return table, n_occupied, n_unique, aux


@partial(jax.jit, static_argnums=0)
def nibble_get(spec: SketchSpec, table, hashes):
    """Batched NibbleStorage::get_count (storage.hh:366-383)."""
    h = hashes.reshape(-1)
    offs = jnp.asarray(np.array(spec.offsets, dtype=np.int64))[:, None]
    bins = _bins(spec, h)
    bytei = (bins >> U64(1)).astype(I64) + offs
    shift = jnp.where((bins & U64(1)) == 1, 0, 4).astype(U32)
    v = (table[bytei].astype(U32) >> shift) & 0xF
    return jnp.min(v, axis=0).astype(jnp.uint16).reshape(hashes.shape)


UPDATE_FNS = {"byte": byte_update, "bit": bit_update, "nibble": nibble_update}
GET_FNS = {"byte": byte_get, "bit": bit_get, "nibble": nibble_get}
