"""Storage layer: device-resident sketches with khmer Storage semantics.

Mirrors the reference Storage hierarchy (include/oxli/storage.hh):
  * ByteStorage   — Count-Min sketch, 8-bit counters + bigcount escape map
  * BitStorage    — Bloom filter
  * NibbleStorage — Count-Min sketch, 4-bit counters

Unlike the reference (one malloc'd array per table, atomic per-k-mer RMW),
each storage here is ONE flat uint8 JAX array in device HBM (per-table byte
layout identical to the on-disk OXLI layout) updated by batched jitted
kernels from khmer_tpu.ops.sketch_ops.  The bigcount escape (counts beyond
255, reference storage.hh:610-621) stays a host-side sparse dict fed by
device-detected saturation triggers.
"""

import numpy as np

import jax.numpy as jnp

from khmer_tpu._config import MAX_BIGCOUNT, MAX_KCOUNT
from khmer_tpu.ops.sketch_ops import (
    GET_FNS,
    UPDATE_FNS,
    SketchSpec,
    alloc_table,
)

U64 = jnp.uint64
U32 = jnp.uint32


class Storage:
    """Base class for device sketches."""

    kind = None
    supports_bigcount = False

    def __init__(self, tablesizes, use_bigcount=False):
        tablesizes = tuple(int(t) for t in tablesizes)
        if not tablesizes:
            raise ValueError("empty tablesizes")
        self._use_bigcount = bool(use_bigcount) and self.supports_bigcount
        self.spec = SketchSpec(
            kind=self.kind,
            tablesizes=tablesizes,
            use_bigcount=self.supports_bigcount,
        )
        self.table = alloc_table(self.spec)
        self._n_occupied = jnp.zeros((), U64)
        self._n_unique = jnp.zeros((), U64)
        self.bigcounts = {}

    # -- geometry ---------------------------------------------------------

    def get_tablesizes(self):
        return list(self.spec.tablesizes)

    @property
    def n_tables(self):
        return self.spec.n_tables

    def n_occupied(self):
        return int(self._n_occupied)

    def n_unique_kmers(self):
        return int(self._n_unique)

    # -- bigcount ---------------------------------------------------------

    def set_use_bigcount(self, b):
        if b and not self.supports_bigcount:
            raise ValueError("bigcount is not supported for this storage type")
        self._use_bigcount = bool(b)

    def get_use_bigcount(self):
        return self._use_bigcount

    def _apply_bigcount_triggers(self, hashes, triggers):
        """Apply device-detected saturation escapes to the host sparse map.

        Sequential parity (reference storage.hh:610-621): the first trigger
        for a hash sets its bigcount to 256; each further trigger adds one,
        capped at MAX_BIGCOUNT."""
        nz = np.nonzero(triggers)[0]
        if nz.size == 0:
            return
        bc = self.bigcounts
        for i in nz:
            h = int(hashes[i])
            t = int(triggers[i])
            cur = bc.get(h, 0)
            if cur == 0:
                cur = MAX_KCOUNT + 1
                t -= 1
            bc[h] = min(cur + t, MAX_BIGCOUNT)

    def _overlay_bigcounts(self, counts, hashes):
        """Replace saturated counts with bigcount values (host side)."""
        if not self._use_bigcount or not self.bigcounts:
            return counts
        counts = np.array(counts, copy=True)
        flat = counts.reshape(-1)
        hs = np.asarray(hashes, dtype=np.uint64).reshape(-1)
        sat = np.nonzero(flat == MAX_KCOUNT)[0]
        for i in sat:
            v = self.bigcounts.get(int(hs[i]))
            if v is not None:
                flat[i] = v
        return flat.reshape(counts.shape)

    # -- update/query -----------------------------------------------------

    def add_batch(self, hashes, weights=None):
        """Add a batch of k-mer hashes; returns per-lane was-new bools."""
        hashes = jnp.asarray(hashes, dtype=U64)
        if weights is None:
            weights = jnp.ones(hashes.shape, dtype=U32)
        else:
            weights = jnp.asarray(weights, dtype=U32)
        update = UPDATE_FNS[self.kind]
        self.table, self._n_occupied, self._n_unique, aux = update(
            self.spec, self.table, self._n_occupied, self._n_unique,
            hashes.reshape(-1), weights.reshape(-1))
        if self._use_bigcount and "bigcount_hashes" in aux:
            self._apply_bigcount_triggers(
                np.asarray(aux["bigcount_hashes"]),
                np.asarray(aux["bigcount_triggers"]))
        return aux["premin"] == 0

    def update_stats(self, table, n_occupied, n_unique, aux):
        """Adopt results of an externally-run fused update kernel."""
        self.table = table
        self._n_occupied = n_occupied
        self._n_unique = n_unique
        if self._use_bigcount and "bigcount_hashes" in aux:
            self._apply_bigcount_triggers(
                np.asarray(aux["bigcount_hashes"]),
                np.asarray(aux["bigcount_triggers"]))

    def add(self, khash):
        """Single-hash add; returns True when the k-mer was unseen."""
        isnew = self.add_batch(jnp.asarray([khash], dtype=U64))
        return bool(isnew[0])

    def test_and_set_bits(self, khash):
        return 1 if self.add(khash) else 0

    def get_batch(self, hashes, with_bigcount=True):
        """Counts for a batch of hashes (numpy uint16)."""
        hashes = jnp.asarray(hashes, dtype=U64)
        counts = np.asarray(GET_FNS[self.kind](self.spec, self.table, hashes))
        if with_bigcount and self.kind == "byte":
            counts = self._overlay_bigcounts(counts, hashes)
        return counts

    def get_batch_device(self, hashes):
        """Counts on device (no bigcount overlay)."""
        return GET_FNS[self.kind](self.spec, self.table, hashes)

    def get(self, khash):
        return int(self.get_batch(jnp.asarray([khash], dtype=U64))[0])

    get_count = get

    # -- host access ------------------------------------------------------

    def raw_bytes(self):
        """All table bytes (without the trailing dummy), host numpy."""
        return np.asarray(self.table)[: self.spec.total_bytes]

    def set_raw_bytes(self, data, n_occupied=0):
        data = np.asarray(data, dtype=np.uint8)
        if data.size != self.spec.total_bytes:
            raise ValueError("raw byte size mismatch")
        self.table = jnp.asarray(
            np.concatenate([data, np.zeros(1, np.uint8)]))
        self._n_occupied = jnp.asarray(n_occupied, U64)
        self._n_unique = jnp.zeros((), U64)


class BitStorage(Storage):
    """Bloom filter (reference storage.hh:99-233)."""

    kind = "bit"

    def update_from(self, other):
        """Bitwise union of two same-geometry Bloom filters
        (reference src/oxli/storage.cc:63-96)."""
        if self.spec.tablesizes != other.spec.tablesizes:
            raise ValueError("both nodegraphs must have same table sizes")
        mine = self.raw_bytes()
        theirs = other.raw_bytes()
        merged = mine | theirs
        t0 = self.spec.bytes_per_table[0]
        newly = np.bitwise_xor(mine[:t0], merged[:t0])
        occ = int(self._n_occupied) + int(
            np.unpackbits(newly).sum())
        n_uniq = self._n_unique
        self.set_raw_bytes(merged, occ)
        self._n_unique = n_uniq  # update_from does not adjust n_unique


class ByteStorage(Storage):
    """Count-Min sketch with 8-bit counters + bigcount (storage.hh:485-664)."""

    kind = "byte"
    supports_bigcount = True

    def __init__(self, tablesizes, use_bigcount=False):
        super().__init__(tablesizes, use_bigcount=use_bigcount)


class NibbleStorage(Storage):
    """Count-Min sketch with 4-bit counters (storage.hh:249-409)."""

    kind = "nibble"


def storage_for_filetype(ht_type):
    from khmer_tpu.io import oxli_format as f

    return {
        f.SAVED_COUNTING_HT: ByteStorage,
        f.SAVED_HASHBITS: BitStorage,
        f.SAVED_SMALLCOUNT: NibbleStorage,
    }[ht_type]
