"""Storage layer: device-resident sketches with khmer Storage semantics.

Mirrors the reference Storage hierarchy (include/oxli/storage.hh):
  * ByteStorage   — Count-Min sketch, 8-bit counters + bigcount escape
  * BitStorage    — Bloom filter
  * NibbleStorage — Count-Min sketch, 4-bit counters

Unlike the reference (one malloc'd array per table, atomic per-k-mer
saturating RMW), each storage here is ONE flat uint32 working array in
device HBM updated by a single wrap-free scatter-add per batch; each
kind's saturation cap is applied at read time, which is provably equal
to the reference's saturating increments (see khmer_tpu/ops/sketch_ops).

bigcount: counts past 255 need no side structure at runtime (the uint32
total is simply capped at 65535 on reads).  The OXLI file format's
sparse bigcount section is reconstructed at save time from a host-side
candidate set of hashes whose table-0 bin crossed 255; a bigcount map
loaded *from* a file overlays saturated reads exactly as the reference
does (storage.hh:631-653).
"""

import numpy as np

import jax
import jax.numpy as jnp

from khmer_tpu._config import MAX_BIGCOUNT, MAX_KCOUNT
from khmer_tpu.ops.sketch_ops import (
    SketchSpec,
    alloc_table,
    occupied_bins,
    pack_oxli_bytes,
    sketch_get,
    sketch_update,
    unpack_oxli_bytes,
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
            raise ValueError(
                "tablesizes needs to be one or more numbers")
        self._use_bigcount = bool(use_bigcount) and self.supports_bigcount
        self.spec = SketchSpec(
            kind=self.kind,
            tablesizes=tablesizes,
            use_bigcount=self.supports_bigcount,
        )
        self.table = alloc_table(self.spec)
        # virgin = table known all-zero: bulk flushes skip the premin
        # gather entirely (every distinct key is new) — the fast path
        # for load-into-counting-style fresh-table consumes
        self._virgin = True
        self._n_unique = jnp.zeros((), U64)
        # hashes that may exceed 255 (superset; resolved at save time)
        self.bigcount_candidates = set()
        # bigcount map loaded from an OXLI file (overlays capped reads)
        self.bigcounts = {}

    # -- geometry ---------------------------------------------------------

    def get_tablesizes(self):
        return list(self.spec.tablesizes)

    @property
    def n_tables(self):
        return self.spec.n_tables

    def n_occupied(self):
        if self._loaded_occupied is not None:
            return self._loaded_occupied
        return int(occupied_bins(self.spec, self.table))

    _loaded_occupied = None

    def n_unique_kmers(self):
        return int(self._n_unique)

    def is_virgin(self):
        """True while the table is known to be all-zero (nothing has
        been added or loaded since construction)."""
        return self._virgin

    def mark_dirty(self):
        self._virgin = False

    # -- bigcount ---------------------------------------------------------

    def set_use_bigcount(self, b):
        if b and not self.supports_bigcount:
            raise ValueError("bigcount is not supported for this storage type")
        self._use_bigcount = bool(b)

    def get_use_bigcount(self):
        return self._use_bigcount

    def _read_spec(self):
        """Spec whose read cap honors the current bigcount toggle."""
        if self.spec.use_bigcount != self._use_bigcount:
            return SketchSpec(self.spec.kind, self.spec.tablesizes,
                              self._use_bigcount)
        return self.spec

    def _track_bigcount_aux(self, aux, hashes=None):
        if "bigcount_hashes" in aux and self._use_bigcount:
            valid = np.asarray(aux["bigcount_valid"])
            if valid.any():
                hs = np.asarray(aux["bigcount_hashes"])[valid]
                self.bigcount_candidates.update(int(x) for x in np.unique(hs))
            if bool(aux.get("bigcount_overflow", False)):
                # more distinct 255-crossing hashes in one batch than
                # candidate lanes: recover EXACTLY from the batch
                # itself — bins hold true totals (saturation applies
                # at read), so every batch hash now above MAX_KCOUNT
                # is a candidate.  Silent loss is not an option: the
                # OXLI bigcount save section must be complete.
                if hashes is None:
                    raise RuntimeError(
                        "bigcount candidate budget overflowed and the "
                        "batch hashes are unavailable for exact "
                        "recovery (raise BIGCOUNT_LANES)")
                hs = np.unique(np.asarray(hashes, np.uint64).reshape(-1))
                counts = np.asarray(sketch_get(
                    SketchSpec(self.spec.kind, self.spec.tablesizes, True),
                    self.table, jnp.asarray(hs)))
                self.bigcount_candidates.update(
                    int(h) for h, c in zip(hs, counts) if c > MAX_KCOUNT)

    def resolved_bigcounts(self):
        """Exact {hash: count} for counts in (255, 65535] — the OXLI
        bigcount section.  Merges live candidates with any map loaded
        from disk."""
        out = dict(self.bigcounts)
        if self.bigcount_candidates:
            cand = np.fromiter(self.bigcount_candidates, np.uint64,
                               len(self.bigcount_candidates))
            counts = np.asarray(sketch_get(
                SketchSpec(self.spec.kind, self.spec.tablesizes, True),
                self.table, jnp.asarray(cand)))
            for h, c in zip(cand, counts):
                if c > MAX_KCOUNT:
                    out[int(h)] = min(int(c), MAX_BIGCOUNT)
        return out

    def _overlay_bigcounts(self, counts, hashes):
        """Overlay a *loaded* bigcount map onto capped reads."""
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
        """Add a batch of k-mer hashes; returns per-lane was-new bools
        with the reference's exact sequential semantics (an occurrence
        is new iff some table bin was zero immediately before its
        insert — storage.hh:176-203; lane order is insertion order).

        Lanes are padded to a power-of-two bucket (zero weights) so
        arbitrary batch sizes reuse a handful of compiled shapes —
        every new XLA shape costs a fresh compile."""
        hashes = np.asarray(hashes, np.uint64).reshape(-1)
        n = hashes.shape[0]
        if weights is None:
            weights = np.ones(n, np.uint32)
        else:
            weights = np.asarray(weights, np.uint32).reshape(-1)
        bucket = max(1 << max(n - 1, 0).bit_length(), 64)
        if bucket != n:
            hashes = np.concatenate(
                [hashes, np.zeros(bucket - n, np.uint64)])
            weights = np.concatenate(
                [weights, np.zeros(bucket - n, np.uint32)])
        self.table, _, self._n_unique, aux = sketch_update(
            self.spec, self.table, jnp.zeros((), U64), self._n_unique,
            jax.device_put(hashes), jax.device_put(weights))
        self._loaded_occupied = None
        self._virgin = False
        self._track_bigcount_aux(aux, hashes=hashes[:n])
        self._mirror_host_add(hashes[:n], weights[:n])
        return aux["is_new"][:n]

    def _mirror_host_add(self, hashes, weights):
        """Keep the host count snapshot (host_counts) coherent across
        add_batch WITHOUT re-fetching the table: apply the identical
        u32 bin adds to the numpy mirror and re-pin its version.
        No-op when no snapshot exists."""
        if getattr(self, "_host_table", None) is None:
            return
        sizes = np.asarray(self.spec.tablesizes, np.uint64)
        offs = np.asarray(self.spec.bin_offsets, np.int64)
        idx = (hashes[None, :] % sizes[:, None]).astype(np.int64) \
            + offs[:, None]
        np.add.at(self._host_table, idx.reshape(-1),
                  np.tile(weights.astype(np.uint32), len(sizes)))
        self._host_version = self.table

    def update_stats(self, table, n_occupied, n_unique, aux):
        """Adopt results of an externally-run fused update kernel."""
        self.table = table
        self._n_unique = n_unique
        self._loaded_occupied = None
        self._virgin = False
        self._track_bigcount_aux(aux)

    def add(self, khash):
        """Single-hash add; returns True when the k-mer was unseen."""
        isnew = self.add_batch(jnp.asarray([khash], dtype=U64))
        return bool(isnew[0])

    def test_and_set_bits(self, khash):
        return 1 if self.add(khash) else 0

    def get_batch(self, hashes, with_bigcount=True):
        """Counts for a batch of hashes (numpy uint16)."""
        hashes = jnp.asarray(hashes, dtype=U64)
        counts = np.asarray(
            sketch_get(self._read_spec(), self.table, hashes))
        if with_bigcount and self.kind == "byte":
            counts = self._overlay_bigcounts(counts, hashes)
        return counts

    def get_batch_device(self, hashes):
        """Counts on device (no loaded-map overlay)."""
        return sketch_get(self._read_spec(), self.table, hashes)

    def shard_table(self, mesh=None, axis="shard"):
        """Distribute the flat bin array across a device mesh along
        the BIN axis: per-device memory drops to ~1/S of the sketch,
        and every existing kernel — gather reads, scatter updates,
        deferred flushes, traversal's 8-way probes, partition BFS
        membership — runs UNCHANGED under jit, with XLA inserting the
        collectives (sharding propagation).  This is the
        capacity-scaling layout for graphs larger than one device's
        HBM; P7/P3 in SURVEY §2d.  The tail is zero-padded to a
        multiple of the mesh size (reads never index past total_bins;
        the scatter dummy lane stays in range)."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), (axis,))
        S = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        n = int(self.table.shape[0])
        pad = (-n) % S
        table = self.table
        if pad:
            table = jnp.concatenate(
                [table, jnp.zeros((pad,), table.dtype)])
        spec = PartitionSpec(*mesh.axis_names)
        self.table = jax.device_put(table, NamedSharding(mesh, spec))
        return self.table.sharding

    def get(self, khash):
        return int(self.get_batch(jnp.asarray([khash], dtype=U64))[0])

    get_count = get

    # -- host-side snapshot reads (for pointer-chasing algorithms) --------

    _host_table = None
    _host_version = None

    def host_counts(self, hashes):
        """Counts computed against a host numpy snapshot of the table —
        for algorithms that need thousands of tiny random lookups (the
        ReadAligner's A* search) where per-query device round trips
        dominate.  The snapshot refreshes whenever the device table
        object changes."""
        if self._host_table is None or self._host_version is not self.table:
            self._host_table = np.asarray(self.table)
            self._host_version = self.table
        h = np.asarray(hashes, np.uint64).reshape(-1)
        sizes = np.asarray(self.spec.tablesizes, np.uint64)
        offs = np.asarray(self.spec.bin_offsets, np.int64)
        idx = (h[None, :] % sizes[:, None]).astype(np.int64) + offs[:, None]
        tot = self._host_table[idx].min(axis=0)
        return np.minimum(tot, self._read_spec().read_cap)

    # -- host access ------------------------------------------------------

    def raw_bytes(self):
        """All table bytes in OXLI on-disk layout, host numpy.

        Sparse tables (the common case — occupancy is kept well below
        the FP kill switches) fetch only the occupied (bin, value)
        pairs and assemble the stream host-side: a few MB over the
        wire instead of the full table."""
        from khmer_tpu.ops.sketch_ops import sparse_raw_bytes

        nz = int(jnp.sum(self.table != 0))
        if nz * 12 * 2 < self.spec.total_bytes \
                and self.spec.total_bins < 0xFFFFFFFF:
            return sparse_raw_bytes(self.spec, self.table, nz)
        return np.asarray(pack_oxli_bytes(self.spec, self.table))

    def set_raw_bytes(self, data, n_occupied=0):
        data = np.asarray(data, dtype=np.uint8)
        if data.size != self.spec.total_bytes:
            raise ValueError("raw byte size mismatch")
        self.table = unpack_oxli_bytes(self.spec, data)
        self._n_unique = jnp.zeros((), U64)
        self._loaded_occupied = int(n_occupied)
        self._virgin = False
        self.bigcount_candidates = set()


class BitStorage(Storage):
    """Bloom filter (reference storage.hh:99-233)."""

    kind = "bit"

    def update_from(self, other):
        """Union of two same-geometry Bloom filters
        (reference src/oxli/storage.cc:63-96)."""
        if self.spec.tablesizes != other.spec.tablesizes:
            raise ValueError("both nodegraphs must have same table sizes")
        self.table = jnp.maximum(self.table, other.table)
        self._loaded_occupied = None
        self._virgin = False
        # update_from does not adjust n_unique (reference behavior)


class ByteStorage(Storage):
    """Count-Min sketch with 8-bit counters + bigcount (storage.hh:485-664)."""

    kind = "byte"
    supports_bigcount = True


class NibbleStorage(Storage):
    """Count-Min sketch with 4-bit counters (storage.hh:249-409)."""

    kind = "nibble"


class QFStorage:
    """Counting-quotient-filter storage with the reference's counting
    semantics (storage.hh:417-462 over third-party/cqf/gqf.c).

    The CQF stores the full key (quotient + remainder), so it behaves
    as an EXACT multiset over the key space `khash % range` where
    range = nslots * 2^bits_per_slot (qf_init, gqf.c:1367-1398;
    bits_per_slot = 8 for khmer's key_bits = q+8).  The slot-shifting
    insert is inherently sequential, so the TPU-native equivalent is a
    sorted (key, count) dictionary: batches are deduplicated with a
    sort + segment-sum and merged into the sorted arrays; queries are
    a vectorized binary search.  Counts are exact for every key —
    bit-identical to qf_count_key_value — and get() applies the same
    uint16 narrowing as the reference's BoundedCounterType return."""

    kind = "qf"
    supports_bigcount = False
    MIN_FLUSH = 1 << 18

    def __init__(self, size, slot_size=None, on_disk=None):
        import math

        size = int(size)
        if size <= 0 or size & (size - 1):
            raise ValueError("QF size must be a power of two")
        self.nslots = size
        # onDiskMQF analogue (third-party/MQF/onDiskMQF.h): with a
        # spill directory, the sorted arrays live in disk-backed
        # memmaps — queries page lazily, so the filter can exceed RAM
        self.on_disk = on_disk
        self._gen = 0
        # key space per qf_init: range = nslots << key_remainder_bits.
        # The classic CQF constructor uses key_bits = q+8 (remainder 8,
        # storage.hh:428); the fork's MQF constructor passes the slot
        # size explicitly (create_MQFGraph, khmer_args.py:548-598)
        self.rem_bits = int(slot_size) if slot_size else 8
        self.range = np.uint64(size) << np.uint64(self.rem_bits)
        # xnslots = nslots + 10*sqrt(nslots) (gqf.c:1372)
        self.xnslots = size + int(10 * math.sqrt(size))
        self.slot_size = slot_size  # MQF remainder width (fork N5)
        self._keys = np.zeros(0, np.uint64)
        self._counts = np.zeros(0, np.uint64)
        self._pending = []
        self._pending_n = 0

    # -- geometry ---------------------------------------------------------

    def get_tablesizes(self):
        # reference get_tablesizes returns {xnslots}
        return [self.xnslots]

    @property
    def n_tables(self):
        return 1

    def n_occupied(self):
        # reference: noccupied_slots; 1 slot per distinct key plus
        # counter-escape slots for repeated keys — approximated by the
        # dominant term (distinct keys)
        self._flush()
        return int(self._keys.shape[0])

    def n_unique_kmers(self):
        # reference: ndistinct_elts — exact here
        self._flush()
        return int(self._keys.shape[0])

    def set_use_bigcount(self, b):
        if b:
            raise ValueError("bigcount is not supported for this storage "
                             "type")

    def get_use_bigcount(self):
        return False

    # -- update/query -----------------------------------------------------

    def _reduce(self, keys, weights):
        """Sort + segment-sum a raw (keys, weights) batch."""
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        weights = weights[order]
        uniq, first = np.unique(keys, return_index=True)
        sums = np.add.reduceat(weights, first)
        return uniq, sums.astype(np.uint64)

    def _flush(self):
        if not self._pending:
            return
        keys = np.concatenate([k for k, _ in self._pending])
        ws = np.concatenate([w for _, w in self._pending])
        self._pending = []
        self._pending_n = 0
        uk, us = self._reduce(keys, ws)
        if self._keys.shape[0] == 0:
            self._adopt(uk, us)
            return
        mk = np.concatenate([self._keys, uk])
        mw = np.concatenate([self._counts, us])
        self._adopt(*self._reduce(mk, mw))

    def _adopt(self, keys, counts):
        """Adopt merged sorted arrays; in on-disk mode they spill to
        alternating-generation memmap files so the resident set stays
        page-cache-managed (the stxxl/onDiskMQF role)."""
        if self.on_disk is None:
            self._keys, self._counts = keys, counts
            return
        import os

        os.makedirs(self.on_disk, exist_ok=True)
        self._gen ^= 1
        n = keys.shape[0]
        kp = os.path.join(self.on_disk, "qf_keys.%d.bin" % self._gen)
        cp = os.path.join(self.on_disk, "qf_counts.%d.bin" % self._gen)
        mk = np.memmap(kp, np.uint64, "w+", shape=(max(n, 1),))
        mc = np.memmap(cp, np.uint64, "w+", shape=(max(n, 1),))
        mk[:n] = keys
        mc[:n] = counts
        mk.flush()
        mc.flush()
        self._keys = np.memmap(kp, np.uint64, "r", shape=(n,))
        self._counts = np.memmap(cp, np.uint64, "r", shape=(n,))

    def _lookup(self, keys):
        """Counts for already-reduced key values (exact)."""
        if self._keys.shape[0] == 0:
            return np.zeros(keys.shape, np.uint64)
        idx = np.searchsorted(self._keys, keys)
        idx = np.minimum(idx, self._keys.shape[0] - 1)
        found = self._keys[idx] == keys
        return np.where(found, self._counts[idx], np.uint64(0))

    def add_batch(self, hashes, weights=None):
        """Add a batch of hashes; returns per-lane was-new bools
        (reference add: get_count() == 0 before the insert)."""
        hashes = np.asarray(hashes, np.uint64).reshape(-1)
        keys = hashes % self.range
        if weights is None:
            weights = np.ones(keys.shape, np.uint64)
        else:
            weights = np.asarray(weights, np.uint64).reshape(-1)
            keep = weights > 0
            if not keep.all():
                keys = keys[keep]
                weights = weights[keep]
                hashes = hashes[keep]
        self._flush()
        # was-new per lane: absent from the table AND first occurrence
        # of the key within this batch
        present = self._lookup(keys) > 0
        order = np.argsort(keys, kind="stable")
        first_lane = np.zeros(keys.shape, bool)
        sk = keys[order]
        fmask = np.ones(sk.shape, bool)
        fmask[1:] = sk[1:] != sk[:-1]
        first_lane[order] = fmask
        was_new = (~present) & first_lane
        self._pending.append((keys, weights))
        self._pending_n += keys.shape[0]
        if self._pending_n >= max(self.MIN_FLUSH,
                                  self._keys.shape[0] // 2):
            self._flush()
        return was_new

    def add_batch_fast(self, hashes, weights=None):
        """Bulk add without was-new accounting (consume hot path)."""
        hashes = np.asarray(hashes, np.uint64).reshape(-1)
        keys = hashes % self.range
        if weights is None:
            weights = np.ones(keys.shape, np.uint64)
        else:
            weights = np.asarray(weights, np.uint64).reshape(-1)
            keep = weights > 0
            if not keep.all():
                keys = keys[keep]
                weights = weights[keep]
        self._pending.append((keys, weights))
        self._pending_n += keys.shape[0]
        if self._pending_n >= max(self.MIN_FLUSH,
                                  self._keys.shape[0] // 2):
            self._flush()

    def add(self, khash):
        return bool(self.add_batch(np.asarray([khash], np.uint64))[0])

    def test_and_set_bits(self, khash):
        return 1 if self.add(khash) else 0

    def get_batch(self, hashes, with_bigcount=True):
        """Counts (uint16-narrowed, matching BoundedCounterType)."""
        del with_bigcount
        self._flush()
        hashes = np.asarray(hashes, np.uint64).reshape(-1)
        counts = self._lookup(hashes % self.range)
        return (counts & np.uint64(0xFFFF)).astype(np.uint16)

    def get_batch_device(self, hashes):
        return jnp.asarray(self.get_batch(np.asarray(hashes)))

    def get(self, khash):
        return int(self.get_batch(np.asarray([khash], np.uint64))[0])

    get_count = get

    def host_counts(self, hashes):
        return self.get_batch(hashes)

    # -- save/load payload ------------------------------------------------

    def state_arrays(self):
        self._flush()
        return self._keys, self._counts

    def set_state_arrays(self, keys, counts):
        self._keys = np.asarray(keys, np.uint64)
        self._counts = np.asarray(counts, np.uint64)
        self._pending = []
        self._pending_n = 0


def storage_for_filetype(ht_type):
    from khmer_tpu.io import oxli_format as f

    return {
        f.SAVED_COUNTING_HT: ByteStorage,
        f.SAVED_HASHBITS: BitStorage,
        f.SAVED_SMALLCOUNT: NibbleStorage,
        f.SAVED_QFCOUNT: QFStorage,
    }[ht_type]
