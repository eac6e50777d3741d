"""OXLI binary file formats — byte-exact save/load.

Format spec: reference doc/dev/binary-file-formats.rst and the writer
implementations in src/oxli/storage.cc (ByteStorage/BitStorage/Nibble
Storage save/load) and src/oxli/hashgraph.cc:257-292 (tagset/stoptags).

All integers little-endian.  Layout per structure:

Countgraph (SAVED_COUNTING_HT=1):
  "OXLI" | u8 version=4 | u8 type | u8 use_bigcount | u32 ksize |
  u8 n_tables | u64 occupied | per table: u64 size + size bytes |
  u64 n_bigcounts | n * (u64 hash, u16 count)

Nodegraph (SAVED_HASHBITS=2):
  "OXLI" | u8 version=4 | u8 type | u32 ksize | u8 n_tables |
  u64 occupied | per table: u64 size_bits + (size//8+1) bytes

SmallCountgraph (SAVED_SMALLCOUNT=7): like Nodegraph header (no bigcount
  byte), per table u64 size + (size//2+1) bytes.

Tagset/Stoptags (SAVED_TAGS=3 / SAVED_STOPTAGS=4):
  "OXLI" | u8 version=4 | u8 type | u32 ksize | u64 n_tags | n*u64 hashes
"""

import gzip
import struct

import numpy as np

SAVED_SIGNATURE = b"OXLI"
SAVED_FORMAT_VERSION = 4
SAVED_COUNTING_HT = 1
SAVED_HASHBITS = 2
SAVED_TAGS = 3
SAVED_STOPTAGS = 4
SAVED_SUBSET = 5
SAVED_LABELSET = 6
SAVED_SMALLCOUNT = 7
SAVED_QFCOUNT = 8

FILETYPES = {
    "COUNTING_HT": SAVED_COUNTING_HT,
    "HASHBITS": SAVED_HASHBITS,
    "TAGS": SAVED_TAGS,
    "STOPTAGS": SAVED_STOPTAGS,
    "SUBSET": SAVED_SUBSET,
    "LABELSET": SAVED_LABELSET,
    "SMALLCOUNT": SAVED_SMALLCOUNT,
    "QFCOUNT": SAVED_QFCOUNT,
}


class OxliFileError(OSError):
    pass


def _open_out(filename):
    if str(filename).endswith(".gz"):
        return gzip.open(filename, "wb")
    return open(filename, "wb")


def _open_in(filename):
    if str(filename).endswith(".gz"):
        return gzip.open(filename, "rb")
    f = open(filename, "rb")
    # transparently handle gzip content without .gz suffix
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        f.close()
        return gzip.open(filename, "rb")
    return f


def _read_exact(f, n, filename):
    data = f.read(n)
    if len(data) != n:
        raise OxliFileError(
            "Unexpected end of k-mer file: {}".format(filename))
    return data


def _check_header(f, filename, expected_type, kind="k-mer count"):
    sig = _read_exact(f, 4, filename)
    if sig != SAVED_SIGNATURE:
        raise OxliFileError(
            "Does not start with signature for a oxli file: {!r} "
            "Should be: OXLI".format(sig))
    (version,) = struct.unpack("B", _read_exact(f, 1, filename))
    (ht_type,) = struct.unpack("B", _read_exact(f, 1, filename))
    if version != SAVED_FORMAT_VERSION:
        raise OxliFileError(
            "Incorrect file format version {} while reading {} file from "
            "{}; should be {}".format(version, kind, filename,
                                      SAVED_FORMAT_VERSION))
    if ht_type != expected_type:
        raise OxliFileError(
            "Incorrect file format type {} while reading {} file from "
            "{}".format(ht_type, kind, filename))
    return version, ht_type


# ---------------------------------------------------------------------------
# table storages
# ---------------------------------------------------------------------------


def save_storage(filename, ksize, storage):
    """Save a Byte/Bit/Nibble/QF storage in OXLI format."""
    kind = storage.kind
    if kind == "qf":
        # SAVED_QFCOUNT: the reference's RAW MQF block dump
        # (QFStorage::save storage.cc:919-936 — sig, version, type,
        # 1-byte ksize, 192-byte qfmetadata, RSQF blocks); encoded by
        # io/mqf_format.py and verified bidirectionally against the
        # reference's own MQF library in tests/test_qf.py.
        from khmer_tpu.io.mqf_format import write_qf_dump

        keys, counts = storage.state_arrays()
        with _open_out(filename) as f:
            f.write(SAVED_SIGNATURE)
            f.write(struct.pack("BB", SAVED_FORMAT_VERSION,
                                SAVED_QFCOUNT))
            write_qf_dump(f, int(ksize), keys, counts,
                          storage.nslots, storage.rem_bits)
        return
    raw = storage.raw_bytes()
    sizes = storage.spec.tablesizes
    bpt = storage.spec.bytes_per_table
    with _open_out(filename) as f:
        f.write(SAVED_SIGNATURE)
        if kind == "byte":
            f.write(struct.pack("BBB", SAVED_FORMAT_VERSION,
                                SAVED_COUNTING_HT,
                                1 if storage.get_use_bigcount() else 0))
        elif kind == "bit":
            f.write(struct.pack("BB", SAVED_FORMAT_VERSION, SAVED_HASHBITS))
        elif kind == "nibble":
            f.write(struct.pack("BB", SAVED_FORMAT_VERSION, SAVED_SMALLCOUNT))
        else:
            raise ValueError(kind)
        f.write(struct.pack("<IBQ", int(ksize), len(sizes),
                            storage.n_occupied()))
        off = 0
        for size, nbytes in zip(sizes, bpt):
            f.write(struct.pack("<Q", size))
            f.write(raw[off: off + nbytes].tobytes())
            off += nbytes
        if kind == "byte":
            bc = storage.resolved_bigcounts()
            f.write(struct.pack("<Q", len(bc)))
            # canonical deterministic order: sorted by hash (matches the
            # khmer-2.x std::map serialization order)
            for h in sorted(bc):
                f.write(struct.pack("<QH", h, bc[h]))


def load_storage(filename, expected_kinds=("byte", "bit", "nibble")):
    """Load an OXLI table file; returns (storage, ksize)."""
    try:
        return _load_storage(filename, expected_kinds)
    except EOFError as err:
        # a truncated gzip stream must fail like any truncated file
        # (reference raises khmer_file_exception -> OSError)
        raise OSError("truncated compressed file {!r}: {}".format(
            filename, err))


def _load_storage(filename, expected_kinds):
    from khmer_tpu.storage import (BitStorage, ByteStorage, NibbleStorage,
                                   QFStorage)

    with _open_in(filename) as f:
        sig = _read_exact(f, 4, filename)
        if sig != SAVED_SIGNATURE:
            raise OxliFileError(
                "Does not start with signature for a oxli file: {!r} "
                "Should be: OXLI".format(sig))
        (version,) = struct.unpack("B", _read_exact(f, 1, filename))
        (ht_type,) = struct.unpack("B", _read_exact(f, 1, filename))
        if version != SAVED_FORMAT_VERSION:
            raise OxliFileError(
                "Incorrect file format version {} while reading k-mer file "
                "from {}; should be {}".format(version, filename,
                                               SAVED_FORMAT_VERSION))
        if ht_type == SAVED_QFCOUNT:
            if "qf" not in expected_kinds:
                raise OxliFileError(
                    "Incorrect file format type {} while reading k-mer "
                    "file from {}".format(ht_type, filename))
            from khmer_tpu.io.mqf_format import (MQFFormatError,
                                                 parse_metadata)

            (ksize,) = struct.unpack("B", _read_exact(f, 1, filename))
            blob = f.read(192)
            if len(blob) < 16:
                raise OxliFileError(
                    "Truncated QF section in {}".format(filename))
            try:
                # the reference's raw MQF dump (io/mqf_format.py)
                meta = parse_metadata(blob)
            except MQFFormatError:
                # round-1 legacy payload: nslots u64, n u64, keys,
                # counts (still readable for old saves)
                nslots, n_entries = struct.unpack("<QQ", blob[:16])
                rest = blob[16:] + f.read()
                keys = np.frombuffer(
                    rest[: 8 * n_entries], np.uint64)
                counts = np.frombuffer(
                    rest[8 * n_entries: 16 * n_entries], np.uint64)
                store = QFStorage(nslots)
                store.set_state_arrays(keys.copy(), counts.copy())
                return store, ksize
            from khmer_tpu.io.mqf_format import decode_blocks

            region = _read_exact(f, meta["size"], filename)
            keys, counts = decode_blocks(meta, region)
            # DECISION RECORD — LayeredMQF (round-3 VERDICT #10): the
            # fork's two-level filter (third-party/MQF/LayeredMQF.h)
            # is NOT ported.  Its serialize/deserialize are commented
            # out in the fork itself (LayeredMQF.cpp:122-128), so no
            # on-disk layered dump can exist, and the class is
            # unreachable from the reference's Python layer.  A file
            # carrying extra payload after the single QF block region
            # (the only plausible layered encoding) is refused loudly
            # rather than silently half-loaded.
            trailer = f.read(1)
            if trailer:
                raise OxliFileError(
                    "unexpected trailing payload after the QF block "
                    "region in {} — layered/multi-level MQF dumps are "
                    "not supported (see docs/PARITY.md, LayeredMQF "
                    "decision record)".format(filename))
            slot = meta["key_remainder_bits"]
            store = QFStorage(meta["nslots"],
                              None if slot == 8 else slot)
            store.set_state_arrays(keys, counts)
            return store, ksize
        kind = {SAVED_COUNTING_HT: "byte", SAVED_HASHBITS: "bit",
                SAVED_SMALLCOUNT: "nibble"}.get(ht_type)
        if kind is None or kind not in expected_kinds:
            raise OxliFileError(
                "Incorrect file format type {} while reading k-mer file "
                "from {}".format(ht_type, filename))
        use_bigcount = 0
        if kind == "byte":
            (use_bigcount,) = struct.unpack(
                "B", _read_exact(f, 1, filename))
        ksize, n_tables, occupied = struct.unpack(
            "<IBQ", _read_exact(f, 13, filename))
        sizes = []
        chunks = []
        for _ in range(n_tables):
            (size,) = struct.unpack("<Q", _read_exact(f, 8, filename))
            sizes.append(size)
            if kind == "byte":
                nbytes = size
            elif kind == "bit":
                nbytes = size // 8 + 1
            else:
                nbytes = size // 2 + 1
            chunks.append(np.frombuffer(
                _read_exact(f, nbytes, filename), dtype=np.uint8))
        cls = {"byte": ByteStorage, "bit": BitStorage,
               "nibble": NibbleStorage}[kind]
        store = cls(sizes)
        store.set_raw_bytes(np.concatenate(chunks), occupied)
        if kind == "byte":
            store.set_use_bigcount(bool(use_bigcount))
            (n_counts,) = struct.unpack("<Q", _read_exact(f, 8, filename))
            if n_counts:
                data = _read_exact(f, 10 * n_counts, filename)
                for i in range(n_counts):
                    h, c = struct.unpack_from("<QH", data, 10 * i)
                    store.bigcounts[h] = c
    return store, ksize


# ---------------------------------------------------------------------------
# tagsets / stoptags (sets of uint64 hashes)
# ---------------------------------------------------------------------------


def save_hashset(filename, ksize, hashes, ht_type=SAVED_TAGS,
                 tag_density=None):
    """Save a tagset/stoptags file.

    Tagset layout (reference hashgraph.cc:257-290): header | u32 ksize |
    u64 n_tags | u32 tag_density | sorted hashes.  Stoptags (hashgraph.cc:
    1371-1396) omit the density field.  Hash order is sorted (the
    reference's SeenSet is an ordered std::set).
    """
    hashes = sorted(int(h) for h in hashes)
    with _open_out(filename) as f:
        f.write(SAVED_SIGNATURE)
        f.write(struct.pack("BB", SAVED_FORMAT_VERSION, ht_type))
        f.write(struct.pack("<IQ", int(ksize), len(hashes)))
        if ht_type == SAVED_TAGS:
            from khmer_tpu._config import DEFAULT_TAG_DENSITY

            if tag_density is None:
                tag_density = DEFAULT_TAG_DENSITY
            f.write(struct.pack("<I", int(tag_density)))
        f.write(np.asarray(hashes, dtype="<u8").tobytes())


def load_hashset(filename, ht_type=SAVED_TAGS):
    """Load a tagset/stoptags file; returns (ksize, hashes, tag_density)."""
    with _open_in(filename) as f:
        _check_header(f, filename, ht_type, kind="tagset")
        ksize, n = struct.unpack("<IQ", _read_exact(f, 12, filename))
        density = None
        if ht_type == SAVED_TAGS:
            (density,) = struct.unpack("<I", _read_exact(f, 4, filename))
        data = _read_exact(f, 8 * n, filename)
        hashes = np.frombuffer(data, dtype="<u8")
    return ksize, hashes, density
