"""Storage-layer semantics tests: saturation, bigcount, occupancy,
n_unique, bit/nibble packing, OXLI save/load round trips."""

import numpy as np
import pytest

from khmer_tpu.storage import BitStorage, ByteStorage, NibbleStorage


PRIMES = [101, 103, 107, 109]


def test_byte_add_get_single():
    st = ByteStorage(PRIMES)
    assert st.get(42) == 0
    assert st.add(42) is True
    assert st.get(42) == 1
    assert st.add(42) is False
    assert st.get(42) == 2
    assert st.n_unique_kmers() == 1
    assert st.n_occupied() == 1


def test_byte_saturation():
    st = ByteStorage([101])
    h = np.full(300, 7, np.uint64)
    st.add_batch(h)
    assert st.get(7) == 255  # saturates at MAX_KCOUNT


def test_byte_bigcount():
    st = ByteStorage([101, 103])
    st.set_use_bigcount(True)
    h = np.full(300, 7, np.uint64)
    st.add_batch(h)
    assert st.get(7) == 300
    st.add_batch(np.full(70000, 7, np.uint64))
    assert st.get(7) == 65535  # caps at MAX_BIGCOUNT


def test_byte_bigcount_sequential_parity():
    # one add at a time, mirroring the reference loop exactly
    st = ByteStorage([101])
    st.set_use_bigcount(True)
    for i in range(260):
        st.add(9)
    assert st.get(9) == 260


def test_byte_multiplicity_batch():
    st = ByteStorage(PRIMES)
    h = np.array([5, 5, 5, 9, 9, 11], np.uint64)
    st.add_batch(h)
    assert st.get(5) == 3
    assert st.get(9) == 2
    assert st.get(11) == 1
    assert st.n_unique_kmers() == 3


def test_byte_weights_mask():
    st = ByteStorage(PRIMES)
    h = np.array([5, 6, 7], np.uint64)
    w = np.array([1, 0, 1], np.uint32)
    st.add_batch(h, w)
    assert st.get(5) == 1
    assert st.get(6) == 0
    assert st.get(7) == 1
    assert st.n_unique_kmers() == 2


def test_bit_storage():
    st = BitStorage(PRIMES)
    assert st.get(1234) == 0
    assert st.add(1234) is True
    assert st.get(1234) == 1
    assert st.add(1234) is False
    assert st.get(1234) == 1
    st.add_batch(np.arange(50, dtype=np.uint64))
    assert st.n_unique_kmers() >= 50
    for i in range(50):
        assert st.get(i) == 1


def test_bit_occupied_counts_bits():
    st = BitStorage([101])
    st.add_batch(np.arange(20, dtype=np.uint64))
    # distinct bins in table 0 (bins = h % 101, all distinct here)
    assert st.n_occupied() == 20


def test_nibble_storage():
    st = NibbleStorage(PRIMES)
    h = np.full(20, 3, np.uint64)
    st.add_batch(h)
    assert st.get(3) == 15  # saturates at 15
    st2 = NibbleStorage(PRIMES)
    st2.add(3)
    st2.add(3)
    assert st2.get(3) == 2
    # even/odd bins use different nibbles of the same byte
    st3 = NibbleStorage([101])
    st3.add(4)  # bin 4 -> byte 2 high nibble
    st3.add(5)  # bin 5 -> byte 2 low nibble
    assert st3.get(4) == 1
    assert st3.get(5) == 1
    raw = st3.raw_bytes()
    assert raw[2] == (1 << 4) | 1


def test_bit_update_from():
    a = BitStorage(PRIMES)
    b = BitStorage(PRIMES)
    a.add_batch(np.arange(0, 30, dtype=np.uint64))
    b.add_batch(np.arange(20, 50, dtype=np.uint64))
    occ_a = a.n_occupied()
    a.update_from(b)
    for i in range(50):
        assert a.get(i) == 1
    assert a.n_occupied() >= occ_a


def test_save_load_roundtrip(tmp_path):
    from khmer_tpu.io.oxli_format import load_storage, save_storage

    for cls in (ByteStorage, BitStorage, NibbleStorage):
        st = cls(PRIMES)
        st.add_batch(np.arange(123, dtype=np.uint64) * 7919)
        if cls is ByteStorage:
            st.set_use_bigcount(True)
            st.add_batch(np.full(300, 11, np.uint64))
        path = str(tmp_path / (cls.__name__ + ".oxli"))
        save_storage(path, 21, st)
        st2, ksize = load_storage(path)
        assert ksize == 21
        assert st2.kind == st.kind
        assert st2.get_tablesizes() == st.get_tablesizes()
        assert st2.n_occupied() == st.n_occupied()
        assert np.array_equal(st2.raw_bytes(), st.raw_bytes())
        if cls is ByteStorage:
            assert st2.bigcounts == st.resolved_bigcounts()
            assert st2.get(11) == st.get(11)


def test_save_load_gz(tmp_path):
    from khmer_tpu.io.oxli_format import load_storage, save_storage

    st = ByteStorage(PRIMES)
    st.add_batch(np.arange(50, dtype=np.uint64))
    path = str(tmp_path / "c.ct.gz")
    save_storage(path, 20, st)
    st2, ksize = load_storage(path)
    assert np.array_equal(st2.raw_bytes(), st.raw_bytes())


def test_header_layout(tmp_path):
    """Byte-level header parity with the OXLI format doc."""
    from khmer_tpu.io.oxli_format import save_storage

    st = ByteStorage([101, 103])
    st.add(5)
    path = str(tmp_path / "x.ct")
    save_storage(path, 20, st)
    blob = open(path, "rb").read()
    assert blob[:4] == b"OXLI"
    assert blob[4] == 4          # version
    assert blob[5] == 1          # SAVED_COUNTING_HT
    assert blob[6] == 0          # bigcount off
    assert int.from_bytes(blob[7:11], "little") == 20   # ksize
    assert blob[11] == 2         # n_tables
    assert int.from_bytes(blob[12:20], "little") == 1   # occupied
    assert int.from_bytes(blob[20:28], "little") == 101  # table 0 size
    # total: header 20 + (8+101) + (8+103) + 8 (bigcount count)
    assert len(blob) == 20 + 109 + 111 + 8


def test_bigcount_overflow_recovers_exactly(monkeypatch):
    """When one batch crosses 255 on more distinct hashes than the
    device candidate budget, candidates are recovered exactly from the
    batch (VERDICT round-2 #8: never warn-and-lose)."""
    import khmer_tpu.ops.sketch_ops as so

    monkeypatch.setattr(so, "BIGCOUNT_LANES", 4)
    st = ByteStorage([20011, 20021])  # fresh sizes -> fresh jit trace
    st.set_use_bigcount(True)
    hashes = np.arange(1, 33, dtype=np.uint64) * 977
    for _ in range(2):
        st.add_batch(np.repeat(hashes, 150))  # 300 each: crosses 255
    resolved = st.resolved_bigcounts()
    for h in hashes:
        assert resolved[int(h)] == 300
