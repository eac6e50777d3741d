"""Hash function parity tests.

Golden values cross-checked against the reference semantics:
  * 2-bit hash: A=0,T=1,C=2,G=3, canonical=min(fwd,rc)
    (reference src/oxli/kmer_hash.cc:64-99)
  * murmur: MurmurHash3_x64_128 h(fwd)^h(revcomp)
    (kmer_hash.cc:191-227)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from khmer_tpu.ops.encode import encode_sequence, encode_batch, \
    clean_sequence
from khmer_tpu.ops.hashing import (
    compute_band_interval,
    forward_hash,
    forward_hash_no_rc,
    hash_2bit_scalar,
    hash_murmur3_scalar,
    kmer_hashes_2bit,
    kmer_hashes_murmur_bytes,
    murmurhash3_x64_128,
    reverse_complement,
    reverse_hash,
)


def test_twobit_basics():
    # A=0 -> AAAA forward hash is 0
    assert forward_hash_no_rc("AAAA", 4) == 0
    # TTTT is 0b01010101 = 85; canonical of AAAA is min(0, 85) = 0
    assert forward_hash_no_rc("TTTT", 4) == 85
    assert forward_hash("TTTT", 4) == 0
    assert forward_hash("AAAA", 4) == 0
    # GGGG = 0b11111111 = 255, revcomp CCCC = 0b10101010 = 170
    assert forward_hash_no_rc("GGGG", 4) == 255
    assert forward_hash("GGGG", 4) == 170


def test_revhash_roundtrip():
    for kmer in ["ATCG", "GATTACA", "A" * 32, "GTCA" * 8]:
        k = len(kmer)
        h = forward_hash_no_rc(kmer, k)
        assert reverse_hash(h, k) == kmer


def test_reverse_complement():
    assert reverse_complement("ATCG") == "CGAT"
    assert reverse_complement("AAAA") == "TTTT"
    # IUPAC codes follow khmer's tbl
    assert reverse_complement("N") == "N"
    assert reverse_complement("RY") == "RY"


def test_canonical_strand_neutral():
    for kmer in ["ATCGGCTA", "GATTACAG", "CCCCAAAA"]:
        k = len(kmer)
        assert forward_hash(kmer, k) == forward_hash(
            reverse_complement(kmer), k)


def test_batched_2bit_matches_scalar():
    seqs = ["GATTACAGATTACAGATTACA", "ATCGATCGATCGTTTT", "GGGGGGCCCCCAAAATT"]
    k = 7
    codes, lengths = encode_batch(seqs)
    canon, fwd, rev, valid = kmer_hashes_2bit(
        jnp.asarray(codes), jnp.asarray(lengths), k, want_fr=True)
    canon = np.asarray(canon)
    fwd = np.asarray(fwd)
    valid = np.asarray(valid)
    for b, s in enumerate(seqs):
        for i in range(len(s) - k + 1):
            c, f, r = hash_2bit_scalar(s[i: i + k], k)
            assert valid[b, i]
            assert fwd[b, i] == f, (b, i)
            assert canon[b, i] == c, (b, i)
        for i in range(len(s) - k + 1, codes.shape[1] - k + 1):
            assert not valid[b, i]


def test_k32_boundary():
    s = "GATTACA" * 5  # 35 bases
    k = 32
    codes, lengths = encode_batch([s])
    canon, valid = kmer_hashes_2bit(jnp.asarray(codes),
                                    jnp.asarray(lengths), k)
    canon = np.asarray(canon)
    for i in range(len(s) - k + 1):
        assert canon[0, i] == forward_hash(s[i: i + 32], 32)


def test_murmur_reference_vectors():
    # MurmurHash3_x64_128 known-answer tests (public test vectors)
    h1, h2 = murmurhash3_x64_128(b"")
    assert (h1, h2) == (0, 0)
    # independently computed with the canonical C++ implementation
    h1, _ = murmurhash3_x64_128(b"hello")
    assert h1 == 0xCBD8A7B341BD9B02


def test_murmur_batch_matches_scalar():
    seqs = ["GATTACAGATTACAGATTACA", "ATCGATCGATCGTTTTACGT"]
    for k in (5, 16, 17, 21):
        byts = [np.frombuffer(s.encode(), np.uint8) for s in seqs]
        L = max(len(s) for s in seqs)
        mat = np.zeros((len(seqs), L), np.uint8)
        for i, b in enumerate(byts):
            mat[i, : len(b)] = b
        lengths = np.asarray([len(s) for s in seqs], np.int32)
        h, valid = kmer_hashes_murmur_bytes(
            jnp.asarray(mat), jnp.asarray(lengths), k)
        h = np.asarray(h)
        valid = np.asarray(valid)
        for b, s in enumerate(seqs):
            for i in range(len(s) - k + 1):
                assert valid[b, i]
                assert h[b, i] == hash_murmur3_scalar(s[i: i + k]), (k, b, i)


def test_murmur_palindrome():
    # AT is its own reverse complement -> hash is h(fwd), not h^r (=0)
    pal = "ATAT"
    assert reverse_complement(pal) == pal
    assert hash_murmur3_scalar(pal) == murmurhash3_x64_128(b"ATAT")[0]


def test_band_interval():
    lo, hi = compute_band_interval(4, 0)
    assert lo == 0
    assert hi == ((1 << 64) - 1) // 4
    with pytest.raises(ValueError):
        compute_band_interval(4, 4)


def test_clean_sequence():
    assert clean_sequence("acgtn") == "ACGTA"
    assert clean_sequence("ACGTNRY") == "ACGTAAA"


def test_encode_raw_strict():
    # raw twobit_repr: lowercase and N encode as 3 ('G' bucket)
    assert list(encode_sequence("ATCGNa")) == [0, 1, 2, 3, 3, 3]


def test_reference_hash_golden_constants():
    """Golden hash values from the reference tests/test_functions.py."""
    import khmer_tpu as khmer

    assert khmer.forward_hash('AAAA', 4) == 0
    assert khmer.forward_hash('TTTT', 4) == 0
    assert khmer.forward_hash('CCCC', 4) == 170
    assert khmer.forward_hash('GGGG', 4) == 170
    assert khmer.forward_hash(
        'GGTTGACGGGGCTCAGGGGGCGGCTGACTCCG', 32) == 13607885392109549066
    assert khmer.forward_hash_no_rc('AAAA', 4) == 0
    assert khmer.forward_hash_no_rc('TTTT', 4) == 85
    assert khmer.reverse_hash(0, 4) == 'AAAA'
    assert khmer.reverse_hash(85, 4) == 'TTTT'
    assert khmer.hash_murmur3('AAAA') == 526240128537019279
    assert khmer.hash_murmur3('TTTT') == 526240128537019279
    assert khmer.hash_murmur3('CCCC') == 14391997331386449225
    assert khmer.hash_murmur3('GGGG') == 14391997331386449225


def test_hash_cyclic_reference_parity():
    """Golden values computed with the reference's bundled
    rollinghash CyclicHash<uint64> (kmer_hash.cc:237-257)."""
    from khmer_tpu.ops.rollinghash import hash_cyclic_scalar

    assert hash_cyclic_scalar('ACGTACGTACGTACGTACGT') == (
        7799567892625678318, 13123155983167614967, 13123155983167614967)
    assert hash_cyclic_scalar('TTTTTT') == (
        13218220985018796895, 11878804279949710440, 1339416705069086455)
    assert hash_cyclic_scalar('GATTACAGATTACAGATTACAGATTACAGATTACA') == (
        16756336693072190462, 7513208593411347810, 9243128099660842652)


def test_cyclic_counttable_uses_cyclic_hash():
    import khmer_tpu as khmer
    from khmer_tpu.ops.rollinghash import hash_cyclic_scalar

    ct = khmer.CyclicCounttable(20, 1e4, 2)
    ct.consume('ACGTACGTACGTACGTACGT')
    assert ct.hash('ACGTACGTACGTACGTACGT') == \
        hash_cyclic_scalar('ACGTACGTACGTACGTACGT')[0]
    assert ct.get('ACGTACGTACGTACGTACGT') == 1
