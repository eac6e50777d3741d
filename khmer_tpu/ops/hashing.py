"""k-mer hash functions, TPU-vectorized.

Parity targets (semantics reconstructed from the reference, cited per
function):

* exact 2-bit hash, k <= 32: reference src/oxli/kmer_hash.cc:64-99
  (``_hash``), canonical form = min(forward, reverse-complement)
  (``uniqify_rc``, include/oxli/kmer_hash.hh:93).
* invertible ``_revhash``: src/oxli/kmer_hash.cc:139-155.
* MurmurHash3_x64_128-based hash for unbounded k: src/oxli/kmer_hash.cc:
  191-227 — ``h(fwd) ^ h(revcomp)`` with a self-complement special case.
* hash-space banding for sketch sharding: src/oxli/kmer_hash.cc:290-304.

Instead of the reference's per-base rolling loop, the batched device
implementation computes prefix polynomials with an associative scan, so
every k-mer window of every read hashes in O(log L) parallel steps:

    P[j]  = P[j-1] * 4 + code[j]          (mod 2**64)
    f(i)  = P[i+k-1] - P[i-1] * 4**k      (mod 2**64)

and symmetrically for the reverse-complement suffix polynomial.  For
k = 32 the ``4**k`` term vanishes mod 2**64, which the formula handles
for free.
"""

import numpy as np

import jax
import jax.numpy as jnp

from khmer_tpu._config import HASH_DTYPE

U64 = jnp.uint64

# ---------------------------------------------------------------------------
# scalar / host-side reference implementations (used by the public khmer API
# functions `forward_hash`, `reverse_hash`, `hash_murmur3`, and by tests)
# ---------------------------------------------------------------------------

_TWOBIT = {"A": 0, "T": 1, "C": 2, "G": 3}
_REVTWOBIT = "ATCG"

# khmer's IUPAC complement table, reproduced character-for-character from
# the `tbl` macro at reference kmer_hash.cc:51-54: 64 spaces, then the
# segment below indexed by (char - 64), repeated for lowercase input
# (lowercase complements to UPPERCASE).  Characters outside the table
# complement to ' ', as in the reference.
_TBL_SEGMENT = " TVGH FCD  M KN   YSAABW R"
_COMP_LUT = np.full(256, ord(" "), dtype=np.uint8)
for _j, _c in enumerate(_TBL_SEGMENT):
    _COMP_LUT[64 + _j] = ord(_c)
    _COMP_LUT[96 + _j] = ord(_c)


def reverse_complement(seq: str) -> str:
    """Reverse complement using khmer's `tbl` (kmer_hash.cc:51-54,157-166)."""
    arr = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    return _COMP_LUT[arr][::-1].tobytes().decode("ascii")


def _check_k(kmer, k):
    if k > 32:
        raise ValueError("k-mer size must be <= 32 for the 2-bit hash")
    if len(kmer) < k:
        raise ValueError(
            "Supplied kmer string doesn't match the underlying k-size.")


def hash_2bit_scalar(kmer: str, k: int):
    """Return (canonical, fwd, rev) 2-bit hashes of `kmer[:k]` (host ints)."""
    _check_k(kmer, k)
    # strict twobit_repr parity: no case folding, unknown chars -> 3
    h = 0
    r = 0
    for i in range(k):
        h = (h << 2) | _TWOBIT.get(kmer[i], 3)
        r = (r << 2) | (_TWOBIT.get(kmer[k - 1 - i], 3) ^ 1)
    h &= (1 << 64) - 1
    r &= (1 << 64) - 1
    return (min(h, r), h, r)


def forward_hash(kmer: str, k: int) -> int:
    """Canonical (strand-neutral) 2-bit hash; khmer ``forward_hash``."""
    return hash_2bit_scalar(kmer, k)[0]


def forward_hash_no_rc(kmer: str, k: int) -> int:
    """Forward-strand-only 2-bit hash; khmer ``forward_hash_no_rc``."""
    return hash_2bit_scalar(kmer, k)[1]


def reverse_hash(khash: int, k: int) -> str:
    """Invert a forward 2-bit hash back into its k-mer string."""
    if k > 32:
        raise ValueError("k-mer size must be <= 32 for the 2-bit hash")
    out = []
    h = int(khash)
    for _ in range(k):
        out.append(_REVTWOBIT[h & 3])
        h >>= 2
    return "".join(reversed(out))


# --- MurmurHash3_x64_128 (public algorithm, Austin Appleby, public domain) --

_MASK64 = (1 << 64) - 1


def _rotl64(x, r):
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix64(k):
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK64
    k ^= k >> 33
    return k


_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def murmurhash3_x64_128(data: bytes, seed: int = 0):
    """Pure-python MurmurHash3_x64_128; returns (out0, out1)."""
    length = len(data)
    h1 = h2 = seed & _MASK64
    nblocks = length // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16: i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8: i * 16 + 16], "little")
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64
    tail = data[nblocks * 16:]
    k1 = k2 = 0
    for i in range(len(tail) - 1, 7, -1):
        k2 |= tail[i] << (8 * (i - 8))
    for i in range(min(len(tail), 8) - 1, -1, -1):
        k1 |= tail[i] << (8 * i)
    if len(tail) > 8:
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
    if len(tail) > 0:
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    return h1, h2


def hash_murmur3_scalar(kmer: str):
    """Canonical murmur k-mer hash: ``h(fwd) ^ h(revcomp)``, or ``h`` for a
    self-complementary k-mer (reference kmer_hash.cc:199-227)."""
    h = murmurhash3_x64_128(kmer.encode("ascii"))[0]
    rev = reverse_complement(kmer)
    if rev == kmer:
        return h
    r = murmurhash3_x64_128(rev.encode("ascii"))[0]
    return h ^ r


def hash_no_rc_murmur3_scalar(kmer: str):
    return murmurhash3_x64_128(kmer.encode("ascii"))[0]


# ---------------------------------------------------------------------------
# batched device implementations
# ---------------------------------------------------------------------------


def _affine_scan(codes_u64, reverse=False):
    """Associative scan of x -> 4*x + c over the last axis (mod 2**64).

    Returns the inclusive scan P with P[..., j] = poly value of prefix
    ending at j (or suffix starting at j when reverse=True, with the
    recurrence S[j] = 4*S[j+1] + c[j]).
    """

    def combine(left, right):
        # affine maps f(x) = a*x + b composed: right∘left when scanning
        a1, b1 = left
        a2, b2 = right
        return (a1 * a2, b1 * a2 + b2)

    a = jnp.full(codes_u64.shape, 4, dtype=U64)
    elems = (a, codes_u64)
    axis = codes_u64.ndim - 1
    _, p = jax.lax.associative_scan(combine, elems, axis=axis,
                                    reverse=reverse)
    return p


def kmer_hashes_2bit(codes, lengths, k: int, want_fr: bool = False):
    """All k-mer hashes of a padded batch of 2-bit-encoded reads.

    Args:
      codes: uint8 [B, L] (2-bit codes, padding arbitrary)
      lengths: int32 [B] true read lengths
      k: static k-mer size (<= 32)
    Returns:
      (hashes, valid) where hashes is uint64 [B, L-k+1] canonical hashes
      and valid is bool [B, L-k+1]; windows extending past a read's length
      are invalid.  With want_fr=True returns (canon, fwd, rev, valid).
    """
    if k > 32:
        raise ValueError("k must be <= 32 for the 2-bit hash")
    B, L = codes.shape
    W = L - k + 1
    if W <= 0:
        raise ValueError("padded width shorter than k")
    c = codes.astype(U64)
    comp = c ^ U64(1)

    # forward prefix polynomial P[j] = value of codes[0..j] base 4
    P = _affine_scan(c)
    # window value f(i) = P[i+k-1] - P[i-1] * 4^k
    four_k = U64((4**k) % (1 << 64))
    P_end = P[:, k - 1:]  # [B, W] = P[i+k-1]
    P_before = jnp.concatenate(
        [jnp.zeros((B, 1), U64), P[:, : W - 1]], axis=1
    )  # P[i-1], 0 for i=0
    fwd = P_end - P_before * four_k

    # reverse-complement suffix polynomial S[j] = 4*S[j+1] + comp[j]
    S = _affine_scan(comp, reverse=True)
    # r(i) = S[i] - S[i+k] * 4^k
    S_start = S[:, :W]
    S_after = jnp.concatenate(
        [S[:, k:], jnp.zeros((B, k - S.shape[1] + W), U64)], axis=1
    )[:, :W]
    rev = S_start - S_after * four_k

    canon = jnp.minimum(fwd, rev)
    pos = jnp.arange(W, dtype=jnp.int32)[None, :]
    valid = pos + k <= lengths[:, None]
    if want_fr:
        return canon, fwd, rev, valid
    return canon, valid


# --- batched murmur ---------------------------------------------------------

# code -> ascii byte ("ATCG"), as u64 for block assembly
_CODE2ASCII = jnp.asarray(np.frombuffer(b"ATCG", dtype=np.uint8))


def _rotl64_v(x, r):
    return (x << U64(r)) | (x >> U64(64 - r))


def _fmix64_v(x):
    x = x ^ (x >> U64(33))
    x = x * U64(0xFF51AFD7ED558CCD)
    x = x ^ (x >> U64(33))
    x = x * U64(0xC4CEB9FE1A85EC53)
    x = x ^ (x >> U64(33))
    return x


def _murmur_fwd_bytes(byts, k: int):
    """MurmurHash3_x64_128(...)[0] of [N, k] ascii byte rows (static k)."""
    b = byts.astype(U64)
    h1 = jnp.zeros(b.shape[:-1], U64)
    h2 = jnp.zeros(b.shape[:-1], U64)
    c1 = U64(_C1)
    c2 = U64(_C2)
    nblocks = k // 16

    def getblock(off):
        acc = jnp.zeros(b.shape[:-1], U64)
        for i in range(8):
            acc = acc | (b[..., off + i] << U64(8 * i))
        return acc

    for i in range(nblocks):
        k1 = getblock(i * 16)
        k2 = getblock(i * 16 + 8)
        k1 = _rotl64_v(k1 * c1, 31) * c2
        h1 = h1 ^ k1
        h1 = _rotl64_v(h1, 27) + h2
        h1 = h1 * U64(5) + U64(0x52DCE729)
        k2 = _rotl64_v(k2 * c2, 33) * c1
        h2 = h2 ^ k2
        h2 = _rotl64_v(h2, 31) + h1
        h2 = h2 * U64(5) + U64(0x38495AB5)

    taillen = k & 15
    if taillen:
        toff = nblocks * 16
        k1 = jnp.zeros(b.shape[:-1], U64)
        k2 = jnp.zeros(b.shape[:-1], U64)
        for i in range(taillen - 1, 7, -1):
            k2 = k2 | (b[..., toff + i] << U64(8 * (i - 8)))
        for i in range(min(taillen, 8) - 1, -1, -1):
            k1 = k1 | (b[..., toff + i] << U64(8 * i))
        if taillen > 8:
            k2 = _rotl64_v(k2 * c2, 33) * c1
            h2 = h2 ^ k2
        k1 = _rotl64_v(k1 * c1, 31) * c2
        h1 = h1 ^ k1

    h1 = h1 ^ U64(k)
    h2 = h2 ^ U64(k)
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _fmix64_v(h1)
    h2 = _fmix64_v(h2)
    h1 = h1 + h2
    return h1


_COMP_LUT_DEV = jnp.asarray(_COMP_LUT)


def kmer_hashes_murmur_bytes(byts, lengths, k: int):
    """All murmur k-mer hashes of a padded batch of raw ASCII reads.

    byts: uint8 [B, L] ASCII characters.  Semantics follow reference
    kmer_hash.cc:199-227: ``h(fwd) ^ h(tbl-revcomp(fwd))`` unless the
    k-mer equals its own reverse complement.  Returns (uint64 [B, W],
    valid bool [B, W]).
    """
    B, L = byts.shape
    W = L - k + 1
    if W <= 0:
        raise ValueError("padded width shorter than k")
    idx = jnp.arange(W)[:, None] + jnp.arange(k)[None, :]
    win = byts[:, idx]  # [B, W, k]
    rev = _COMP_LUT_DEV[win][..., ::-1]
    h = _murmur_fwd_bytes(win, k)
    r = _murmur_fwd_bytes(rev, k)
    palindrome = jnp.all(win == rev, axis=-1)
    canon = jnp.where(palindrome, h, h ^ r)
    pos = jnp.arange(W, dtype=jnp.int32)[None, :]
    valid = pos + k <= lengths[:, None]
    return canon, valid


def kmer_hashes_murmur(codes, lengths, k: int):
    """Murmur k-mer hashes of 2-bit-encoded (cleaned ACGT) reads."""
    return kmer_hashes_murmur_bytes(_CODE2ASCII[codes], lengths, k)


def compute_band_interval(num_bands: int, band: int):
    """Hash-space band [min, max) for sketch-space sharding.

    Parity: reference kmer_hash.cc:290-304 (band_size = U64_MAX / num_bands;
    note integer division, so the top sliver of hash space belongs to no
    band — the reference's semantics, preserved here).
    """
    if band >= num_bands or band < 0:
        raise ValueError(
            "'band' must be in the interval [0, 'num_bands'), %d not in [0, %d)"
            % (band, num_bands)
        )
    band_size = ((1 << 64) - 1) // num_bands
    return band_size * band, band_size * (band + 1)
