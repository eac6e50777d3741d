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
implementation exploits that the 2-bit hash of a window is literally its
bit-packing: codes are packed 32-per-uint64 word with a log-tree of
shift/or steps, and windows are extracted phase-major — for each phase
r in [0, 32) all windows starting at i ≡ r (mod 32) come from two
*contiguous word slices* combined with *constant* shifts, which the TPU
VPU vectorizes perfectly (no per-lane variable shifts, no gathers).
The reverse-complement hash is computed directly from the forward
window value with a bit-pair reversal ladder + complement XOR (the
complement of a 2-bit code is code^1, kmer_hash.hh:70-77), so no second
code stream is needed at all.
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
    if isinstance(khash, str):
        raise TypeError("Hash value must be an int")
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


def _pack_codes_u64(codes_u64):
    """Pack 2-bit codes [..., L] (L % 32 == 0) into uint64 words
    [..., L/32], first code in the word's top bits, via a 5-step
    shift/or tree."""
    x = codes_u64
    width = 2  # bits per element so far
    for _ in range(5):
        x = (x[..., 0::2] << U64(width)) | x[..., 1::2]
        width *= 2
    return x


# masks for the 2-bit-group reversal ladder
_M2 = U64(0x3333333333333333)
_M4 = U64(0x0F0F0F0F0F0F0F0F)
_M8 = U64(0x00FF00FF00FF00FF)
_M16 = U64(0x0000FFFF0000FFFF)
_COMP_PAIRS = U64(0x5555555555555555)

# u32-pair variants: TPU emulates 64-bit shifts with multi-op 32-bit
# sequences, so the production kernel does all arithmetic on explicit
# (hi, lo) uint32 pairs — measured 2x faster than the u64 formulation
U32 = jnp.uint32
_M2_32 = np.uint32(0x33333333)
_M4_32 = np.uint32(0x0F0F0F0F)
_M8_32 = np.uint32(0x00FF00FF)
_COMP_32 = np.uint32(0x55555555)


def _pack_codes_u32(codes_u32):
    """Pack 2-bit codes [..., L] (L % 16 == 0) into uint32 words
    [..., L/16], first code in the word's top bits."""
    x = codes_u32
    w = 2
    for _ in range(4):
        x = (x[..., 0::2] << U32(w)) | x[..., 1::2]
        w *= 2
    return x


def _rev_pairs_u32(x):
    """Reverse the 16 2-bit groups within every uint32."""
    x = ((x & _M2_32) << U32(2)) | ((x >> U32(2)) & _M2_32)
    x = ((x & _M4_32) << U32(4)) | ((x >> U32(4)) & _M4_32)
    x = ((x & _M8_32) << U32(8)) | ((x >> U32(8)) & _M8_32)
    return (x << U32(16)) | (x >> U32(16))


def kmer_hashes_2bit_pm_u32(codes, lengths, k: int):
    """Phase-major canonical 2-bit hashes as (hi, lo) uint32 pairs.

    Returns (canon_hi, canon_lo, valid), each [16, B, nw] with lane
    (r, b, j) = the window of row b starting at code position 16j + r.
    This is the production hash kernel (throughput recorded by
    bench.py as kmer_hash_gbps, best-of-N on this exact [4096,16403]
    dispatch — the single measurement protocol); the u64
    wrappers below combine the pairs for consumers that need them.
    """
    if k > 32:
        raise ValueError("k must be <= 32 for the 2-bit hash")
    B, L = codes.shape
    if L - k + 1 <= 0:
        raise ValueError("padded width shorter than k")
    # pad to whole uint32 words plus three trailing zero words (a
    # 64-bit window starting late in a word spans up to 4 words)
    pad = (-L) % 16 + 48
    c = codes.astype(U32)
    c = jnp.concatenate([c, jnp.zeros((B, pad), U32)], axis=1)
    w = _pack_codes_u32(c)
    w0 = w[..., :-3]
    w1 = w[..., 1:-2]
    w2 = w[..., 2:-1]
    s = 64 - 2 * k
    if 2 * k >= 32:
        cm_lo = _COMP_32
        cm_hi = np.uint32(0x55555555 & ((1 << (2 * k - 32)) - 1))
    else:
        cm_lo = np.uint32(0x55555555 & ((1 << (2 * k)) - 1))
        cm_hi = np.uint32(0)

    outs_hi = []
    outs_lo = []
    for r in range(16):
        if r == 0:
            hi, lo = w0, w1
        else:
            hi = (w0 << U32(2 * r)) | (w1 >> U32(32 - 2 * r))
            lo = (w1 << U32(2 * r)) | (w2 >> U32(32 - 2 * r))
        # forward value = 64-bit (hi, lo) >> (64 - 2k)
        if s == 0:
            fhi, flo = hi, lo
        elif s < 32:
            fhi = hi >> U32(s)
            flo = (lo >> U32(s)) | (hi << U32(32 - s))
        else:
            fhi = jnp.zeros_like(hi)
            flo = hi >> U32(s - 32)
        # reverse complement: complement the 2k low bits, reverse the
        # 64-bit pair groups (swap halves + per-half ladder), realign
        xhi = fhi ^ cm_hi
        xlo = flo ^ cm_lo
        rhi = _rev_pairs_u32(xlo)
        rlo = _rev_pairs_u32(xhi)
        if s == 0:
            vhi, vlo = rhi, rlo
        elif s < 32:
            vhi = rhi >> U32(s)
            vlo = (rlo >> U32(s)) | (rhi << U32(32 - s))
        else:
            vhi = jnp.zeros_like(rhi)
            vlo = rhi >> U32(s - 32)
        take_f = (fhi < vhi) | ((fhi == vhi) & (flo <= vlo))
        outs_hi.append(jnp.where(take_f, fhi, vhi))
        outs_lo.append(jnp.where(take_f, flo, vlo))
    canon_hi = jnp.stack(outs_hi)
    canon_lo = jnp.stack(outs_lo)
    nw = canon_hi.shape[-1]
    pos = (jnp.arange(nw, dtype=jnp.int32)[None, :] * 16 +
           jnp.arange(16, dtype=jnp.int32)[:, None]).reshape(16, 1, nw)
    valid = pos + k <= lengths[None, :, None]
    return canon_hi, canon_lo, valid


def _revcomp_value(v, k):
    """Reverse-complement of a 2k-bit window value held in the low bits
    of v: complement every 2-bit group (code ^ 1) and reverse group
    order (a 5-step bit-pair reversal ladder)."""
    mask = U64(((1 << (2 * k)) - 1) & 0x5555555555555555)
    x = v ^ mask
    x = ((x & _M2) << U64(2)) | ((x >> U64(2)) & _M2)
    x = ((x & _M4) << U64(4)) | ((x >> U64(4)) & _M4)
    x = ((x & _M8) << U64(8)) | ((x >> U64(8)) & _M8)
    x = ((x & _M16) << U64(16)) | ((x >> U64(16)) & _M16)
    x = (x << U64(32)) | (x >> U64(32))
    return x >> U64(64 - 2 * k)


def _phase_major_windows(words, k):
    """Forward window values, phase-major: out[r, ..., j] is the 2k-bit
    value of the window starting at code position 32*j + r.  words must
    carry a trailing all-zero word (callers pad)."""
    w0 = words[..., :-1]
    w1 = words[..., 1:]
    outs = [w0 >> U64(64 - 2 * k)]
    for r in range(1, 32):
        full = (w0 << U64(2 * r)) | (w1 >> U64(64 - 2 * r))
        outs.append(full >> U64(64 - 2 * k))
    return jnp.stack(outs, axis=0)


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
    if want_fr:
        cf, ff, rf, vf = _kmer_hashes_2bit_pm_u64(codes, lengths, k)
    else:
        cf, vf = kmer_hashes_2bit_pm(codes, lengths, k)

    # restore window order: pm[r, b, j] is window P*j + r
    def reorder(pm):
        return jnp.transpose(pm, (1, 2, 0)).reshape(B, -1)[:, :W]

    canon = reorder(cf)
    valid = reorder(vf)
    if want_fr:
        return canon, reorder(ff), reorder(rf), valid
    return canon, valid


def _pair_reverse_words(words):
    """Reverse the 32 2-bit groups within every uint64 word (a 5-step
    bit-pair reversal ladder, amortized once per word)."""
    x = words
    x = ((x & _M2) << U64(2)) | ((x >> U64(2)) & _M2)
    x = ((x & _M4) << U64(4)) | ((x >> U64(4)) & _M4)
    x = ((x & _M8) << U64(8)) | ((x >> U64(8)) & _M8)
    x = ((x & _M16) << U64(16)) | ((x >> U64(16)) & _M16)
    return (x << U64(32)) | (x >> U64(32))


def kmer_hashes_2bit_pm(codes, lengths, k: int):
    """Phase-major canonical 2-bit hashes: returns (canon, valid),
    each shaped [16, B, nw] where lane (r, b, j) is the window of row
    b starting at code position 16*j + r.  Bulk consumers that are
    order-agnostic (count scatter, sorting, HLL) use this layout
    directly (no transpose).  Backed by the uint32-pair kernel
    (~2x the u64 formulation on TPU); the pairs are combined to u64
    here because downstream bins are h % prime."""
    hi, lo, valid = kmer_hashes_2bit_pm_u32(codes, lengths, k)
    # little-endian bitcast of the (lo, hi) pair is the cheapest
    # u64 materialization (the shift/or form costs ~5% more); in the
    # fused consume path this combines into the % prime computation
    canon = jax.lax.bitcast_convert_type(
        jnp.stack([lo, hi], axis=-1), U64)
    return canon, valid


def _kmer_hashes_2bit_pm_u64(codes, lengths, k: int):
    """Original u64 phase-major kernel (32 phases; also returns fwd and
    rev values) — kept for the want_fr introspection path."""
    if k > 32:
        raise ValueError("k must be <= 32 for the 2-bit hash")
    B, L = codes.shape
    # pad to a whole number of words plus one trailing zero word
    pad = (-L) % 32 + 32
    c = codes.astype(U64)
    c = jnp.concatenate([c, jnp.zeros((B, pad), U64)], axis=1)
    words = _pack_codes_u64(c)  # [B, nw + 1]
    fwd = _phase_major_windows(words, k)  # [32, B, nw]
    nw = fwd.shape[-1]
    # (a per-word pair-reversal variant was measured slower on TPU than
    # the per-window ladder — XLA fuses the elementwise ladder but not
    # the 32 phase-realignment slice/flip/stacks)
    rev = _revcomp_value(fwd, k)
    canon = jnp.minimum(fwd, rev)
    pos = (jnp.arange(nw, dtype=jnp.int32)[None, :] * 32 +
           jnp.arange(32, dtype=jnp.int32)[:, None]).reshape(32, 1, nw)
    valid = pos + k <= lengths[None, :, None]
    return canon, fwd, rev, valid


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


def _murmur_windows(b64, W, k):
    """MurmurHash3_x64_128 (h1, h2) of every k-byte window of a uint64
    byte stream [B, L]; window blocks are assembled from k static
    shifted slices (no [B, W, k] materialization)."""
    h1 = jnp.zeros((b64.shape[0], W), U64)
    h2 = jnp.zeros_like(h1)
    c1 = U64(_C1)
    c2 = U64(_C2)

    def word(off, nbytes=8):
        acc = b64[:, off:off + W]
        for i in range(1, nbytes):
            acc = acc | (b64[:, off + i:off + i + W] << U64(8 * i))
        return acc

    nblocks = k // 16
    for i in range(nblocks):
        k1 = word(i * 16)
        k2 = word(i * 16 + 8)
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
        if taillen > 8:
            k2 = word(toff + 8, taillen - 8)
            k2 = _rotl64_v(k2 * c2, 33) * c1
            h2 = h2 ^ k2
        k1 = word(toff, min(taillen, 8))
        k1 = _rotl64_v(k1 * c1, 31) * c2
        h1 = h1 ^ k1

    h1 = h1 ^ U64(k)
    h2 = h2 ^ U64(k)
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _fmix64_v(h1)
    h2 = _fmix64_v(h2)
    h1 = h1 + h2
    h2 = h2 + h1
    return h1, h2


_COMP_LUT_DEV = jnp.asarray(_COMP_LUT)


def kmer_hashes_murmur_bytes(byts, lengths, k: int, assume_acgt=False):
    """All murmur k-mer hashes of a padded batch of raw ASCII reads.

    byts: uint8 [B, L] ASCII characters.  Semantics follow reference
    kmer_hash.cc:199-227: ``h(fwd) ^ h(tbl-revcomp(fwd))`` unless the
    k-mer equals its own reverse complement.  Returns (uint64 [B, W],
    valid bool [B, W]).

    assume_acgt=True (bulk consume of cleaned reads) replaces the
    256-entry complement-table gather with a 4-way select chain.
    """
    B, L = byts.shape
    W = L - k + 1
    if W <= 0:
        raise ValueError("padded width shorter than k")
    b64 = byts.astype(U64)
    h1, h2 = _murmur_windows(b64, W, k)
    # rc stream: complement every char (khmer `tbl`), reverse; the rc of
    # the window at i is the crev window at L-k-i, so flip the result.
    if assume_acgt:
        comp = jnp.where(
            byts == ord("A"), np.uint8(ord("T")),
            jnp.where(byts == ord("T"), np.uint8(ord("A")),
                      jnp.where(byts == ord("C"), np.uint8(ord("G")),
                                jnp.where(byts == ord("G"),
                                          np.uint8(ord("C")),
                                          np.uint8(ord(" "))))))
        crev = comp.astype(U64)[:, ::-1]
    else:
        crev = _COMP_LUT_DEV[byts].astype(U64)[:, ::-1]
    r1f, r2f = _murmur_windows(crev, W, k)
    r1 = r1f[:, ::-1]
    r2 = r2f[:, ::-1]
    # palindrome (window == its own rc) detection via full 128-bit hash
    # equality: collision probability 2^-128, i.e. exact in practice.
    palindrome = (h1 == r1) & (h2 == r2)
    canon = jnp.where(palindrome, h1, h1 ^ r1)
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
