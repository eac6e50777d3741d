"""DNA sequence <-> 2-bit code conversion (host side, numpy).

khmer's 2-bit alphabet is A=0, T=1, C=2, G=3 (reference
include/oxli/kmer_hash.hh:70-73) — note this is *not* the common
lexicographic ACGT order.  With this encoding the complement is a single
XOR with 1 (A<->T, C<->G), which the device-side hash kernels exploit.

Cleaning semantics ("cleaned_seq") follow reference
include/oxli/read_parsers.hh:122-138: uppercase the read and replace any
non-ACGT character with 'A'.
"""

import numpy as np

# Build byte LUTs once.
#
# The raw LUT reproduces twobit_repr exactly (kmer_hash.hh:70-73): 'A'->0,
# 'T'->1, 'C'->2, and *everything else* (including lowercase and N) -> 3.
_CODE_LUT = np.full(256, 3, dtype=np.uint8)
for _ch, _code in (("A", 0), ("T", 1), ("C", 2)):
    _CODE_LUT[ord(_ch)] = _code

_DECODE_LUT = np.frombuffer(b"ATCG", dtype=np.uint8)

_CLEAN_LUT = np.full(256, ord("A"), dtype=np.uint8)
for _ch in "ACGT":
    _CLEAN_LUT[ord(_ch)] = ord(_ch)
    _CLEAN_LUT[ord(_ch.lower())] = ord(_ch)

_IS_VALID_DNA = np.zeros(256, dtype=bool)
for _ch in "ACGTacgt":
    _IS_VALID_DNA[ord(_ch)] = True


def _as_bytes(seq):
    if isinstance(seq, str):
        return seq.encode("ascii")
    return bytes(seq)


def clean_sequence(seq):
    """Return the cleaned (uppercase, non-ACGT->A) sequence as str."""
    arr = np.frombuffer(_as_bytes(seq), dtype=np.uint8)
    return _CLEAN_LUT[arr].tobytes().decode("ascii")


def is_valid_dna(seq):
    arr = np.frombuffer(_as_bytes(seq), dtype=np.uint8)
    return bool(_IS_VALID_DNA[arr].all())


def encode_sequence(seq):
    """Encode one sequence into 2-bit codes (uint8 array, one code/base).

    Raw twobit_repr semantics: 'A'->0, 'T'->1, 'C'->2, anything else -> 3.
    Clean the sequence first for cleaned-read semantics.
    """
    arr = np.frombuffer(_as_bytes(seq), dtype=np.uint8)
    return _CODE_LUT[arr]


def decode_codes(codes):
    """Decode a 1-D uint8 code array back into an ACGT string."""
    codes = np.asarray(codes, dtype=np.uint8)
    return _DECODE_LUT[codes].tobytes().decode("ascii")


def encode_batch(seqs, min_width=0, pad_multiple=1):
    """Encode a list of sequences into a padded [B, L] uint8 code matrix.

    Returns (codes, lengths): codes is zero-padded (A) beyond each row's
    length; lengths is an int32 vector of true sequence lengths.  Width is
    max(len) rounded up to `pad_multiple`, at least `min_width`.
    """
    n = len(seqs)
    lengths = np.fromiter((len(s) for s in seqs), count=n, dtype=np.int32)
    width = max(int(lengths.max()) if n else 0, min_width)
    if pad_multiple > 1:
        width = -(-width // pad_multiple) * pad_multiple
    codes = np.zeros((n, width), dtype=np.uint8)
    for i, s in enumerate(seqs):
        b = np.frombuffer(_as_bytes(s), dtype=np.uint8)
        codes[i, : len(b)] = _CODE_LUT[b]
    return codes, lengths
