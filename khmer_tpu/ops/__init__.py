from khmer_tpu.ops.encode import (
    encode_sequence,
    encode_batch,
    decode_codes,
    clean_sequence,
)
from khmer_tpu.ops.hashing import (
    kmer_hashes_2bit,
    hash_2bit_scalar,
    forward_hash,
    forward_hash_no_rc,
    reverse_hash,
    reverse_complement,
    hash_murmur3_scalar,
    kmer_hashes_murmur,
    compute_band_interval,
)
