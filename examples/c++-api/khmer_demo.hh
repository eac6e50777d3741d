// Shared helpers for the khmer-tpu C++ API demos: MurmurHash3
// x64_128 and the canonical k-mer hash convention used by the
// murmur-backed table classes (Counttable / SmallCounttable /
// Nodetable).
//
// The canonical hash is h(fwd) ^ h(revcomp) — or h(fwd) alone for a
// self-complementary k-mer — exactly as in khmer_tpu/ops/hashing.py
// ::hash_murmur3_scalar (reference src/oxli/kmer_hash.cc:199-227),
// so counts computed here agree with the Python API bit for bit.
//
// MurmurHash3 is Austin Appleby's public-domain algorithm, written
// out fresh here (same variant/constants as the framework's
// pure-python murmurhash3_x64_128, seed 0, first 64-bit word).

#ifndef KHMER_DEMO_HH
#define KHMER_DEMO_HH

#include <cstdint>
#include <cstring>
#include <string>

namespace khmer_demo {

static inline uint64_t rotl64(uint64_t x, int r)
{
    return (x << r) | (x >> (64 - r));
}

static inline uint64_t fmix64(uint64_t k)
{
    k ^= k >> 33;
    k *= 0xFF51AFD7ED558CCDull;
    k ^= k >> 33;
    k *= 0xC4CEB9FE1A85EC53ull;
    k ^= k >> 33;
    return k;
}

// MurmurHash3_x64_128, first output word (seed 0).
static inline uint64_t murmur3_x64_128_first(const void* data, size_t len)
{
    const uint64_t c1 = 0x87C37B91114253D5ull;
    const uint64_t c2 = 0x4CF5AD432745937Full;
    const uint8_t* bytes = (const uint8_t*)data;
    uint64_t h1 = 0, h2 = 0;
    const size_t nblocks = len / 16;

    for (size_t i = 0; i < nblocks; i++) {
        uint64_t k1, k2;
        memcpy(&k1, bytes + i * 16, 8);      // little-endian host assumed
        memcpy(&k2, bytes + i * 16 + 8, 8);
        k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1;
        h1 = rotl64(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52DCE729ull;
        k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2;
        h2 = rotl64(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495AB5ull;
    }

    const uint8_t* tail = bytes + nblocks * 16;
    const size_t taillen = len & 15;
    uint64_t k1 = 0, k2 = 0;
    for (size_t i = taillen; i > 8; i--)
        k2 |= (uint64_t)tail[i - 1] << (8 * (i - 9));
    for (size_t i = (taillen < 8 ? taillen : 8); i > 0; i--)
        k1 |= (uint64_t)tail[i - 1] << (8 * (i - 1));
    if (taillen > 8) {
        k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2;
    }
    if (taillen > 0) {
        k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1;
    }

    h1 ^= (uint64_t)len; h2 ^= (uint64_t)len;
    h1 += h2; h2 += h1;
    h1 = fmix64(h1); h2 = fmix64(h2);
    h1 += h2;
    return h1;
}

static inline char complement(char b)
{
    switch (b) {
    case 'A': return 'T';
    case 'T': return 'A';
    case 'C': return 'G';
    default:  return 'C';  // G
    }
}

static inline std::string revcomp(const std::string& s)
{
    std::string r(s.rbegin(), s.rend());
    for (char& b : r) b = complement(b);
    return r;
}

// canonical murmur k-mer hash (hash_murmur3_scalar parity)
static inline uint64_t hash_murmur(const std::string& kmer)
{
    uint64_t h = murmur3_x64_128_first(kmer.data(), kmer.size());
    std::string rc = revcomp(kmer);
    if (rc == kmer) return h;
    return h ^ murmur3_x64_128_first(rc.data(), rc.size());
}

}  // namespace khmer_demo

#endif  // KHMER_DEMO_HH
