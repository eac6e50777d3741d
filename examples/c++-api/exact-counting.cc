// A demonstration of using khmer-tpu's native conventions for exact
// k-mer counting from C++.  The memory required is 4^k bytes, which
// limits this to small values of k.
//
// Mirrors reference examples/c++-api/exact-counting.cc: same ksize,
// same input string, same queries, same printed output.  The
// difference is the engine: the reference links liboxli's Countgraph;
// here the demo implements the identical count semantics directly —
// the 2-bit encoding (A=0, T=1, C=2, G=3; complement = code^1) and
// canonical hash min(forward, reverse-complement) are the exact
// conventions of khmer_tpu's device kernels (khmer_tpu/ops/hashing.py,
// reference include/oxli/kmer_hash.hh:93 uniqify_rc), so the counts
// printed here match khmer_tpu.Countgraph(11, 4**11, 1) bit for bit
// (tests/test_examples.py::test_cpp_api_examples).

#include <cmath>
#include <cstdint>
#include <iostream>
#include <string>
#include <vector>

// khmer two-bit code: A=0, T=1, C=2, G=3; complement is code ^ 1.
static inline uint64_t twobit(char b)
{
    switch (b) {
    case 'A': case 'a': return 0;
    case 'T': case 't': return 1;
    case 'C': case 'c': return 2;
    default:            return 3;  // G
    }
}

// canonical k-mer hash: min(forward, reverse-complement) over the
// packed 2-bit encodings (reference uniqify_rc).
static uint64_t hash_dna(const std::string& kmer)
{
    uint64_t f = 0, r = 0;
    const int k = (int)kmer.size();
    for (int i = 0; i < k; i++) {
        f = (f << 2) | twobit(kmer[i]);
        r = (r << 2) | (twobit(kmer[k - 1 - i]) ^ 1ull);
    }
    return f < r ? f : r;
}

struct ExactCounttable {
    unsigned int ksize;
    std::vector<uint8_t> table;  // one byte per canonical k-mer

    ExactCounttable(unsigned int k, uint64_t nkmers)
        : ksize(k), table(nkmers, 0) {}

    void add(const std::string& kmer)
    {
        uint8_t& c = table[hash_dna(kmer)];
        if (c < 255) c++;  // saturating, like ByteStorage
    }

    void consume_string(const std::string& s)
    {
        for (size_t i = 0; i + ksize <= s.size(); i++)
            add(s.substr(i, ksize));
    }

    unsigned int get_count(const std::string& kmer) const
    {
        return table[hash_dna(kmer)];
    }
};

int main()
{
    unsigned int ksize = 11;
    uint64_t nkmers = (uint64_t)pow(4, ksize);

    // For exact counting, you need one table that is >= 4**k (bytes).
    //
    // If `ksize` is even, note that k-mers will collapse with their
    // reverse complement.  In that case a table size of 4**(k-1) + k
    // is required.
    ExactCounttable counts(ksize, nkmers);

    counts.consume_string("ATGGCGATGGCAAGTAGGACCCAGATGGACCAAAG");

    std::cout << "count for: " << "ATGGCGATGGC" << " is " <<
        counts.get_count("ATGGCGATGGC") << "\n";

    counts.add("ATGGCGATGGC");

    std::cout << "count for: " << "ATGGCGATGGC" << " is " <<
        counts.get_count("ATGGCGATGGC") << "\n";

    std::cout << "count for: " << "GTGGCGATGGC" << " is " <<
        counts.get_count("GTGGCGATGGC") << "\n";

    return 0;
}
