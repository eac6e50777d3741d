// A demonstration of using khmer-tpu's table conventions to query a
// dataset for a k-mer.  Typically khmer accrues a small false
// positive rate in order to save substantially on memory
// requirements.
//
// Mirrors reference examples/c++-api/bloom.cc: a Nodetable-style
// Bloom filter — 4 bit-tables with prime sizes, canonical murmur
// hashing, per-table index hash % tablesize — same input, same
// queries, same printed output.  These are exactly the conventions of
// khmer_tpu.Nodetable (khmer_tpu/hashtable.py; BitStorage in
// khmer_tpu/storage.py), so presence bits here agree with the Python
// API (tests/test_examples.py::test_cpp_api_examples).

#include <cstdint>
#include <iostream>
#include <string>
#include <vector>

#include "khmer_demo.hh"

using khmer_demo::hash_murmur;

struct BloomFilter {
    unsigned int ksize;
    std::vector<uint64_t> sizes;
    std::vector<std::vector<uint8_t>> bits;  // 1 byte per bit, demo-simple

    BloomFilter(unsigned int k, const std::vector<uint64_t>& tablesizes)
        : ksize(k), sizes(tablesizes)
    {
        for (uint64_t s : sizes)
            bits.emplace_back(s, 0);
    }

    void add(const std::string& kmer)
    {
        uint64_t h = hash_murmur(kmer);
        for (size_t t = 0; t < sizes.size(); t++)
            bits[t][h % sizes[t]] = 1;
    }

    void consume_string(const std::string& s)
    {
        for (size_t i = 0; i + ksize <= s.size(); i++)
            add(s.substr(i, ksize));
    }

    // 1 iff every table has the bit set (min over tables, BitStorage)
    unsigned int get_count(const std::string& kmer) const
    {
        uint64_t h = hash_murmur(kmer);
        for (size_t t = 0; t < sizes.size(); t++)
            if (!bits[t][h % sizes[t]])
                return 0;
        return 1;
    }
};

int main()
{
    unsigned int ksize = 21;

    // Initialize a Bloom filter with 4 hash functions (4 distinct
    // tables with a prime number of buckets).  The sum of these
    // values is the memory consumption of the Bloom filter in bits.
    // See `khmer.get_n_primes_near_x` from the Python API.
    std::vector<uint64_t> tablesizes = {
        499999897, 499999909, 499999931, 499999993
    };
    BloomFilter bloomfilter(ksize, tablesizes);

    bloomfilter.consume_string(
        "GCTGCACCGATGTACGCAAAGCTATTTAAAACCATAACTATTCTCACTTA");

    std::cout << "count for: 'GCTGCACCGATGTACGCAAAG' is "
              << bloomfilter.get_count("GCTGCACCGATGTACGCAAAG") << "\n";

    bloomfilter.add("GCTGCACCGATGTACGCAAAG");

    std::cout << "count for: 'GCTGCACCGATGTACGCAAAG' is "
              << bloomfilter.get_count("GCTGCACCGATGTACGCAAAG") << "\n";

    std::cout << "count for: 'GATTACAGATTACAGATTACA' is "
              << bloomfilter.get_count("GATTACAGATTACAGATTACA") << "\n";

    return 0;
}
