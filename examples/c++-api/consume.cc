// A demonstration of khmer-tpu's primary sequence loading component:
// the native C++ FASTA/FASTQ loader (khmer_tpu/native/fastx_loader.cc,
// the reference read_parsers replacement).  Mirrors reference
// examples/c++-api/consume.cc: load a read file into a Count-min
// sketch, report sequences/k-mers consumed, query two k-mers.
//
// In khmer-tpu the counting itself normally runs on the TPU
// (khmer_tpu/ops/deferred.py); this demo shows the host-side native
// layer — the same kio_open/kio_next_chunk chunk-stream the Python
// engine consumes (2-bit codes + window-validity mask, read-boundary
// overlap re-emitted so no window ever spans a chunk) — feeding a
// plain C++ sketch with the framework's exact hashing and saturation
// conventions, so the counts agree with khmer_tpu.Counttable bit for
// bit (tests/test_examples.py::test_cpp_api_consume_parity).
//
// Usage: ./consume <reads.{fa,fq}[.gz|.bz2]> [tablesize] [kmer...]
//   tablesize defaults to the reference demo's ~5e8 (2 GB of u8
//   tables); pass a smaller value (e.g. 1000000) for quick runs —
//   primes are chosen exactly like khmer.get_n_primes_near_x.
//   Any further arguments are extra k-mers to query (used by the
//   Python-parity test).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <iostream>
#include <string>
#include <vector>

#include "khmer_demo.hh"

using khmer_demo::hash_murmur;

// native loader ABI (khmer_tpu/native/fastx_loader.cc)
extern "C" {
void* kio_open(const char* path, int k, long chunk);
long kio_next_chunk(void* handle, uint8_t* data, uint8_t* mask);
void kio_stats(void* handle, uint64_t* n_reads, uint64_t* n_consumed,
               uint64_t* n_bases);
void kio_close(void* handle);
}

static bool is_prime(uint64_t n)
{
    if (n < 2) return false;
    if (n % 2 == 0) return n == 2;
    for (uint64_t i = 3; i * i <= n; i += 2)
        if (n % i == 0) return false;
    return true;
}

// n distinct primes smaller than x, descending (khmer_tpu/primes.py
// ::get_n_primes_near_x)
static std::vector<uint64_t> n_primes_near_x(int n, uint64_t x)
{
    std::vector<uint64_t> primes;
    uint64_t i = x - 1;
    if (i % 2 == 0) i--;
    while ((int)primes.size() != n && i > 0) {
        if (is_prime(i)) primes.push_back(i);
        i -= 2;
    }
    return primes;
}

struct Counttable {
    unsigned int ksize;
    std::vector<uint64_t> sizes;
    std::vector<std::vector<uint8_t>> tables;

    Counttable(unsigned int k, const std::vector<uint64_t>& tablesizes)
        : ksize(k), sizes(tablesizes)
    {
        for (uint64_t s : sizes)
            tables.emplace_back(s, 0);
    }

    void add_hash(uint64_t h)
    {
        for (size_t t = 0; t < sizes.size(); t++) {
            uint8_t& c = tables[t][h % sizes[t]];
            if (c < 255) c++;  // ByteStorage saturation
        }
    }

    unsigned int get_count(const std::string& kmer) const
    {
        uint64_t h = hash_murmur(kmer);
        unsigned int m = 255;
        for (size_t t = 0; t < sizes.size(); t++) {
            uint8_t c = tables[t][h % sizes[t]];
            if (c < m) m = c;
        }
        return m;
    }
};

int main(int argc, char** argv)
{
    if (argc < 2) {
        std::cerr << "usage: " << argv[0]
                  << " <reads.{fa,fq}[.gz|.bz2]> [tablesize]\n";
        return 1;
    }
    unsigned int ksize = 21;

    // Initialize a Count-min sketch with 4 hash functions (4 distinct
    // tables with a prime number of buckets); same geometry as the
    // reference demo unless a smaller size is requested.
    uint64_t approx = argc > 2 ? strtoull(argv[2], nullptr, 10) : 500000000ull;
    Counttable counts(ksize, n_primes_near_x(4, approx));

    // Stream the file through the native loader, exactly as
    // Hashtable.consume_seqfile does: chunks of 2-bit codes
    // (A=0,T=1,C=2,G=3; non-ACGT cleaned to A) plus a mask flagging
    // each valid k-mer window start.
    const long CHUNK = 1 << 20;
    void* h = kio_open(argv[1], (int)ksize, CHUNK);
    if (!h) {
        std::cerr << "cannot open " << argv[1] << "\n";
        return 1;
    }
    std::vector<uint8_t> data(CHUNK), mask(CHUNK);
    static const char NUCL[4] = {'A', 'T', 'C', 'G'};
    std::string kmer(ksize, 'A');
    for (;;) {
        long n = kio_next_chunk(h, data.data(), mask.data());
        if (n == -2) {
            std::cerr << "parse error in " << argv[1] << "\n";
            kio_close(h);
            return 1;
        }
        if (n < 0) break;
        for (long i = 0; i + (long)ksize <= n; i++) {
            if (!mask[i]) continue;
            for (unsigned int j = 0; j < ksize; j++)
                kmer[j] = NUCL[data[i + j]];
            counts.add_hash(hash_murmur(kmer));
        }
        if (n < CHUNK) break;  // final partial chunk
    }
    uint64_t seqs = 0, kmers = 0, bases = 0;
    kio_stats(h, &seqs, &kmers, &bases);
    kio_close(h);

    std::cout << "Loaded " << seqs << " sequences and "
              << kmers << " k-mers from " << argv[1] << '\n';

    // Do some k-mer abundance queries
    std::cout << "The k-mer 'CAGCGCCGTGTTGTTGCAATT' appears "
              << counts.get_count("CAGCGCCGTGTTGTTGCAATT")
              << " times in the data.\n";
    std::cout << "The k-mer 'GATTACAGATTACAGATTACA' appears "
              << counts.get_count("GATTACAGATTACAGATTACA")
              << " times in the data.\n";

    for (int a = 3; a < argc; a++)
        std::cout << "The k-mer '" << argv[a] << "' appears "
                  << counts.get_count(argv[a]) << " times in the data.\n";

    return 0;
}
