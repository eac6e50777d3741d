// Native host-side data loader for khmer-tpu.
//
// The TPU-native equivalent of the reference's C++ read-parsing layer
// (src/oxli/read_parsers.cc:336-398, SeqAn FastxReader): parses
// FASTA/FASTQ (plain or gzip), cleans reads (uppercase, non-ACGT -> A,
// reference include/oxli/read_parsers.hh:122-138), 2-bit encodes them
// (A=0 T=1 C=2 G=3, include/oxli/kmer_hash.hh:70-77), and packs the
// code stream into fixed-size device chunks with per-window validity
// masks — the exact semantics of khmer_tpu.hashtable._FlatBatcher
// (reads spanning a chunk boundary re-emit their last k-1 bases so
// every k-mer window lands in exactly one chunk).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC fastx_loader.cc -lz -o libkhmer_io.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

struct Loader {
    gzFile fp = nullptr;          // zlib reads plain files transparently
    int k = 0;
    long chunk = 0;

    // raw line buffering
    std::vector<char> buf;
    size_t buf_pos = 0, buf_len = 0;
    bool eof = false;

    // current encoded read + resume offset (for boundary re-emission)
    std::vector<uint8_t> codes;
    size_t read_start = 0;
    bool read_active = false;
    bool is_fastq = false;
    bool format_known = false;

    // chunk assembly state
    long filled = 0;

    // statistics
    uint64_t n_reads = 0;
    uint64_t n_consumed = 0;  // total k-mers (reads >= k contribute n-k+1)
    uint64_t n_bases = 0;

    std::string pending_line;  // lookahead (FASTA header handling)
    bool have_pending = false;

    int err = 0;
};

const uint8_t* code_lut() {
    static uint8_t lut[256];
    static bool init = false;
    if (!init) {
        // cleaned-read semantics: everything -> A(0) except T/C/G
        memset(lut, 0, sizeof(lut));
        lut[(unsigned)'T'] = 1; lut[(unsigned)'t'] = 1;
        lut[(unsigned)'C'] = 2; lut[(unsigned)'c'] = 2;
        lut[(unsigned)'G'] = 3; lut[(unsigned)'g'] = 3;
        init = true;
    }
    return lut;
}

// read one line (without trailing newline/CR); returns false at EOF
bool next_line(Loader* L, std::string& out) {
    if (L->have_pending) {
        out.swap(L->pending_line);
        L->have_pending = false;
        return true;
    }
    out.clear();
    for (;;) {
        if (L->buf_pos >= L->buf_len) {
            if (L->eof) break;
            if (L->buf.empty()) L->buf.resize(1 << 20);
            int n = gzread(L->fp, L->buf.data(), (unsigned)L->buf.size());
            if (n <= 0) { L->eof = true; break; }
            L->buf_len = (size_t)n;
            L->buf_pos = 0;
        }
        char* base = L->buf.data() + L->buf_pos;
        size_t avail = L->buf_len - L->buf_pos;
        char* nl = (char*)memchr(base, '\n', avail);
        if (nl) {
            out.append(base, nl - base);
            L->buf_pos += (nl - base) + 1;
            break;
        }
        out.append(base, avail);
        L->buf_pos = L->buf_len;
    }
    if (!out.empty() && out.back() == '\r') out.pop_back();
    return !(out.empty() && L->eof && L->buf_pos >= L->buf_len);
}

void push_line(Loader* L, std::string& line) {
    L->pending_line.swap(line);
    L->have_pending = true;
}

// parse the next read's sequence into L->codes; false when exhausted
bool next_read(Loader* L) {
    std::string line;
    for (;;) {
        if (!next_line(L, line)) return false;
        if (!line.empty()) break;
    }
    if (!L->format_known) {
        if (line[0] == '@') L->is_fastq = true;
        else if (line[0] == '>') L->is_fastq = false;
        else { L->err = 2; return false; }
        L->format_known = true;
    }
    const uint8_t* lut = code_lut();
    L->codes.clear();
    if (L->is_fastq) {
        if (line[0] != '@') { L->err = 2; return false; }
        std::string seq;
        if (!next_line(L, seq)) { L->err = 2; return false; }
        std::string plus;
        if (!next_line(L, plus) || plus.empty() || plus[0] != '+') {
            L->err = 2; return false;
        }
        std::string qual;
        if (!next_line(L, qual)) { L->err = 2; return false; }
        L->codes.resize(seq.size());
        for (size_t i = 0; i < seq.size(); i++)
            L->codes[i] = lut[(unsigned char)seq[i]];
    } else {
        if (line[0] != '>') { L->err = 2; return false; }
        std::string seq;
        for (;;) {
            std::string part;
            if (!next_line(L, part)) break;
            if (!part.empty() && part[0] == '>') { push_line(L, part); break; }
            seq += part;
        }
        L->codes.resize(seq.size());
        for (size_t i = 0; i < seq.size(); i++)
            L->codes[i] = lut[(unsigned char)seq[i]];
    }
    L->n_reads++;
    L->n_bases += L->codes.size();
    if ((long)L->codes.size() >= L->k)
        L->n_consumed += L->codes.size() - L->k + 1;
    L->read_start = 0;
    L->read_active = true;
    return true;
}

}  // namespace

extern "C" {

void* kio_open(const char* path, int k, long chunk) {
    Loader* L = new Loader();
    L->k = k;
    L->chunk = chunk;
    L->fp = gzopen(path, "rb");
    if (!L->fp) { delete L; return nullptr; }
    gzbuffer(L->fp, 1 << 20);
    return L;
}

// Fill one chunk of `data` codes and `mask` window-validity flags.
// Returns: chunk  -> a full chunk was produced (call again)
//          0..chunk-1 -> final partial chunk of that many bytes
//                        (mask beyond is zeroed); subsequent calls
//                        return -1
//          -1 -> exhausted;  -2 -> parse error
long kio_next_chunk(void* handle, uint8_t* data, uint8_t* mask) {
    Loader* L = (Loader*)handle;
    if (L->err) return -2;
    const long chunk = L->chunk;
    const int k = L->k;
    long filled = 0;
    memset(mask, 0, chunk);

    for (;;) {
        if (!L->read_active) {
            if (!next_read(L)) {
                if (L->err) return -2;
                if (filled == 0) return -1;
                memset(data + filled, 0, chunk - filled);
                return filled;
            }
        }
        // copy a piece of the current read into the chunk
        // (_FlatBatcher.add semantics, khmer_tpu/hashtable.py)
        long n = (long)L->codes.size();
        long start = (long)L->read_start;
        long space = chunk - filled;
        long take = n - start < space ? n - start : space;
        if (take > 0) {
            memcpy(data + filled, L->codes.data() + start, take);
            long nvalid = (n - start) - k + 1;  // windows inside the read
            if (nvalid > 0) {
                long m = nvalid < take ? nvalid : take;
                memset(mask + filled, 1, m);
            }
            filled += take;
        }
        if (filled == chunk) {
            // first window not evaluated in this chunk resumes next one
            long next_start = start + take - (k - 1);
            if (next_start < 0) next_start = 0;
            if (n - next_start < k) {
                L->read_active = false;
            } else {
                L->read_start = (size_t)next_start;
            }
            return chunk;
        }
        L->read_active = false;
    }
}

void kio_stats(void* handle, uint64_t* n_reads, uint64_t* n_consumed,
               uint64_t* n_bases) {
    Loader* L = (Loader*)handle;
    if (n_reads) *n_reads = L->n_reads;
    if (n_consumed) *n_consumed = L->n_consumed;
    if (n_bases) *n_bases = L->n_bases;
}

void kio_close(void* handle) {
    Loader* L = (Loader*)handle;
    if (L->fp) gzclose(L->fp);
    delete L;
}

}  // extern "C"

extern "C" {

// version stamp compiled into the native runtime; the python layer
// compares it with the package version (khmer.__version_cpp__()
// parity, reference tests/test_version.py)
#ifndef KHMER_TPU_VERSION
#define KHMER_TPU_VERSION "unknown"
#endif
const char* kio_version() { return KHMER_TPU_VERSION; }

}  // extern "C"
