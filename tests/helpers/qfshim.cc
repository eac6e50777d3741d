// Test shim around the reference MQF library (compiled from
// /root/reference/third-party/MQF/gqf.c): create/insert/count/save in
// exactly the QFStorage::save byte layout (storage.cc:919-936).
#include <fstream>
#include "gqf.h"
extern "C" {
void* qfs_create(uint64_t nslots, uint64_t key_bits,
                 uint64_t fixed_counter_size) {
    QF* qf = new QF;
    qf_init(qf, nslots, key_bits, 0, fixed_counter_size, 0,
            true, "", 2038074761);
    return qf;
}
void qfs_insert(void* h, uint64_t key, uint64_t count) {
    QF* qf = (QF*)h;
    qf_insert(qf, key % qf->metadata->range, count, false, false);
}
uint64_t qfs_count(void* h, uint64_t key) {
    QF* qf = (QF*)h;
    return qf_count_key(qf, key % qf->metadata->range);
}
uint64_t qfs_range_low(void* h) {
    QF* qf = (QF*)h;
    return (uint64_t)qf->metadata->range;
}
void qfs_save(void* h, const char* path, unsigned char ksize) {
    QF* qf = (QF*)h;
    std::ofstream out(path, std::ios::binary);
    unsigned char version = 4;
    unsigned char ht_type = 8;  // SAVED_QFCOUNT
    out.write("OXLI", 4);
    out.write((const char*)&version, 1);
    out.write((const char*)&ht_type, 1);
    out.write((const char*)&ksize, sizeof(ksize));
    out.write((const char*)qf->metadata, sizeof(qfmetadata));
    out.write((const char*)qf->blocks, qf->metadata->size);
}
int qfs_load(void* h, const char* path, unsigned char* ksize) {
    // QFStorage::load equivalent: header + metadata + blocks
    QF* qf = (QF*)h;
    std::ifstream in(path, std::ios::binary);
    char sig[4]; unsigned char version, ht_type;
    in.read(sig, 4); in.read((char*)&version, 1); in.read((char*)&ht_type, 1);
    if (std::string(sig, 4) != "OXLI" || ht_type != 8) return -1;
    in.read((char*)ksize, 1);
    // free old storage, read metadata then matching blocks
    qfmetadata meta;
    in.read((char*)&meta, sizeof(qfmetadata));
    *(qf->metadata) = meta;
    in.read((char*)qf->blocks, qf->metadata->size);
    return in.good() ? 0 : -2;
}
void qfs_destroy(void* h) {
    QF* qf = (QF*)h;
    qf_destroy(qf);
    delete qf;
}
}
