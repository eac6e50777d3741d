"""Countgraph tests ported from the reference tests/test_countgraph.py
(medians, median_at_least boundaries, raw tables, occupied persistence)."""

import pytest

import khmer_tpu as khmer

ARGS_1m = (1e6, 2)


def test_count_1():
    hi = khmer.Countgraph(12, *ARGS_1m)

    kmer = 'G' * 12
    hashval = hi.hash('G' * 12)

    assert hi.get(kmer) == 0
    assert hi.get(hashval) == 0

    hi.count(kmer)
    assert hi.get(kmer) == 1
    assert hi.get(hashval) == 1

    hi.count(kmer)
    assert hi.get(kmer) == 2
    assert hi.get(hashval) == 2

    with pytest.raises(ValueError):
        hi.hash('G' * 11)


def test_count_2():
    hi = khmer.Countgraph(12, *ARGS_1m)
    kmer = 'G' * 12
    hashval = hi.hash('G' * 12)

    hi.count(kmer)
    hi.count(hashval)                     # count hashes same as strings
    assert hi.get(kmer) == 2
    assert hi.get(hashval) == 2


def test_get_raw_tables():
    ht = khmer.Countgraph(20, 1e5, 4)
    tables = ht.get_raw_tables()

    for size, table in zip(ht.hashsizes(), tables):
        assert isinstance(table, memoryview)
        assert size == len(table)


def test_get_raw_tables_smallcountgraph():
    # same entries, ~half the bytes
    ht = khmer.SmallCountgraph(20, 1e5, 4)
    tables = ht.get_raw_tables()

    for size, table in zip(ht.hashsizes(), tables):
        assert isinstance(table, memoryview)
        assert size // 2 + 1 == len(table)


def test_get_raw_tables_contents():
    # deviation from the reference: snapshots, not live views — re-call
    # after consuming
    ht = khmer.Countgraph(20, 1e5, 4)
    for tab in ht.get_raw_tables():
        assert sum(tab.tolist()) == 0
    ht.consume('AAAATTTTCCCCGGGGAAAA')
    for tab in ht.get_raw_tables():
        assert sum(tab.tolist()) == 1


def test_get_raw_tables_contents_smallcountgraph():
    ht = khmer.SmallCountgraph(4, 1e5, 4)
    for tab in ht.get_raw_tables():
        assert sum(tab.tolist()) == 0
    ht.consume('AAAA')
    # count 1 stored in the high nibble -> reads as 16 in the byte view
    for tab in ht.get_raw_tables():
        assert sum(tab.tolist()) == int('00010000', 2)


def test_simple_median():
    hi = khmer.Countgraph(6, 1e6, 2)

    hi.consume("AAAAAA")
    (median, average, stddev) = hi.get_median_count("AAAAAA")
    assert median == 1
    assert average == 1.0
    assert stddev == 0.0

    hi.consume("AAAAAA")
    (median, average, stddev) = hi.get_median_count("AAAAAA")
    assert median == 2
    assert average == 2.0
    assert stddev == 0.0

    hi.consume("AAAAAT")
    (median, average, stddev) = hi.get_median_count("AAAAAAT")
    assert median == 2
    assert average == 1.5
    assert int(stddev * 100) == 50

    hi.consume("AAAAAT")
    (median, average, stddev) = hi.get_median_count("AAAAAAT")
    assert median == 2
    assert average == 2.0
    assert stddev == 0.0

    hi.consume("AAAAAT")
    (median, average, stddev) = hi.get_median_count("AAAAAAT")
    assert median == 3
    assert average == 2.5
    assert int(stddev * 100) == 50


def test_median_too_short():
    hi = khmer.Countgraph(6, 1e6, 2)
    hi.consume("AAAAAA")
    with pytest.raises(ValueError):
        hi.get_median_count("A")


def test_median_at_least():
    hi = khmer.Countgraph(6, 1e6, 2)
    hi.consume("AAAAAA")
    assert hi.median_at_least("AAAAAA", 1)
    assert hi.median_at_least("AAAAAA", 2) is False


def test_median_at_least_single_gt():
    K = 20
    hi = khmer.Countgraph(K, 1e6, 2)
    kmers = ['ATCGATCGATCGATCGATCG',
             'GTACGTACGTACGTACGTAC',
             'TTAGTTAGTTAGTTAGTTAG']

    for kmer in kmers:
        hi.consume(kmer)
        assert hi.median_at_least(kmer, 1) is True


def test_median_at_least_single_lt():
    K = 20
    hi = khmer.Countgraph(K, 1e6, 2)
    kmers = ['ATCGATCGATCGATCGATCG',
             'GTACGTACGTACGTACGTAC',
             'TTAGTTAGTTAGTTAGTTAG']

    for kmer in kmers:
        hi.consume(kmer)
        assert hi.median_at_least(kmer, 2) is False


def test_median_at_least_odd_gt():
    # test w/odd number of k-mers
    K = 20
    hi = khmer.Countgraph(K, 1e6, 2)
    seqs = ['ATCGATCGATCGATCGATCGCC',
            'GTACGTACGTACGTACGTACCC',
            'TTAGTTAGTTAGTTAGTTAGCC']

    for seq in seqs:
        hi.consume(seq)
        assert hi.median_at_least(seq, 1) is True


def test_median_at_least_odd_lt():
    K = 20
    hi = khmer.Countgraph(K, 1e6, 2)
    seqs = ['ATCGATCGATCGATCGATCGCC',
            'GTACGTACGTACGTACGTACCC',
            'TTAGTTAGTTAGTTAGTTAGCC']

    for seq in seqs:
        hi.consume(seq)
        assert hi.median_at_least(seq, 2) is False


def test_median_at_least_even_gt():
    # test w/even number of k-mers
    K = 20
    hi = khmer.Countgraph(K, 1e6, 2)
    seqs = ['ATCGATCGATCGATCGATCGCCC',
            'GTACGTACGTACGTACGTACCCC',
            'TTAGTTAGTTAGTTAGTTAGCCC']

    for seq in seqs:
        hi.consume(seq)
        assert hi.median_at_least(seq, 1) is True


def test_median_at_least_even_lt():
    K = 20
    hi = khmer.Countgraph(K, 1e6, 2)
    seqs = ['ATCGATCGATCGATCGATCGCCC',
            'GTACGTACGTACGTACGTACCCC',
            'TTAGTTAGTTAGTTAGTTAGCCC']

    for seq in seqs:
        hi.consume(seq)
        assert hi.median_at_least(seq, 2) is False


def test_median_at_least_comp():
    K = 20
    C = 4
    hi = khmer.Countgraph(K, 1e6, 2)
    seqs = ['ATCGATCGATCGATCGATCGCCC',
            'GTACGTACGTACGTACGTACCCC',
            'TTAGTTAGTTAGTTAGTTAGCCC']

    for seq in seqs:
        hi.consume(seq)
        hi.consume(seq)
        hi.consume(seq)

        med, _, _ = hi.get_median_count(seq)
        assert hi.median_at_least(seq, C) is (med >= C)


def test_median_at_least_exception():
    ht = khmer.Countgraph(20, 1e6, 2)
    with pytest.raises(ValueError):
        ht.median_at_least('ATGGCTGATCGAT', 1)


def test_save_load_occupied(tmp_path):
    hi = khmer.Countgraph(12, 1e5, 2)
    hi.consume('ATCGGCATTACGGCATT')
    orig_occ = hi.n_occupied()
    path = str(tmp_path / 'test.ct')
    hi.save(path)
    hi = khmer.Countgraph.load(path)
    assert hi.n_occupied() == orig_occ


DNA = ("AGCTTTTCATTCTGACTGCAACGGGCAATATGTCTCTGTGTGGATTAAAAAAAGAGTGTCTGATAG"
       "CAGC")


def test_trim_full():
    hi = khmer.Countgraph(6, 1e6, 2)

    hi.consume(DNA)
    hi.consume(DNA)

    seq, _ = hi.trim_on_abundance(DNA, 2)
    assert DNA == seq, seq


def test_trim_short():
    hi = khmer.Countgraph(6, 1e6, 2)

    hi.consume(DNA)
    hi.consume(DNA[:50])

    seq, pos = hi.trim_on_abundance(DNA, 2)
    assert DNA[:50] == seq, (seq, pos)
    assert hi.get(seq[-6:]) == 2
    assert hi.get(DNA[:51][-6:]) == 1


# ---------------------------------------------------------------------------
# round 3: the rest of the reference file (collisions, save/load
# matrix, bigcount, spectral errors, tag retrieval, arg errors)
# ---------------------------------------------------------------------------

import gzip
import os

from . import khmer_tst_utils as utils
from .khmer_tst_utils import screed_open

MAX_COUNT = 255
MAX_BIGCOUNT = 65535

# from http://www.rsok.com/~jrm/printprimes.html
PRIMES_1m = [1000003, 1009837]

DNA = ("AGCTTTTCATTCTGACTGCAACGGGCAATATGTCTCTGTGTGGATTAAAAAAAGAGTG"
       "TCTGATAGCAGC")


def test_revhash_1():
    hi = khmer.Countgraph(12, 1, 1)
    kmer = 'C' * 12
    hashval = hi.hash('C' * 12)

    assert hi.reverse_hash(hashval) == kmer


class Test_Countgraph(object):

    def setup_method(self):
        self.hi = khmer.Countgraph(12, 1, 1, primes=PRIMES_1m)

    def test_failed_get(self):
        GG = 'G' * 12                   # forward_hash: 11184810
        GGhash = khmer.forward_hash(GG, 12)
        assert khmer.forward_hash(GG, 12) == 11184810

        hi = self.hi
        hi.consume(GG)

        with pytest.raises(TypeError):
            hi.get(float(GGhash))

    def test_collision_1(self):
        GG = 'G' * 12                   # forward_hash: 11184810
        GGhash = khmer.forward_hash(GG, 12)
        assert khmer.forward_hash(GG, 12) == 11184810

        collision_1 = 'AAACGTATGACT'
        assert khmer.forward_hash(collision_1, 12) == 184777

        collision_2 = 'AAATACCGAGCG'
        assert khmer.forward_hash(collision_2, 12) == 76603

        # note, hash(GG) % 1000003 == hash(collision_1)
        # note, hash(GG) % 1009837 == hash(collision_2)

        hi = self.hi
        hi.consume(GG)
        hi.consume(collision_1)

        assert hi.get(GG) == 1
        assert hi.get(GGhash) == 1

    def test_collision_2(self):
        GG = 'G' * 12
        collision_2 = 'AAATACCGAGCG'

        hi = self.hi
        hi.consume(GG)
        hi.consume(collision_2)

        assert hi.get(GG) == 1

    def test_collision_3(self):
        GG = 'G' * 12
        collision_1 = 'AAACGTATGACT'
        collision_2 = 'AAATACCGAGCG'

        hi = self.hi
        hi.consume(GG)
        hi.consume(collision_1)
        hi.consume(collision_2)

        assert hi.get(GG) == 2


@pytest.mark.huge
def test_toobig():
    try:
        khmer.Countgraph(30, 1e13, 1)
        assert 0, "this should fail"
    except MemoryError as err:
        print(str(err))


def test_3_tables():
    x = list(PRIMES_1m)
    x.append(1000005)

    hi = khmer.Countgraph(12, 1, 1, primes=x)

    GG = 'G' * 12
    collision_1 = 'AAACGTATGACT'
    collision_2 = 'AAATACCGAGCG'
    collision_3 = 'AAACGTATCGAG'
    assert khmer.forward_hash(collision_3, 12) == 184755

    hi.consume(GG)
    assert hi.get(GG) == 1

    hi.consume(collision_1)
    assert hi.get(GG) == 1

    hi.consume(collision_2)
    assert hi.get(GG) == 1

    hi.consume(collision_3)
    assert hi.get(GG) == 2


def test_get_kmer_counts_too_short():
    hi = khmer.Countgraph(6, 1e6, 2)
    hi.consume("AAAAAA")
    with pytest.raises(ValueError):
        hi.get_kmer_counts("A")


def test_get_kmer_hashes_too_short():
    hi = khmer.Countgraph(6, 1e6, 2)
    hi.consume("AAAAAA")
    with pytest.raises(ValueError):
        hi.get_kmer_hashes("A")


def test_get_kmers_too_short():
    hi = khmer.Countgraph(6, 1e6, 2)
    hi.consume("AAAAAA")
    with pytest.raises(ValueError):
        hi.get_kmers("A")


def test_get_kmer_counts():
    hi = khmer.Countgraph(6, 1e6, 2)

    hi.consume("AAAAAA")
    counts = hi.get_kmer_counts("AAAAAA")
    assert len(counts) == 1
    assert counts[0] == 1

    hi.consume("AAAAAA")
    counts = hi.get_kmer_counts("AAAAAA")
    assert len(counts) == 1
    assert counts[0] == 2

    hi.consume("AAAAAT")
    counts = hi.get_kmer_counts("AAAAAAT")
    assert len(counts) == 2
    assert counts[0] == 2
    assert counts[1] == 1

    hi.consume("AAAAAT")
    counts = hi.get_kmer_counts("AAAAAAT")
    assert len(counts) == 2
    assert counts[0] == 2
    assert counts[1] == 2

    hi.consume("AAAAAT")
    counts = hi.get_kmer_counts("AAAAAAT")
    assert len(counts) == 2
    assert counts[0] == 2
    assert counts[1] == 3


def test_get_kmer_hashes():
    hi = khmer.Countgraph(6, 1e6, 2)

    hi.consume("AAAAAA")
    hashes = hi.get_kmer_hashes("AAAAAA")
    assert len(hashes) == 1
    assert hi.get(hashes[0]) == 1

    hi.consume("AAAAAT")
    hi.consume("AAAAAT")
    hi.consume("AAAAAT")
    hashes = hi.get_kmer_hashes("AAAAAAT")
    assert len(hashes) == 2
    assert hi.get(hashes[0]) == 1
    assert hi.get(hashes[1]) == 3


def test_get_kmer_hashes_as_hashset():
    hi = khmer.Countgraph(6, 1e6, 2)

    def get_counts(hs):
        return list(sorted([hi.get(h) for h in hs]))

    hi.consume("AAAAAA")
    hashes = hi.get_kmer_hashes_as_hashset("AAAAAA")
    assert len(hashes) == 1
    assert [1] == get_counts(hashes)

    hi.consume("AAAAAA")
    hashes = hi.get_kmer_hashes_as_hashset("AAAAAA")
    assert len(hashes) == 1
    assert [2] == get_counts(hashes)

    hi.consume("AAAAAT")
    hashes = hi.get_kmer_hashes_as_hashset("AAAAAAT")
    assert len(hashes) == 2
    assert [1, 2] == get_counts(hashes)

    hi.consume("AAAAAT")
    hashes = hi.get_kmer_hashes_as_hashset("AAAAAAT")
    assert len(hashes) == 2
    assert [2, 2] == get_counts(hashes)

    hi.consume("AAAAAT")
    hashes = hi.get_kmer_hashes_as_hashset("AAAAAAT")
    assert len(hashes) == 2
    assert [2, 3] == get_counts(hashes)


def test_get_kmers():
    hi = khmer.Countgraph(6, 1e6, 2)

    kmers = hi.get_kmers("AAAAAA")
    assert kmers == ["AAAAAA"]

    kmers = hi.get_kmers("AAAAAAT")
    assert kmers == ["AAAAAA", "AAAAAT"]

    kmers = hi.get_kmers("AGCTTTTC")
    assert kmers == ['AGCTTT', 'GCTTTT', 'CTTTTC']


@pytest.mark.huge
@pytest.mark.parametrize("ctfile", ['temp.ct', 'temp.ct.gz'])
def test_save_load_large(ctfile):
    inpath = utils.get_test_data('random-20-a.fa')
    savepath = utils.get_temp_filename(ctfile)

    orig = khmer.Countgraph(12, 2**31, 1)
    orig.consume_seqfile(inpath)
    orig.save(savepath)

    loaded = khmer.Countgraph.load(savepath)
    assert orig.n_occupied() == 3966
    assert loaded.n_occupied() == orig.n_occupied()


@pytest.mark.parametrize("ctfile", ['temp.ct', 'temp.ct.gz'])
def test_save_load_occupied_small(ctfile):
    inpath = utils.get_test_data('random-20-a.fa')
    savepath = utils.get_temp_filename(ctfile)

    orig = khmer.SmallCountgraph(12, 1e5, 4)
    orig.consume_seqfile(inpath)
    orig.save(savepath)

    loaded = khmer.SmallCountgraph.load(savepath)

    orig_count = orig.n_occupied()
    loaded_count = loaded.n_occupied()
    assert orig_count == 3886, orig_count
    assert loaded_count == orig_count, loaded_count


def test_save_load():
    inpath = utils.get_test_data('random-20-a.fa')
    savepath = utils.get_temp_filename('tempcountingsave0.ht')

    sizes = list(PRIMES_1m)
    sizes.append(1000005)

    hi = khmer.Countgraph(12, 1, 1, primes=sizes)
    hi.consume_seqfile(inpath)
    hi.save(savepath)

    ht = khmer.Countgraph.load(savepath)

    tracking = khmer.Nodegraph(12, 1, 1, primes=sizes)
    x = hi.abundance_distribution(inpath, tracking)

    tracking = khmer.Nodegraph(12, 1, 1, primes=sizes)
    y = ht.abundance_distribution(inpath, tracking)

    assert sum(x) == 3966, sum(x)
    assert list(x) == list(y), (x, y)


def test_load_truncated():
    inpath = utils.get_test_data('random-20-a.fa')
    savepath = utils.get_temp_filename('save.ht')
    truncpath = utils.get_temp_filename('trunc.ht')

    hi = khmer.Countgraph(12, 200, 3)
    hi.consume_seqfile(inpath)
    hi.save(savepath)

    data = open(savepath, 'rb').read()
    # every strict prefix must fail to load (sampled for speed; the
    # reference loops every byte offset)
    for i in list(range(0, min(200, len(data)))) + \
            list(range(200, len(data), 97)):
        fp = open(truncpath, 'wb')
        fp.write(data[:i])
        fp.close()

        try:
            khmer.Countgraph.load(truncpath)
            assert 0, "this should not be reached!"
        except OSError as err:
            print(str(err))


def test_load_gz():
    inpath = utils.get_test_data('random-20-a.fa')

    savepath = utils.get_temp_filename('tempcountingsave1.ht')
    loadpath = utils.get_temp_filename('tempcountingsave1.ht.gz')

    sizes = list(PRIMES_1m)
    sizes.append(1000005)

    # save uncompressed hashtable.
    hi = khmer.Countgraph(12, 1, 1, primes=sizes)
    hi.consume_seqfile(inpath)
    hi.save(savepath)

    # compress.
    in_file = open(savepath, 'rb')
    out_file = gzip.open(loadpath, 'wb')
    out_file.writelines(in_file)
    out_file.close()
    in_file.close()

    # load compressed hashtable.
    ht = khmer.Countgraph.load(loadpath)

    tracking = khmer.Nodegraph(12, 1, 1, primes=sizes)
    x = hi.abundance_distribution(inpath, tracking)

    tracking = khmer.Nodegraph(12, 1, 1, primes=sizes)
    y = ht.abundance_distribution(inpath, tracking)

    assert sum(x) == 3966, sum(x)
    assert list(x) == list(y), (x, y)


def test_save_load_gz():
    inpath = utils.get_test_data('random-20-a.fa')
    savepath = utils.get_temp_filename('tempcountingsave2.ht.gz')

    sizes = list(PRIMES_1m)
    sizes.append(1000005)

    hi = khmer.Countgraph(12, 1, 1, primes=sizes)
    hi.consume_seqfile(inpath)
    hi.save(savepath)

    ht = khmer.Countgraph.load(savepath)

    tracking = khmer.Nodegraph(12, 1, 1, primes=sizes)
    x = hi.abundance_distribution(inpath, tracking)

    tracking = khmer.Nodegraph(12, 1, 1, primes=sizes)
    y = ht.abundance_distribution(inpath, tracking)

    assert sum(x) == 3966, sum(x)
    assert list(x) == list(y), (x, y)


@pytest.mark.parametrize("ext", ['', '.gz'])
def test_load_empty_files(ext):
    # Check empty files, compressed or not
    fname = utils.get_test_data('empty-file' + ext)
    with pytest.raises(OSError):
        khmer.Countgraph.load(fname)


def test_find_spectral_error_positions_1():
    hi = khmer.Countgraph(8, 1e6, 2)

    hi.consume(DNA)
    hi.consume(DNA[:30])

    posns = hi.find_spectral_error_positions(DNA, 1)
    assert posns == [30], posns


def test_find_spectral_error_positions_2():
    hi = khmer.Countgraph(8, 1e6, 2)

    hi.consume(DNA)
    hi.consume(DNA)

    posns = hi.find_spectral_error_positions(DNA, 2)
    assert posns == [], posns


def test_find_spectral_error_positions_6():
    hi = khmer.Countgraph(8, 1e6, 2)

    hi.consume(DNA)
    hi.consume(DNA[1:])

    posns = hi.find_spectral_error_positions(DNA, 1)
    assert posns == [0], posns


def test_find_spectral_error_positions_4():
    hi = khmer.Countgraph(8, 1e6, 2)

    hi.consume(DNA)

    posns = hi.find_spectral_error_positions(DNA, 2)
    assert posns == [], posns


def test_find_spectral_error_positions_5():
    hi = khmer.Countgraph(8, 1e6, 2)

    hi.consume(DNA)
    hi.consume(DNA[:10])
    hi.consume(DNA[11:])

    posns = hi.find_spectral_error_positions(DNA, 1)
    assert posns == [10], posns


def test_find_spectral_error_locs7():
    K = 8
    hi = khmer.Countgraph(K, 1e6, 2)

    hi.consume(DNA)
    hi.consume(DNA[K:])

    posns = hi.find_spectral_error_positions(DNA, 1)
    assert posns == [7], posns


def test_find_spectral_error_positions_err():
    hi = khmer.Countgraph(8, 1e6, 2)

    with pytest.raises(ValueError):
        hi.find_spectral_error_positions(DNA[:6], 1)


def test_maxcount():
    # hashtable should saturate at some point so as not to overflow
    kh = khmer.Countgraph(4, 4 ** 4, 4)
    kh.set_use_bigcount(False)

    last_count = None
    for _ in range(0, 1000):
        kh.count('AAAA')
        c = kh.get('AAAA')

        if c == last_count:
            break
        last_count = c

    assert c != 1000, "should not be able to count to 1000: %d" % c
    assert c == MAX_COUNT, c


def test_maxcount_with_bigcount():
    # hashtable should not saturate if use_bigcount is set.
    kh = khmer.Countgraph(4, 4 ** 4, 4)
    kh.set_use_bigcount(True)

    last_count = None
    for _ in range(0, 1000):
        kh.count('AAAA')
        c = kh.get('AAAA')

        if c == last_count:
            break
        last_count = c

    assert c == 1000, "should be able to count to 1000: %d" % c
    assert c != MAX_COUNT, c


def test_maxcount_with_bigcount_save():
    kh = khmer.Countgraph(4, 4 ** 4, 4)
    kh.set_use_bigcount(True)

    for _ in range(0, 1000):
        kh.count('AAAA')
        c = kh.get('AAAA')

    savepath = utils.get_temp_filename('tempcountingsave.ht')
    kh.save(savepath)

    kh = khmer.Countgraph.load(savepath)

    c = kh.get('AAAA')
    assert c == 1000, "should be able to count to 1000: %d" % c
    assert c != MAX_COUNT, c


def test_bigcount_save():
    kh = khmer.Countgraph(4, 4 ** 4, 4)
    kh.set_use_bigcount(True)

    savepath = utils.get_temp_filename('tempcountingsave.ht')
    kh.save(savepath)

    kh = khmer.Countgraph.load(savepath)

    # set_use_bigcount should still be True after load
    assert kh.get('AAAA') == 0

    for _ in range(0, 1000):
        kh.count('AAAA')
        kh.get('AAAA')

    assert kh.get('AAAA') == 1000


def test_nobigcount_save():
    kh = khmer.Countgraph(4, 4 ** 4, 4)
    kh.set_use_bigcount(False)

    savepath = utils.get_temp_filename('tempcountingsave.ht')
    kh.save(savepath)

    kh = khmer.Countgraph.load(savepath)

    # set_use_bigcount should still be False after load
    assert kh.get('AAAA') == 0

    for _ in range(0, 1000):
        kh.count('AAAA')
        kh.get('AAAA')

    assert kh.get('AAAA') == MAX_COUNT


def test_bigcount_abund_dist():
    kh = khmer.Countgraph(18, 1e2, 4)
    tracking = khmer.Nodegraph(18, 1e2, 4)
    kh.set_use_bigcount(True)

    seqpath = utils.get_test_data('test-abund-read-2.fa')

    kh.consume_seqfile(seqpath)

    dist = kh.abundance_distribution(seqpath, tracking)

    pdist = [(i, dist[i]) for i in range(len(dist)) if dist[i]]
    assert dist[1002] == 1, pdist


def test_bigcount_abund_dist_2():
    kh = khmer.Countgraph(18, 1e7, 4)
    tracking = khmer.Nodegraph(18, 1e7, 4)
    kh.set_use_bigcount(True)

    seqpath = utils.get_test_data('test-abund-read.fa')

    kh.consume_seqfile(seqpath)
    for i in range(1000):
        kh.count('GGTTGACGGGGCTCAGGG')

    dist = kh.abundance_distribution(seqpath, tracking)

    pdist = [(i, dist[i]) for i in range(len(dist)) if dist[i]]
    assert dist[1001] == 1, pdist


def test_bigcount_overflow():
    kh = khmer.Countgraph(18, 1e7, 4)
    kh.set_use_bigcount(True)

    # (batched: the reference loops 70000 single counts)
    import numpy as np

    h = kh.hash('GGTTGACGGGGCTCAGGG')
    kh.storage.add_batch(np.full(70000, h, np.uint64))

    assert kh.get('GGTTGACGGGGCTCAGGG') == MAX_BIGCOUNT


def test_get_ksize():
    kh = khmer.Countgraph(22, 1, 1)
    assert kh.ksize() == 22


def test_get_hashsizes():
    kh = khmer.Countgraph(22, 100, 4)
    expected = utils.longify([97, 89, 83, 79])
    assert kh.hashsizes() == expected, kh.hashsizes()


def test_load_notexist_should_fail():
    savepath = utils.get_temp_filename('tempcountingsave0.ht')

    with pytest.raises(OSError):
        khmer.Countgraph.load(savepath)


def test_load_truncated_should_fail():
    inpath = utils.get_test_data('random-20-a.fa')
    savepath = utils.get_temp_filename('tempcountingsave0.ht')

    hi = khmer.Countgraph(12, 1000, 2)
    hi.consume_seqfile(inpath)
    hi.save(savepath)

    fp = open(savepath, 'rb')
    data = fp.read()
    fp.close()

    fp = open(savepath, 'wb')
    fp.write(data[:1000])
    fp.close()

    with pytest.raises(OSError):
        khmer.Countgraph.load(savepath)


def test_load_gz_notexist_should_fail():
    savepath = utils.get_temp_filename('tempcountingsave0.ht.gz')

    with pytest.raises(OSError):
        khmer.Countgraph.load(savepath)


def test_load_gz_truncated_should_fail():
    inpath = utils.get_test_data('random-20-a.fa')
    savepath = utils.get_temp_filename('tempcountingsave0.ht.gz')

    hi = khmer.Countgraph(12, 1000, 2)
    hi.consume_seqfile(inpath)
    hi.save(savepath)

    fp = open(savepath, 'rb')
    data = fp.read()
    fp.close()

    fp = open(savepath, 'wb')
    fp.write(data[:1000])
    fp.close()

    with pytest.raises(OSError):
        khmer.Countgraph.load(savepath)


def test_counting_file_version_check():
    inpath = utils.get_test_data('badversion-k12.ct')

    with pytest.raises(OSError):
        khmer.Countgraph.load(inpath)


def test_counting_gz_file_version_check():
    inpath = utils.get_test_data('badversion-k12.ct.gz')

    with pytest.raises(OSError):
        khmer.Countgraph.load(inpath)


def test_counting_file_type_check():
    inpath = utils.get_test_data('goodversion-k12.ht')

    with pytest.raises(OSError):
        khmer.Countgraph.load(inpath)


def test_counting_gz_file_type_check():
    inpath = utils.get_test_data('goodversion-k12.ht.gz')

    with pytest.raises(OSError):
        khmer.Countgraph.load(inpath)


def test_counting_bad_primes_list():
    with pytest.raises((TypeError, ValueError)):
        khmer.Countgraph(12, 1, 1, primes=["a", "b", "c"])


def test_bad_use_bigcount():
    countgraph = khmer.Countgraph(4, 4 ** 4, 4)
    countgraph.set_use_bigcount(True)
    assert countgraph.get_use_bigcount()
    with pytest.raises(TypeError):
        countgraph.get_use_bigcount(True)


def test_consume_absentfasta():
    countgraph = khmer.Countgraph(4, 4 ** 4, 4)
    with pytest.raises(TypeError):
        countgraph.consume_seqfile()
    from khmer_tpu import ReadParser

    with pytest.raises((OSError, ValueError)):
        readparser = ReadParser(utils.get_test_data('empty-file'))
        countgraph.consume_seqfile(readparser)


def test_badconsume():
    countgraph = khmer.Countgraph(4, 4 ** 4, 4)
    with pytest.raises(TypeError):
        countgraph.consume()
    with pytest.raises(ValueError):
        countgraph.consume("AAA")


def test_get_badmin_count():
    countgraph = khmer.Countgraph(4, 4 ** 4, 4)
    with pytest.raises(TypeError):
        countgraph.get_min_count()
    with pytest.raises(ValueError):
        countgraph.get_min_count("AAA")


def test_get_badmax_count():
    countgraph = khmer.Countgraph(4, 4 ** 4, 4)
    with pytest.raises(TypeError):
        countgraph.get_max_count()
    with pytest.raises(ValueError):
        countgraph.get_max_count("AAA")


def test_get_badmedian_count():
    countgraph = khmer.Countgraph(4, 4 ** 4, 4)
    with pytest.raises(TypeError):
        countgraph.get_median_count()
    with pytest.raises(ValueError):
        countgraph.get_median_count("AAA")


def test_badget():
    countgraph = khmer.Countgraph(4, 4 ** 4, 4)
    with pytest.raises(TypeError):
        countgraph.get()


def test_badget_2():
    countgraph = khmer.Countgraph(6, 1e6, 2)

    countgraph.consume(DNA)

    assert countgraph.get("AGCTTT") == 1
    assert countgraph.get("GATGAG") == 0

    with pytest.raises(ValueError):
        countgraph.get("AGCTT")


def test_badtrim():
    countgraph = khmer.Countgraph(6, 1e6, 2)

    countgraph.consume(DNA)
    with pytest.raises(TypeError):
        countgraph.trim_on_abundance()
    countgraph.trim_on_abundance("AAAAAA", 1)


def test_badload():
    with pytest.raises(TypeError):
        khmer.Countgraph.load()


def test_badsave():
    countgraph = khmer.Countgraph(4, 4 ** 4, 4)
    with pytest.raises(TypeError):
        countgraph.save()


def test_badksize():
    countgraph = khmer.Countgraph(4, 4 ** 4, 4)
    with pytest.raises(TypeError):
        countgraph.ksize(True)


def test_badhashsizes():
    countgraph = khmer.Countgraph(4, 4 ** 4, 4)
    with pytest.raises(TypeError):
        countgraph.hashsizes(True)


def test_badconsume_and_tag():
    countgraph = khmer.Countgraph(4, 4 ** 4, 4)
    with pytest.raises(TypeError):
        countgraph.consume_and_tag()


def test_consume_seqfile_and_tag():
    countgraph = khmer.Countgraph(4, 4 ** 4, 4)
    with pytest.raises(TypeError):
        countgraph.consume_seqfile_and_tag()
    countgraph.consume_seqfile_and_tag(
        utils.get_test_data("test-graph2.fa"))


def test_consume_and_retrieve_tags_1():
    ct = khmer.Countgraph(4, 4 ** 4, 4)

    # first, for each sequence, build tags.
    for record in screed_open(utils.get_test_data('test-graph2.fa')):
        ct.consume_and_tag(record.sequence)

    # check that all the tags in sequences are retrieved by iterating
    # across the sequence and retrieving by neighborhood.

    ss = set()
    tt = set()
    for record in screed_open(utils.get_test_data('test-graph2.fa')):
        for _, tag in ct.get_tags_and_positions(record.sequence):
            ss.add(tag)

        for start in range(len(record.sequence) - 3):
            kmer = record.sequence[start:start + 4]
            tt.update(ct.find_all_tags_list(kmer))

    assert ss == tt


def test_consume_and_retrieve_tags_empty():
    ct = khmer.Countgraph(4, 4 ** 4, 4)

    # load each sequence but do not build tags: everything stays empty
    for record in screed_open(utils.get_test_data('test-graph2.fa')):
        ct.consume(record.sequence)

    ss = set()
    tt = set()
    for record in screed_open(utils.get_test_data('test-graph2.fa')):
        for _, tag in ct.get_tags_and_positions(record.sequence):
            ss.add(tag)

        for start in range(len(record.sequence) - 3):
            kmer = record.sequence[start:start + 4]
            tt.update(ct.find_all_tags_list(kmer))

    assert not ss
    assert not tt


def test_find_all_tags_list_error():
    ct = khmer.Countgraph(4, 4 ** 4, 4)

    for record in screed_open(utils.get_test_data('test-graph2.fa')):
        ct.consume(record.sequence)

    with pytest.raises(ValueError):
        ct.find_all_tags_list("ATA")

    with pytest.raises(ValueError):
        ct.find_all_tags_list("ATAGA")


def test_abund_dist_gz_bigcount():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    script = 'load-into-counting.py'
    htfile = utils.get_temp_filename('test_ct')
    args = ['-x', str(1e7), '-N', str(2), '-k', str(2), htfile, infile]
    utils.runscript(script, args)  # create a bigcount table
    assert os.path.exists(htfile)
    data = open(htfile, 'rb').read()

    outfile = utils.get_temp_filename('test_ct.gz')
    f_out = gzip.open(outfile, 'wb')  # compress the bigcount table
    f_out.write(data)
    f_out.close()
    # load the compressed bigcount table
    countgraph = khmer.Countgraph.load(outfile)

    assert countgraph.n_occupied() != 0
    hashsizes = countgraph.hashsizes()
    kmer_size = countgraph.ksize()
    tracking = khmer.Nodegraph(kmer_size, 1, 1, primes=hashsizes)
    abundances = countgraph.abundance_distribution(infile, tracking)
    # if any abundance is > 255 the gzipped bigcount loaded correctly
    assert any(i > 0 for n, i in enumerate(abundances) if n > 255), \
        [(n, i) for n, i in enumerate(abundances) if i]


def test_abund_dist_gz_bigcount_compressed_first():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    script = 'load-into-counting.py'
    htfile = utils.get_temp_filename('test_ct.gz')
    args = ['-x', str(1e7), '-N', str(2), '-k', str(2), htfile, infile]
    utils.runscript(script, args)  # create a gzipped bigcount table
    assert os.path.exists(htfile)
    data = gzip.open(htfile, 'rb').read()  # decompress

    outfile = utils.get_temp_filename('test_ct')
    f_out = open(outfile, 'wb')
    f_out.write(data)
    f_out.close()
    countgraph = khmer.Countgraph.load(outfile)

    assert countgraph.n_occupied() != 0
    hashsizes = countgraph.hashsizes()
    kmer_size = countgraph.ksize()
    tracking = khmer.Nodegraph(kmer_size, 1, 1, primes=hashsizes)
    abundances = countgraph.abundance_distribution(infile, tracking)
    assert any(i > 0 for n, i in enumerate(abundances) if n > 255), \
        [(n, i) for n, i in enumerate(abundances) if i]


def test_counting_load_bigcount():
    count_table = khmer.Countgraph(10, 1e5, 4)
    count_table.set_use_bigcount(True)
    for i in range(500):
        count_table.count('ATATATATAT')
    count = count_table.get('ATATATATAT')
    assert count == 500


def test_get_raw_tables_view():
    # DEVIATION from the reference: its memoryviews alias host RAM and
    # update live; here the table lives in device HBM, so
    # get_raw_tables() returns snapshots and must be re-called after
    # updates (documented on the method).  The substance — the consume
    # lands in the raw bytes — is asserted identically.
    ht = khmer.Countgraph(20, 1e5, 4)
    for tab in ht.get_raw_tables():
        assert sum(tab.tolist()) == 0
    ht.consume('AAAATTTTCCCCGGGGAAAA')
    for tab in ht.get_raw_tables():
        assert sum(tab.tolist()) == 1


def test_get_raw_tables_view_smallcountgraph():
    # (snapshot semantics; see test_get_raw_tables_view)
    ht = khmer.SmallCountgraph(4, 1e5, 4)
    for tab in ht.get_raw_tables():
        assert sum(tab.tolist()) == 0
    ht.consume('AAAA')
    # the actual count is 1 but stored in the first 4 bits of a byte
    # and so becomes 16
    for tab in ht.get_raw_tables():
        assert sum(tab.tolist()) == int('00010000', 2)
