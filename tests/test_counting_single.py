"""Countgraph single-table behavior, ported from the reference
tests/test_counting_single.py (collision semantics, saturation,
bigcount, rc-awareness, occupancy)."""

import os

import khmer_tpu as khmer

from .conftest import REF_TEST_DATA

MAX_COUNT = 255


def _data(name):
    return os.path.join(REF_TEST_DATA, name)


def test_collision():
    kh = khmer.Countgraph(4, 100, 1)

    kh.count('AAAA')
    assert kh.get('AAAA') == 1

    kh.count('TTTT')
    assert kh.get('TTTT') == 2


def test_badcount():
    countgraph = khmer.Countgraph(4, 1, 1)
    try:
        countgraph.count()
        assert 0, "count should require one argument"
    except TypeError as err:
        print(str(err))
    try:
        countgraph.count('ABCDE')
        assert 0, "count should require k-mer size to be equal"
    except ValueError as err:
        print(str(err))


def test_complete_no_collision():
    kh = khmer.Countgraph(4, 1, 1, primes=[4 ** 4])

    n_entries = kh.hashsizes()[0]

    for i in range(0, n_entries):
        s = khmer.reverse_hash(i, 4)
        kh.count(s)

    n_palindromes = 0
    n_rc_filled = 0
    n_fwd_filled = 0

    for i in range(0, n_entries):
        s = khmer.reverse_hash(i, 4)
        if kh.get(s):                   # string hashing is rc aware
            n_rc_filled += 1
        if kh.get(s) == 1:              # palindromes are singular
            n_palindromes += 1
        if kh.get(i):                   # int hashing is not rc aware
            n_fwd_filled += 1

    assert n_rc_filled == n_entries, n_rc_filled
    assert n_palindromes == 16, n_palindromes
    assert n_fwd_filled == n_entries // 2 + n_palindromes // 2, \
        (n_fwd_filled, n_entries // 2 + n_palindromes // 2)


def test_complete_2_collision():
    kh = khmer.Countgraph(4, 7, 1)

    n_entries = kh.hashsizes()[0]
    for i in range(0, n_entries):
        s = khmer.reverse_hash(i, 4)
        kh.count(s)

    n_rc_filled = 0

    for i in range(0, 128):
        s = khmer.reverse_hash(i, 4)
        if kh.get(s):                   # string hashing is rc aware
            n_rc_filled += 1

    assert n_rc_filled == 128, n_rc_filled


def test_complete_4_collision():
    kh = khmer.Countgraph(4, 5, 1)

    n_entries = kh.hashsizes()[0]

    for i in range(0, n_entries):
        s = khmer.reverse_hash(i, 4)
        kh.count(s)

    n_rc_filled = 0

    for i in range(0, 64):
        s = khmer.reverse_hash(i, 4)
        if kh.get(s):                   # string hashing is rc aware
            n_rc_filled += 1

    assert n_rc_filled == 64, n_rc_filled


def test_maxcount():
    # hashtable should saturate so as not to overflow the counter
    kh = khmer.Countgraph(4, 100, 1)

    last_count = None
    c = None
    for _ in range(0, 10000):
        kh.count('AAAA')
        c = kh.get('AAAA')

        if c == last_count:
            break
        last_count = c

    assert c != 10000, "should not be able to count to 10000"
    assert c == MAX_COUNT


def test_maxcount_with_bigcount():
    # hashtable should not saturate if use_bigcount is set
    kh = khmer.Countgraph(4, 100, 1)
    kh.set_use_bigcount(True)

    last_count = None
    c = None
    for _ in range(0, 10000):
        kh.count('AAAA')
        c = kh.get('AAAA')

        if c == last_count:
            break
        last_count = c

    assert c == 10000, "should be able to count to 10000"
    assert c != MAX_COUNT


def test_consume_uniqify_first():
    kh = khmer.Countgraph(4, 100, 1)

    kh.consume("TTTT")
    assert kh.get("AAAA") == 1


def test_maxcount_consume():
    kh = khmer.Countgraph(4, 100, 1)

    kh.consume("A" * 10000)

    assert kh.get('AAAA') == MAX_COUNT


def test_maxcount_consume_with_bigcount():
    kh = khmer.Countgraph(4, 100, 1)
    kh.set_use_bigcount(True)

    kh.consume("A" * 10000)

    assert kh.get('AAAA') == 10000 - 3


def test_get_mincount():
    kh = khmer.Countgraph(4, 100, 1)

    s = "AAAAACGT"
    kh.consume(s)

    assert kh.get_min_count(s) == 1

    kh.consume(s)
    assert kh.get_min_count(s) == 2


def test_get_maxcount():
    kh = khmer.Countgraph(4, 9, 1)

    s = "AAAAACGT"
    kh.consume(s)

    assert kh.get_max_count(s) == 2

    kh.consume(s)
    assert kh.get_max_count(s) == 4


def test_get_maxcount_rc():
    kh = khmer.Countgraph(4, 9, 1)

    s = "AAAAACGT"
    src = "ACGTTTTT"
    kh.consume(s)

    assert kh.get_max_count(s) == 2

    kh.consume(src)
    assert kh.get_max_count(s) == 4


def test_get_mincount_rc():
    kh = khmer.Countgraph(4, 100, 1)

    s = "AAAAACGT"
    src = "ACGTTTTT"

    kh.consume(s)
    assert kh.get_min_count(s) == 1

    kh.consume(src)
    assert kh.get_min_count(s) == 2


def test_badget():
    kh = khmer.Countgraph(6, 4 ** 10, 1)

    DNA = ("AGCTTTTCATTCTGACTGCAACGGGCAATATGTCTCTGTGTGGATTAAAAAAAGAGTG"
           "TCTGATAG")

    kh.consume(DNA)

    assert kh.get("AGCTTT") == 1
    assert kh.get("GATGAG") == 0

    try:
        kh.get("AGCTT")
        assert 0, "this should fail"
    except ValueError as err:
        print(str(err))


def test_64bitshift():
    kh = khmer.Countgraph(25, 4, 1)
    fullstr = ("GTATGCCAGCTCCAACTGGGCCGGTACGAGCAGGCCATTGCCTCTTGCCGCGATGC"
               "GTCGGCG")
    substr = "ATGCCAGCTCCAACTGGGCCGGTACGAGCAGGCCATTGCCTCTTGC"

    kh.consume(fullstr)
    assert 0 < kh.get_min_count(substr), kh.get_min_count(substr)


def test_64bitshift_2():
    kh = khmer.Countgraph(25, 4, 1)
    fullstr = ("GTATGCCAGCTCCAACTGGGCCGGTACGAGCAGGCCATTGCCTCTTGCCGCGATGC"
               "GTCGGCG")

    kh.consume(fullstr)
    for i in range(len(fullstr) - 25 + 1):
        substr = fullstr[i:i + 25]
        assert kh.get(substr) > 0


def test_very_short_read():
    short_filename = _data('test-short.fa')
    kh = khmer.Countgraph(9, 4, 1)
    n_reads, n_kmers = kh.consume_seqfile(short_filename)
    assert n_reads == 1, n_reads
    assert n_kmers == 0, n_kmers

    kh = khmer.Countgraph(8, 4, 1)
    n_reads, n_kmers = kh.consume_seqfile(short_filename)
    assert n_reads == 1, n_reads
    assert n_kmers == 1, n_kmers


class TestConsumeString(object):

    def setup_method(self):
        self.kh = khmer.Countgraph(4, 1, 1, primes=[4 ** 4])

    def test_n_occupied(self):
        assert self.kh.n_occupied() == 0
        self.kh.consume('AAAA')
        assert self.kh.n_occupied() == 1
        self.kh.consume('AACT')
        assert self.kh.n_occupied() == 2

    def test_simple(self):
        n = self.kh.consume('AAAA')
        assert n == 1
        assert self.kh.get(0) == 1

    def test_simple_2(self):
        n = self.kh.consume('AAAAA')
        assert n == 2
        assert self.kh.get(0) == 2

    def test_simple_rc(self):
        n = self.kh.consume('TTTTT')
        assert n == 2
        assert self.kh.get(0) == 2

    def test_min_count(self):
        self.kh.consume('AAAA')

        assert self.kh.get_min_count('AAAA') == 1

    def test_max_count(self):
        self.kh.consume('AAAA')

        assert self.kh.get_max_count('AAAA') == 1


class TestAbundanceDistribution(object):

    def setup_method(self):
        self.kh = khmer.Countgraph(4, 100, 1)
        self.kh.consume_seqfile(_data('all-A.fa'))

    def test_count_A(self):
        tracking = khmer.Nodegraph(4, 7, 1)
        dist = self.kh.abundance_distribution(_data('all-A.fa'), tracking)

        assert sum(dist) == 1
        assert dist[10] == 1
