"""Single-table Countgraph behavior (reference expectations from
tests/test_counting_single.py, reorganized table-driven)."""

import os

import pytest

import khmer_tpu as khmer

from .conftest import REF_TEST_DATA

MAX_COUNT = 255


def test_string_and_int_collision():
    kh = khmer.Countgraph(4, 100, 1)
    kh.count('AAAA')
    assert kh.get('AAAA') == 1
    # TTTT is AAAA's reverse complement: same canonical bin
    kh.count('TTTT')
    assert kh.get('TTTT') == 2


def test_count_arg_validation():
    cg = khmer.Countgraph(4, 1, 1)
    with pytest.raises(TypeError):
        cg.count()
    with pytest.raises(ValueError):
        cg.count('ABCDE')  # wrong k


def _fill_complete_space(kh):
    n_entries = kh.hashsizes()[0]
    for i in range(0, n_entries):
        kh.count(khmer.reverse_hash(i, 4))
    return n_entries


def test_complete_no_collision():
    kh = khmer.Countgraph(4, 1, 1, primes=[4 ** 4])
    n_entries = _fill_complete_space(kh)

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
        n_fwd_filled


@pytest.mark.parametrize("size,probe_range", [(7, 128), (5, 64)])
def test_complete_with_collisions(size, probe_range):
    kh = khmer.Countgraph(4, size, 1)
    _fill_complete_space(kh)

    n_rc_filled = sum(
        1 for i in range(probe_range)
        if kh.get(khmer.reverse_hash(i, 4)))
    assert n_rc_filled == probe_range, n_rc_filled


@pytest.mark.parametrize("bigcount,expected", [
    (False, MAX_COUNT),      # saturates
    (True, 10000),           # counts past 255
])
def test_count_saturation(bigcount, expected):
    kh = khmer.Countgraph(4, 100, 1)
    kh.set_use_bigcount(bigcount)

    last = None
    c = None
    for _ in range(10000):
        kh.count('AAAA')
        c = kh.get('AAAA')
        if c == last:
            break
        last = c
    assert c == expected


@pytest.mark.parametrize("bigcount,expected", [
    (False, MAX_COUNT),
    (True, 10000 - 3),       # 9997 AAAA windows in a 10k-base run
])
def test_consume_saturation(bigcount, expected):
    kh = khmer.Countgraph(4, 100, 1)
    kh.set_use_bigcount(bigcount)
    kh.consume("A" * 10000)
    assert kh.get('AAAA') == expected


def test_consume_uniqify_first():
    kh = khmer.Countgraph(4, 100, 1)
    kh.consume("TTTT")
    assert kh.get("AAAA") == 1


MINMAX_CASES = [
    # (table size, consume twice?, rc second?, get_min, get_max)
    (100, False, False, 1, None),
    (100, True, False, 2, None),
    (9, False, False, None, 2),
    (9, True, False, None, 4),
    (9, False, True, None, 4),
    (100, False, True, 2, None),
]


@pytest.mark.parametrize("size,twice,rc,want_min,want_max", MINMAX_CASES)
def test_min_max_counts(size, twice, rc, want_min, want_max):
    kh = khmer.Countgraph(4, size, 1)
    s = "AAAAACGT"
    kh.consume(s)
    if twice:
        kh.consume(s)
    if rc:
        kh.consume("ACGTTTTT")          # revcomp of the sequence
    if want_min is not None:
        assert kh.get_min_count(s) == want_min
    if want_max is not None:
        assert kh.get_max_count(s) == want_max


def test_get_rejects_wrong_k():
    kh = khmer.Countgraph(6, 4 ** 10, 1)
    DNA = ("AGCTTTTCATTCTGACTGCAACGGGCAATATGTCTCTGTGTGGATTAAAAAAAGAGTG"
           "TCTGATAG")
    kh.consume(DNA)

    assert kh.get("AGCTTT") == 1
    assert kh.get("GATGAG") == 0
    with pytest.raises(ValueError):
        kh.get("AGCTT")


def test_64bit_windows():
    # k=25 windows span two 64-bit words: every window must count
    kh = khmer.Countgraph(25, 4, 1)
    fullstr = ("GTATGCCAGCTCCAACTGGGCCGGTACGAGCAGGCCATTGCCTCTTGCCGCGATGC"
               "GTCGGCG")
    kh.consume(fullstr)

    substr = "ATGCCAGCTCCAACTGGGCCGGTACGAGCAGGCCATTGCCTCTTGC"
    assert kh.get_min_count(substr) > 0
    for i in range(len(fullstr) - 25 + 1):
        assert kh.get(fullstr[i:i + 25]) > 0


@pytest.mark.parametrize("k,want_kmers", [(9, 0), (8, 1)])
def test_very_short_read(k, want_kmers):
    short_filename = os.path.join(REF_TEST_DATA, 'test-short.fa')
    kh = khmer.Countgraph(k, 4, 1)
    n_reads, n_kmers = kh.consume_seqfile(short_filename)
    assert n_reads == 1, n_reads
    assert n_kmers == want_kmers, n_kmers


class TestConsumeString:

    def setup_method(self):
        self.kh = khmer.Countgraph(4, 1, 1, primes=[4 ** 4])

    def test_n_occupied_grows(self):
        assert self.kh.n_occupied() == 0
        self.kh.consume('AAAA')
        assert self.kh.n_occupied() == 1
        self.kh.consume('AACT')
        assert self.kh.n_occupied() == 2

    @pytest.mark.parametrize("seq,n,count0", [
        ('AAAA', 1, 1),
        ('AAAAA', 2, 2),
        ('TTTTT', 2, 2),    # rc of AAAAA: same bins
    ])
    def test_window_counting(self, seq, n, count0):
        assert self.kh.consume(seq) == n
        assert self.kh.get(0) == count0

    def test_min_max_after_one(self):
        self.kh.consume('AAAA')
        assert self.kh.get_min_count('AAAA') == 1
        assert self.kh.get_max_count('AAAA') == 1


def test_abundance_distribution_of_all_A():
    kh = khmer.Countgraph(4, 100, 1)
    a_file = os.path.join(REF_TEST_DATA, 'all-A.fa')
    kh.consume_seqfile(a_file)

    tracking = khmer.Nodegraph(4, 7, 1)
    dist = kh.abundance_distribution(a_file, tracking)

    assert sum(dist) == 1
    assert dist[10] == 1
