"""Parsing-layer behavior (reference expectations from
tests/test_cython_parsing.py, reorganized table-driven): Sequence,
Alphabets, SanitizedFastxParser, BrokenPairedReader, pairing checks."""

import pytest

from khmer_tpu.parsing import (Alphabets, BrokenPairedReader, FastxParser,
                               SanitizedFastxParser, Sequence)
from khmer_tpu.utils import check_is_left, check_is_pair, check_is_right

PARSERS = [FastxParser, SanitizedFastxParser]

FIVE_READS = [('seq1/1', 'A' * 5), ('seq1/2', 'A' * 4),
              ('seq2/1', 'A' * 5), ('seq3/1', 'A' * 3),
              ('seq3/2', 'A' * 5)]


@pytest.fixture
def write_fasta(tmp_path):
    def func(reads):
        path = tmp_path / 'test.fa'
        with open(path, 'a') as f:
            for name, seq in reads:
                f.write('>%s\n%s\n' % (name, seq))
        return str(path)
    return func


def test_plain_parser_roundtrip(write_fasta):
    result = list(FastxParser(write_fasta(FIVE_READS)))
    assert [(r.name, r.sequence) for r in result] == FIVE_READS


SANITIZER_CASES = [
    # (input seqs, kwargs, expected output seqs, expected n_bad)
    ([('a', 'NNNNN'), ('b', 'NNNN')], dict(alphabet='DNAN_SIMPLE'),
     ['AAAAA', 'AAAA'], 0),
    ([('a', 'NNNNN'), ('b', 'NNNN')],
     dict(alphabet='DNAN_SIMPLE', convert_n=False),
     ['NNNNN', 'NNNN'], 0),
    ([('a', 'XXX'), ('b', 'AAAA')], {}, ['AAAA'], 1),
    ([('a', 'acgtn'), ('b', 'AcGtN'), ('c', 'aCgTn')],
     dict(convert_n=False), ['ACGTN'] * 3, 0),
]


@pytest.mark.parametrize("reads,kwargs,want,n_bad", SANITIZER_CASES)
def test_sanitizing_parser(write_fasta, reads, kwargs, want, n_bad):
    parser = SanitizedFastxParser(write_fasta(reads), **kwargs)
    result = [r.sequence for r in parser]
    assert result == want
    assert parser.n_bad == n_bad


def test_alphabet_registry():
    dna_simple = Alphabets.get('DNA_SIMPLE')
    assert sorted(dna_simple) == ['A', 'C', 'G', 'T']
    with pytest.raises(ValueError):
        Alphabets.get('TEST')


def _gather(stream, **kw):
    names = []
    last_n = -1
    for last_n, is_pair, r1, r2 in BrokenPairedReader(stream, **kw):
        names.append((r1.name if r1 is not None else None,
                      r2.name if r2 is not None else None))
    return names, last_n


BPR_CASES = [
    # (kwargs, expected slot names, expected final n)
    (dict(min_length=1),
     [('seq1/1', 'seq1/2'), ('seq2/1', None), ('seq3/1', 'seq3/2')], 3),
    (dict(min_length=3),
     [('seq1/1', 'seq1/2'), ('seq2/1', None), ('seq3/1', 'seq3/2')], 3),
    # a pair with one short mate keeps the surviving slot position
    (dict(min_length=4),
     [('seq1/1', 'seq1/2'), ('seq2/1', None), (None, 'seq3/2')], 3),
    (dict(force_single=True),
     [('seq1/1', None), ('seq1/2', None), ('seq2/1', None),
      ('seq3/1', None), ('seq3/2', None)], 4),
    (dict(min_length=5, force_single=True),
     [('seq1/1', None), ('seq2/1', None), ('seq3/2', None)], 2),
]


@pytest.mark.parametrize("parser", PARSERS)
@pytest.mark.parametrize("kwargs,want,want_n", BPR_CASES)
def test_broken_paired_reader(write_fasta, parser, kwargs, want, want_n):
    names, n = _gather(parser(write_fasta(FIVE_READS)), **kwargs)
    assert names == want, names
    assert n == want_n, n


REQUIRE_PAIRED_CASES = [
    # (read lengths for seq1/1, seq1/2, seq3/1, seq3/2;
    #  which pair survives min_length=4)
    ((5, 4, 3, 5), 'seq1'),   # half of pair 3 too short -> dropped
    ((5, 4, 3, 3), 'seq1'),   # all of pair 3 too short
    ((3, 3, 5, 5), 'seq3'),   # pair 1 too short
]


@pytest.mark.parametrize("parser", PARSERS)
@pytest.mark.parametrize("lengths,survivor", REQUIRE_PAIRED_CASES)
def test_require_paired_with_min_length(write_fasta, parser, lengths,
                                        survivor):
    l1, l2, l3, l4 = lengths
    reads = [('seq1/1', 'A' * l1), ('seq1/2', 'A' * l2),
             ('seq3/1', 'A' * l3), ('seq3/2', 'A' * l4)]
    names, n = _gather(parser(write_fasta(reads)),
                       min_length=4, require_paired=True)
    assert n == 0
    assert names == [(survivor + '/1', survivor + '/2')]


PAIR_CASES = [
    # (name1, q1?, name2, q2?, expected)
    ('seq', True, 'seq2', True, False),
    ('seq/1', True, 'seq/2', True, True),
    ('seq 1::', True, 'seq 2::', True, True),
    ('seq', True, 'seq 2::', True, False),
    ('seq 1::', True, 'seq', True, False),
    ('seq 1::', False, 'seq 2::', False, True),
    ('seq/1', False, 'seq/2', False, True),
    ('seq1', False, 'seq2', False, False),
    ('seq/2', False, 'seq/1', False, False),
]


@pytest.mark.parametrize("n1,q1,n2,q2,want", PAIR_CASES)
def test_check_is_pair(n1, q1, n2, q2, want):
    read1 = Sequence(name=n1, sequence='AAA',
                     quality='###' if q1 else None)
    read2 = Sequence(name=n2, sequence='AAA',
                     quality='###' if q2 else None)
    assert check_is_pair(read1, read2) is want


@pytest.mark.parametrize("q1,q2", [(True, False), (False, True)])
def test_check_is_pair_mixed_types_raises(q1, q2):
    read1 = Sequence(name='seq/1', sequence='AAA',
                     quality='###' if q1 else None)
    read2 = Sequence(name='seq/2', sequence='AAA',
                     quality='###' if q2 else None)
    with pytest.raises(ValueError):
        check_is_pair(read1, read2)


LEFT_RIGHT_CASES = [
    # (name, is_left, is_right)
    ('seq1/1', True, False),
    ('seq1 1::N', True, False),
    ('seq1/2', False, True),
    ('seq1 2::N', False, True),
    ('seq', False, False),
    ('seq 1', False, False),
    ('seq 2', False, False),
    ('@HWI-ST412:261:d15khacxx:8:1101:3149:2157 1:N:0:ATCACG',
     True, False),
]


@pytest.mark.parametrize("name,left,right", LEFT_RIGHT_CASES)
def test_check_is_left_right(name, left, right):
    assert check_is_left(name) is left
    assert check_is_right(name) is right


class TestSequenceRecord:
    """Cython Sequence init semantics: all-None defaults; name and
    sequence must be given together."""

    def test_full_init(self):
        s = Sequence(name='Test', sequence='ACGT')
        assert (s.name, s.sequence) == ('Test', 'ACGT')
        assert s.quality is None and s.description is None
        assert s.cleaned_seq == 'ACGT'

    @pytest.mark.parametrize("kwargs", [
        dict(name='Test'),
        dict(sequence='ACGT'),
    ])
    def test_partial_init_stays_empty(self, kwargs):
        s = Sequence(**kwargs)
        assert s.name is None and s.sequence is None
        assert s.quality is None and s.description is None
        assert s.cleaned_seq is None

    def test_explicit_cleaned_seq_wins(self):
        s = Sequence(name='Test', sequence='ACGT', cleaned_seq='aaaa')
        assert s.sequence == 'ACGT'
        assert s.cleaned_seq == 'aaaa'
