"""Counttable tests ported from the reference tests/test_counttable.py
(murmur hash goldens, masked/banded bulk consume, primes init)."""

import random

import pytest

import khmer_tpu as khmer

from .conftest import REF_TEST_DATA


def _data(name):
    import os
    return os.path.join(REF_TEST_DATA, name)


def test_get_kmer_hashes():
    s = "ATGGATATGGAGGACAAGTATATGGAGGACAAGTATATGGAGGACAAGTAT"
    a = khmer.Counttable(33, 1e6, 3)
    assert a.get_kmer_hashes(s[:33]) == [4743239192574154715]
    assert a.get_kmer_hashes(s[:34]) == [4743239192574154715,
                                         2122462908541313313]

    assert a.get_kmer_hashes(s[0:33]) == [4743239192574154715]
    assert a.get_kmer_hashes(s[1:34]) == [2122462908541313313]


@pytest.mark.parametrize('kmer', [
    ('GATTACA' * 3),
    ('ATG' * 7),
    ('AGGACAAGTATATGGAGGACA'),
])
def test_kmer_revcom_hash(kmer):
    a = khmer.Counttable(21, 1e4, 3)
    assert a.hash(kmer) == a.hash(khmer.reverse_complement(kmer))


@pytest.mark.parametrize('ksize,sketch_allocator', [
    (21, khmer.Nodetable),
    (21, khmer.Counttable),
    (21, khmer.SmallCounttable),
    (49, khmer.Nodetable),
    (49, khmer.Counttable),
    (49, khmer.SmallCounttable),
])
def test_reverse_hash(ksize, sketch_allocator):
    multiplier = int(ksize / len('GATTACA'))
    kmer = 'GATTACA' * multiplier

    sketch = sketch_allocator(ksize, 1e4, 4)
    kmer_hash = sketch.hash(kmer)
    with pytest.raises(ValueError) as ve:
        sketch.reverse_hash(kmer_hash)
    assert 'not implemented' in str(ve)


def test_consume_with_mask():
    maskfile = _data('seq-a.fa')
    mask = khmer.Counttable(13, 1e3, 4)
    mask.consume_seqfile(maskfile)

    infile = _data('seq-b.fa')
    ct = khmer.Counttable(13, 1e3, 4)
    nr, nk = ct.consume_seqfile_with_mask(infile, mask)

    assert nr == 1
    assert nk == 3
    assert ct.get('GATTTGAGAAAAA') == 0  # in the mask
    assert ct.get('ATTTGAGAAAAAA') == 1
    assert ct.get('TTTGAGAAAAAAG') == 1
    assert ct.get('TTGAGAAAAAAGT') == 1


def test_consume_banding_with_mask():
    maskfile = _data('seq-a.fa')
    mask = khmer.Counttable(13, 1e3, 4)
    mask.consume_seqfile(maskfile)

    infile = _data('seq-b.fa')
    ct = khmer.Counttable(13, 1e3, 4)
    nr, nk = ct.consume_seqfile_banding_with_mask(infile, 4, 1, mask)

    assert nr == 1
    assert nk == 1
    assert ct.get('GATTTGAGAAAAA') == 0  # in the mask
    assert ct.get('ATTTGAGAAAAAA') == 0  # out of band
    assert ct.get('TTTGAGAAAAAAG') == 0  # out of band
    assert ct.get('TTGAGAAAAAAGT') == 1


def test_consume_with_mask_threshold():
    mask = khmer.Counttable(13, 1e3, 4)
    for _ in range(3):
        mask.consume('TAGATCTGCTTGAAACAAGTGGATTTGAGAAAAA')
    for _ in range(2):
        mask.consume('TAGATCTGCTTGAAACAAGTGGATTTGAGAAAAAAGT')

    infile = _data('seq-b.fa')
    ct = khmer.Counttable(13, 1e3, 4)
    nr, nk = ct.consume_seqfile_with_mask(infile, mask, 3)

    assert nr == 1
    assert nk == 3
    assert ct.get('GATTTGAGAAAAA') == 0  # in the mask
    assert ct.get('ATTTGAGAAAAAA') == 1
    assert ct.get('TTTGAGAAAAAAG') == 1
    assert ct.get('TTGAGAAAAAAGT') == 1


def test_consume_with_mask_complement():
    mask = khmer.Nodetable(13, 1e3, 4)
    mask.consume('TGCTTGAAACAAGTG')

    infile = _data('seq-b.fa')
    ct = khmer.Counttable(13, 1e3, 4)
    ct.consume_seqfile_with_mask(infile, mask, threshold=1,
                                 consume_masked=True)

    assert ct.get_kmer_counts('TGCTTGAAACAAGTG') == [1, 1, 1]
    assert ct.get_kmer_counts('GAAACAAGTGGATTT') == [0, 0, 0]


@pytest.mark.parametrize('sketchtype', [
    khmer.Nodegraph,
    khmer.Countgraph,
    khmer.SmallCountgraph,
    khmer.Nodetable,
    khmer.Counttable,
    khmer.SmallCounttable,
    khmer.CyclicCounttable,
])
def test_init_with_primes(sketchtype):
    primes = khmer.get_n_primes_near_x(4, random.randint(1000, 2000))
    sketch = sketchtype(31, 1, 1, primes=primes)
    assert sketch.hashsizes() == primes
