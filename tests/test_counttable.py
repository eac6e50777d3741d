"""Counttable behavior (reference expectations from
tests/test_counttable.py, reorganized): murmur hash goldens,
masked/banded bulk consume, primes init."""

import os
import random

import pytest

import khmer_tpu as khmer

from .conftest import REF_TEST_DATA

SEQB = os.path.join(REF_TEST_DATA, 'seq-b.fa')
MASK_SEQ = 'TAGATCTGCTTGAAACAAGTGGATTTGAGAAAA'
# the three 13-mers of seq-b that the seq-a mask does NOT contain
NOVEL = ('ATTTGAGAAAAAA', 'TTTGAGAAAAAAG', 'TTGAGAAAAAAGT')
MASKED = 'GATTTGAGAAAAA'


def test_murmur_window_hash_goldens():
    s = "ATGGATATGGAGGACAAGTATATGGAGGACAAGTATATGGAGGACAAGTAT"
    a = khmer.Counttable(33, 1e6, 3)
    h0, h1 = 4743239192574154715, 2122462908541313313
    assert a.get_kmer_hashes(s[:33]) == [h0]
    assert a.get_kmer_hashes(s[:34]) == [h0, h1]
    assert a.get_kmer_hashes(s[1:34]) == [h1]


@pytest.mark.parametrize('kmer', [
    'GATTACA' * 3, 'ATG' * 7, 'AGGACAAGTATATGGAGGACA'])
def test_hash_is_strand_neutral(kmer):
    a = khmer.Counttable(21, 1e4, 3)
    assert a.hash(kmer) == a.hash(khmer.reverse_complement(kmer))


@pytest.mark.parametrize('ksize', [21, 49])
@pytest.mark.parametrize('sketch_allocator', [
    khmer.Nodetable, khmer.Counttable, khmer.SmallCounttable])
def test_reverse_hash_not_implemented_for_murmur(ksize, sketch_allocator):
    kmer = 'GATTACA' * (ksize // 7)
    sketch = sketch_allocator(ksize, 1e4, 4)
    with pytest.raises(ValueError) as ve:
        sketch.reverse_hash(sketch.hash(kmer))
    assert 'not implemented' in str(ve)


def _mask_from_file():
    mask = khmer.Counttable(13, 1e3, 4)
    mask.consume_seqfile(os.path.join(REF_TEST_DATA, 'seq-a.fa'))
    return mask


def test_consume_with_mask():
    """Only the 3 k-mers of seq-b absent from the seq-a mask load."""
    ct = khmer.Counttable(13, 1e3, 4)
    nr, nk = ct.consume_seqfile_with_mask(SEQB, _mask_from_file())

    assert (nr, nk) == (1, 3)
    assert ct.get(MASKED) == 0
    assert all(ct.get(km) == 1 for km in NOVEL)


def test_consume_banding_with_mask():
    """Masked + banded: only the one novel k-mer in band 1/4 loads."""
    ct = khmer.Counttable(13, 1e3, 4)
    nr, nk = ct.consume_seqfile_banding_with_mask(SEQB, 4, 1,
                                                  _mask_from_file())

    assert (nr, nk) == (1, 1)
    assert ct.get(MASKED) == 0
    assert ct.get(NOVEL[0]) == 0        # out of band
    assert ct.get(NOVEL[1]) == 0        # out of band
    assert ct.get(NOVEL[2]) == 1


def test_consume_with_mask_threshold():
    """Mask counts <= threshold still load."""
    mask = khmer.Counttable(13, 1e3, 4)
    for _ in range(3):
        mask.consume('TAGATCTGCTTGAAACAAGTGGATTTGAGAAAAA')
    for _ in range(2):
        mask.consume('TAGATCTGCTTGAAACAAGTGGATTTGAGAAAAAAGT')

    ct = khmer.Counttable(13, 1e3, 4)
    nr, nk = ct.consume_seqfile_with_mask(SEQB, mask, 3)

    assert (nr, nk) == (1, 3)
    assert ct.get(MASKED) == 0
    assert all(ct.get(km) == 1 for km in NOVEL)


def test_consume_with_mask_complement():
    """consume_masked=True inverts the test: only k-mers present in
    the mask at >= threshold load."""
    mask = khmer.Nodetable(13, 1e3, 4)
    mask.consume('TGCTTGAAACAAGTG')

    ct = khmer.Counttable(13, 1e3, 4)
    ct.consume_seqfile_with_mask(SEQB, mask, threshold=1,
                                 consume_masked=True)

    assert ct.get_kmer_counts('TGCTTGAAACAAGTG') == [1, 1, 1]
    assert ct.get_kmer_counts('GAAACAAGTGGATTT') == [0, 0, 0]


@pytest.mark.parametrize('sketchtype', [
    khmer.Nodegraph, khmer.Countgraph, khmer.SmallCountgraph,
    khmer.Nodetable, khmer.Counttable, khmer.SmallCounttable,
    khmer.CyclicCounttable])
def test_init_with_primes(sketchtype):
    primes = khmer.get_n_primes_near_x(4, random.randint(1000, 2000))
    sketch = sketchtype(31, 1, 1, primes=primes)
    assert sketch.hashsizes() == primes


# -- round 3: the reference's remaining test_counttable.py cases.


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
        _ = sketch.reverse_hash(kmer_hash)
    assert 'not implemented' in str(ve)
