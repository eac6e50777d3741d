"""Module-level function tests ported from the reference
tests/test_functions.py (reverse_complement, primes, header
introspection)."""

import os

import pytest

import khmer_tpu as khmer


def test_reverse_complement():
    assert khmer.reverse_complement('AATTCCGG') == 'CCGGAATT'
    assert khmer.reverse_complement('A') == 'T'
    assert khmer.reverse_complement('T') == 'A'
    assert khmer.reverse_complement('C') == 'G'
    assert khmer.reverse_complement('G') == 'C'


def test_reverse_complement_exception():
    # deal with DNA (and IUPAC), pass others through khmer's tbl
    assert khmer.reverse_complement('FGF') == 'FCF'


def test_reverse_hash_raises():
    with pytest.raises(TypeError):
        khmer.reverse_hash('2345', 4)


def test_get_primes():
    primes = khmer.get_n_primes_near_x(7, 20)
    assert primes == [19, 17, 13, 11, 7, 5, 3]

    primes_not_float = khmer.get_n_primes_near_x(7, 20.)
    assert primes_not_float == [19, 17, 13, 11, 7, 5, 3]
    assert all(isinstance(p, int) for p in primes_not_float)


def test_get_primes_fal():
    with pytest.raises(RuntimeError) as err:
        khmer.get_n_primes_near_x(5, 5)
    assert "unable to find 5 prime numbers < 5" in str(err.value)


def test_extract_countgraph_info_badfile(ref_test_data):
    with pytest.raises(ValueError):
        khmer.extract_countgraph_info(
            ref_test_data + '/test-abund-read-2.fa')


def test_extract_countgraph_info(tmp_path):
    fn = str(tmp_path / 'test_extract_counting.ct')
    for size in [1e6, 2e6, 5e6, 1e7]:
        ht = khmer.Countgraph(25, size, 4)
        ht.save(fn)

        info = khmer.extract_countgraph_info(fn)
        ksize, n_tables, table_size, _, _, _, _ = info

        assert ksize == 25
        assert table_size == size
        assert n_tables == 4

        os.remove(fn)


def test_extract_nodegraph_info_badfile(ref_test_data):
    with pytest.raises(ValueError):
        khmer.extract_nodegraph_info(
            ref_test_data + '/test-abund-read-2.fa')


def test_extract_nodegraph_info(tmp_path):
    fn = str(tmp_path / 'test_extract_nodegraph.pt')
    for size in [1e6, 2e6, 5e6, 1e7]:
        ht = khmer.Nodegraph(25, size, 4)
        ht.save(fn)

        info = khmer.extract_nodegraph_info(fn)
        ksize, table_size, n_tables, _, _, _ = info

        assert ksize == 25
        assert table_size == size, table_size
        assert n_tables == 4

        os.remove(fn)
