"""HashSet tests ported from the reference tests/test_hashset.py."""

import pytest

import khmer_tpu as khmer


def test_bad_construct():
    with pytest.raises(TypeError):
        khmer.HashSet()

    with pytest.raises((ValueError, TypeError)):
        khmer.HashSet(5, [{}])


def test_iter_single():
    hs = khmer.HashSet(5, [6])
    for k in hs:
        assert k == 6


def test_iter_double():
    x = [6, 9, 20]
    hs = khmer.HashSet(5, x)
    for i, k in enumerate(hs):
        assert k == x[i], (k, x[i])


def test_add():
    hs = khmer.HashSet(5)
    hs.add(7)
    hs.add(4)

    assert list(sorted(hs)) == [4, 7]


def test_update():
    hs = khmer.HashSet(5)
    x = [5, 10, 15, 2 ** 35]
    hs.update(x)

    assert list(sorted(hs)) == [5, 10, 15, 2 ** 35]


def test_update_bad():
    hs = khmer.HashSet(5)
    x = [5, 10, 15, 2 ** 35, {}]
    with pytest.raises((ValueError, TypeError)):
        hs.update(x)


def test_remove():
    hs = khmer.HashSet(5, [8, 10])
    assert len(hs) == 2
    hs.remove(8)
    assert len(hs) == 1
    assert list(hs) == [10]


def test_remove_2():
    hs = khmer.HashSet(5, [8, 10])
    assert len(hs) == 2
    with pytest.raises(ValueError):
        hs.remove(15)
    assert len(hs) == 2
    assert list(sorted(hs)) == [8, 10]


def test_contains_1():
    hs = khmer.HashSet(5, [8, 10])
    assert 8 in hs
    assert 10 in hs
    assert 2 ** 35 not in hs


def test_contains_2():
    hs = khmer.HashSet(5, [8, 10])
    assert khmer.reverse_hash(8, 5) in hs
    assert khmer.reverse_hash(10, 5) in hs
    assert khmer.reverse_hash(123, 5) not in hs


def test_concat_1():
    hs = khmer.HashSet(5, [10, 12])
    hs2 = khmer.HashSet(5, [10, 13])

    hs3 = hs + hs2
    assert list(sorted(hs3)) == [10, 12, 13]


def test_concat_2():
    hs = khmer.HashSet(5, [10, 12])
    hs2 = khmer.HashSet(5, [10, 13])

    hs += hs2
    assert list(sorted(hs)) == [10, 12, 13]


def test_concat_1_fail():
    hs = khmer.HashSet(5, [10, 12])
    hs2 = khmer.HashSet(4, [10, 13])

    with pytest.raises(ValueError):
        hs + hs2


def test_concat_2_fail():
    hs = khmer.HashSet(5, [10, 12])
    hs2 = khmer.HashSet(4, [10, 13])

    with pytest.raises(ValueError):
        hs += hs2


def test_iter_single_identity():
    # (the reference defines test_iter_single twice; this is its second
    # body — iter(hs) returns a self-identical iterator)
    hs = khmer.HashSet(5, [6])
    k = iter(hs)
    k2 = iter(k)
    assert k == k2
