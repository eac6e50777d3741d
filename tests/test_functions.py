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


# -- round 3: remaining reference test_functions.py cases (hash
# helpers, kfile status, and the functional broken_paired_reader).

import sys  # noqa: E402
from io import StringIO  # noqa: E402

from khmer_tpu.kfile import check_input_files, get_file_writer  # noqa: E402
from khmer_tpu.utils import broken_paired_reader  # noqa: E402

from . import khmer_tst_utils as utils  # noqa: E402


def test_forward_hash():
    assert khmer.forward_hash('AAAA', 4) == 0
    assert khmer.forward_hash('TTTT', 4) == 0
    assert khmer.forward_hash('CCCC', 4) == 170
    assert khmer.forward_hash('GGGG', 4) == 170

    h = 13607885392109549066
    assert khmer.forward_hash('GGTTGACGGGGCTCAGGGGGCGGCTGACTCCG', 32) == h


def test_get_file_writer_fail():
    somefile = utils.get_temp_filename("potato")
    somefile = open(somefile, "w")
    stopped = True
    try:
        get_file_writer(somefile, True, True)
        stopped = False
    except ValueError as err:
        assert "Cannot specify both bzip and gzip" in str(err), str(err)

    assert stopped, "Expected exception"


def test_forward_hash_no_rc():
    h = khmer.forward_hash_no_rc('AAAA', 4)
    assert h == 0, h

    h = khmer.forward_hash_no_rc('TTTT', 4)
    assert h == 85, h

    h = khmer.forward_hash_no_rc('CCCC', 4)
    assert h == 170, h

    h = khmer.forward_hash_no_rc('GGGG', 4)
    assert h == 255, h


def test_reverse_hash():
    s = khmer.reverse_hash(0, 4)
    assert s == "AAAA"

    s = khmer.reverse_hash(85, 4)
    assert s == "TTTT"

    s = khmer.reverse_hash(170, 4)
    assert s == "CCCC"

    s = khmer.reverse_hash(255, 4)
    assert s == "GGGG"


def test_reverse_hash_longs():
    # (py2 long() variant in the reference; int is the only int type now)
    s = khmer.reverse_hash(int(0), 4)
    assert s == "AAAA"

    s = khmer.reverse_hash(int(85), 4)
    assert s == "TTTT"

    s = khmer.reverse_hash(int(170), 4)
    assert s == "CCCC"

    s = khmer.reverse_hash(int(255), 4)
    assert s == "GGGG"


def test_hash_murmur3():
    assert khmer.hash_murmur3('AAAA') == 526240128537019279
    assert khmer.hash_murmur3('TTTT') == 526240128537019279
    assert khmer.hash_murmur3('CCCC') == 14391997331386449225
    assert khmer.hash_murmur3('GGGG') == 14391997331386449225
    assert khmer.hash_murmur3('TATATATATATATATATATA') != 0
    assert khmer.hash_murmur3('TTTTGCAAAA') != 0
    assert khmer.hash_murmur3('GAAAATTTTC') != 0


def test_hash_no_rc_murmur3():
    h = khmer.hash_no_rc_murmur3('AAAA')
    assert h == 5231866503566620412, h

    h = khmer.hash_no_rc_murmur3('TTTT')
    assert h == 5753003579327329651, h

    h = khmer.hash_no_rc_murmur3('CCCC')
    assert h == 3789793362494378039, h

    h = khmer.hash_no_rc_murmur3('GGGG')
    assert h == 17519752047064575358, h


def test_check_file_status_kfile():
    fn = utils.get_temp_filename('thisfiledoesnotexist')

    old_stderr = sys.stderr
    sys.stderr = capture = StringIO()

    try:
        check_input_files(fn, False)
    except SystemExit:
        assert "does not exist" in capture.getvalue(), capture.getvalue()
    finally:
        sys.stderr = old_stderr


def test_check_file_status_kfile_force():
    fn = utils.get_temp_filename('thisfiledoesnotexist')

    old_stderr = sys.stderr
    sys.stderr = capture = StringIO()

    try:
        check_input_files(fn, True)
    except OSError:
        assert False
    finally:
        sys.stderr = old_stderr


class FakeFastaRead(object):
    def __init__(self, name, sequence):
        self.name = name
        self.sequence = sequence
        self.cleaned_seq = sequence


class Test_BrokenPairedReader(object):
    stream = [FakeFastaRead(name='seq1/1', sequence='A' * 5),
              FakeFastaRead(name='seq1/2', sequence='A' * 4),
              FakeFastaRead(name='seq2/1', sequence='A' * 5),
              FakeFastaRead(name='seq3/1', sequence='A' * 3),
              FakeFastaRead(name='seq3/2', sequence='A' * 5)]

    def gather(self, **kw):
        x = []
        for num, is_pair, read1, read2 in \
                broken_paired_reader(self.stream, **kw):
            x.append((read1.name if read1 is not None else None,
                      read2.name if read2 is not None else None))
        return x

    def testDefault(self):
        x = self.gather(min_length=1)

        expected = [('seq1/1', 'seq1/2'),
                    ('seq2/1', None),
                    ('seq3/1', 'seq3/2')]
        assert x == expected, x

    def testMinLength(self):
        x = self.gather(min_length=3)

        expected = [('seq1/1', 'seq1/2'),
                    ('seq2/1', None),
                    ('seq3/1', 'seq3/2')]
        assert x == expected, x

    def testMinLength_2(self):
        x = self.gather(min_length=4)

        # the reference's own two suites disagree here: the 2.x
        # functional reader re-slotted the surviving right mate as
        # ('seq3/2', None), the 3.0 _oxli class keeps mate position
        # (None, 'seq3/2') — tests/test_cython_parsing.py
        # testMinLength_2.  One implementation here, the 3.0 shape.
        expected = [('seq1/1', 'seq1/2'),
                    ('seq2/1', None),
                    (None, 'seq3/2')]
        assert x == expected, x

    def testForceSingle(self):
        x = self.gather(force_single=True)

        expected = [('seq1/1', None),
                    ('seq1/2', None),
                    ('seq2/1', None),
                    ('seq3/1', None),
                    ('seq3/2', None)]
        assert x == expected, x

    def testForceSingleAndMinLength(self):
        x = self.gather(min_length=5, force_single=True)

        expected = [('seq1/1', None),
                    ('seq2/1', None),
                    ('seq3/2', None)]
        assert x == expected, x
