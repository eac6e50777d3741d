"""Byte-level output parity: md5 hashes of normalize-by-median and
trim-low-abund outputs against the hashes the reference recorded
(tests/test_script_output.py — khmer commits 799039ff / b939a34b).
A matching hash means the output file is byte-identical to the
reference implementation's."""

from hashlib import md5

import pytest

from . import khmer_tst_utils as utils


def _calc_md5(fp):
    m = md5()
    m.update(fp.read())
    return m.hexdigest()


def _run_hash(script, args):
    infile = utils.get_test_data('simple-genome-reads.fa')
    outfile = utils.get_temp_filename('out')
    utils.runscript(script, args + ['-o', outfile, infile])
    with open(outfile, 'rb') as fp:
        return _calc_md5(fp)


def test_normalize_by_median_k21_C20_M1e7():
    h = _run_hash('normalize-by-median.py',
                  ['-C', '20', '-k', '21', '-M', '1e7'])
    assert h == '942e9024c25a8d85033d755d86aba4a3', h


def test_normalize_by_median_k21_C15_M1e7():
    h = _run_hash('normalize-by-median.py',
                  ['-C', '15', '-k', '21', '-M', '1e7'])
    assert h == '0d1b4b9d4c76cb8cdeee5a98f6e70163', h


def test_trim_low_abund_k21_C0_M1e7_diginorm():
    # should equal normalize-by-median -C 20 -k 21 -M 1e7
    h = _run_hash('trim-low-abund.py',
                  ['-C', '0', '-k', '21', '--diginorm',
                   '--diginorm-coverage', '20', '-M', '1e7'])
    assert h == '942e9024c25a8d85033d755d86aba4a3', h


def test_trim_low_abund_k21_C0_M1e7_diginorm_dn15():
    # should equal normalize-by-median -C 15 -k 21 -M 1e7
    h = _run_hash('trim-low-abund.py',
                  ['-C', '0', '-k', '21', '--diginorm',
                   '--diginorm-coverage', '15', '-M', '1e7'])
    assert h == '0d1b4b9d4c76cb8cdeee5a98f6e70163', h


def test_trim_low_abund_k21_C2_M1e7_diginorm_dn15():
    h = _run_hash('trim-low-abund.py',
                  ['-C', '2', '-k', '21', '--diginorm',
                   '--diginorm-coverage', '15', '-M', '1e7'])
    assert h == 'fa09d094a9e623639a34f772b04d766c', h


def test_trim_low_abund_k21_M1e7_C2():
    h = _run_hash('trim-low-abund.py', ['-C', '2', '-k', '21',
                                        '-M', '1e7'])
    assert h == '9495801b282ff6b08961b685d12a954c', h


def test_trim_low_abund_k21_M1e7_C3():
    h = _run_hash('trim-low-abund.py', ['-C', '3', '-k', '21',
                                        '-M', '1e7'])
    assert h == 'da36ec64e7d001470c04dc19af5b8635', h


def test_trim_low_abund_k21_M1e7_C4():
    h = _run_hash('trim-low-abund.py', ['-C', '4', '-k', '21',
                                        '-M', '1e7'])
    assert h == '65596253b87ed8d5aeb14dc8cf5a7406', h


def test_trim_low_abund_k21_M1e7_C4_variable():
    h = _run_hash('trim-low-abund.py', ['-C', '4', '-k', '21', '-V',
                                        '-M', '1e7'])
    assert h == '324871db807839f8bddd43548abcbeda', h


def test_trim_low_abund_k21_M1e7_C4_variable_Z25():
    h = _run_hash('trim-low-abund.py', ['-C', '4', '-k', '21', '-V',
                                        '-Z', '25', '-M', '1e7'])
    assert h == '6ec4f9874262f3eaf98cab4910c428f5', h


def test_trim_low_abund_k21_M1e7_C4_variable_Z15():
    h = _run_hash('trim-low-abund.py', ['-C', '4', '-k', '21', '-V',
                                        '-Z', '15', '-M', '1e7'])
    assert h == '393805ac92e8bed31a374de9ee89ead8', h
