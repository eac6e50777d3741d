"""Sandbox-script tests ported from the reference
tests/test_sandbox_scripts.py (import smoke over every sandbox script
plus functional runs; the sweep-reads/count-kmers/collect-reads
goldens already live in tests/test_scripts.py-era suites)."""

import glob
import os
import sys
import traceback

import pytest

from . import khmer_tst_utils as utils

SANDBOX_PATH = os.path.join(os.path.dirname(__file__), "..", "sandbox")


def _sandbox_scripts():
    path = os.path.join(SANDBOX_PATH, "*.py")
    return sorted(os.path.normpath(s) for s in glob.glob(path))


@pytest.mark.parametrize("filename", _sandbox_scripts(),
                         ids=os.path.basename)
def test_import_succeeds(filename, tmp_path, capsys):
    """Every sandbox script must import and exec cleanly (arg errors
    and runtime failures past main() are fine)."""
    cwd = os.getcwd()
    oldargs = sys.argv
    sys.argv = [filename]
    os.chdir(tmp_path)
    try:
        try:
            global_dict = {'__name__': '__main__'}
            exec(compile(open(filename).read(), filename, 'exec'),
                 global_dict)
        except (ImportError, SyntaxError) as err:
            print("{0}".format(err))
            raise AssertionError("%s cannot be exec'd: %s" %
                                 (filename, traceback.format_exc()))
        except BaseException:
            pass                        # other failures are expected :)
    finally:
        sys.argv = oldargs
        os.chdir(cwd)


def test_saturate_by_median():
    infile = utils.get_test_data('test-reads.fa')
    args = ['-M', '1e7', infile]

    status, out, err = utils.runscript('saturate-by-median.py', args,
                                       sandbox=True)

    assert status == 0


def test_collect_reads():
    outfile = utils.get_temp_filename('out.graph')
    infile = utils.get_test_data('test-reads.fa')
    args = ['-M', '1e7', outfile, infile]

    status, out, err = utils.runscript('collect-reads.py', args,
                                       sandbox=True)

    assert status == 0
    assert os.path.exists(outfile)


def test_count_kmers_1():
    infile = utils.copy_test_data('random-20-a.fa')
    in_dir = os.path.dirname(infile)
    ctfile = utils.get_temp_filename('x.ct', in_dir)
    utils.runscript('load-into-counting.py',
                    ['-x', '1e7', '-N', '2', '-k', '20', ctfile, infile])

    args = [ctfile, infile]

    status, out, err = utils.runscript('count-kmers.py', args, in_dir,
                                       sandbox=True)

    out = out.splitlines()
    assert 'TTGTAACCTGTGTGGGGTCG,1' in out


def test_count_kmers_2_single():
    infile = utils.copy_test_data('random-20-a.fa')

    args = ['-x', '1e7', '-k', '20', '-N', '2', infile]

    status, out, err = utils.runscript('count-kmers-single.py', args,
                                       os.path.dirname(infile),
                                       sandbox=True)

    out = out.splitlines()
    assert 'TTGTAACCTGTGTGGGGTCG,1' in out


def test_multirename_fasta():
    infile1 = utils.copy_test_data('test-multi.fa')
    infile2 = utils.copy_test_data('multi-output.fa')
    args = ['assembly', infile1]
    _, out, err = utils.runscript('multi-rename.py', args, sandbox=True)
    r = open(infile2).read()
    assert r in out


def test_extract_compact_dbg_2():
    infile = utils.get_test_data('branched-genome.fa')
    outfile = utils.get_temp_filename('out.gml')
    args = ['-x', '1e6', '-o', outfile, infile]
    _, out, err = utils.runscript('extract-compact-dbg.py', args,
                                  sandbox=True)

    assert os.path.exists(outfile)

    assert '4 segments, containing 1001 nodes' in out


def test_error_correct_pass2():
    args = ['-x', '1e4', '-N', '2', '-k', '20']
    hashfile = utils.get_temp_filename('test-abund-read-3.ct')
    infile = utils.get_test_data('test-abund-read-3.fa')
    args.extend([hashfile, infile])

    (status, out, err) = utils.runscript('load-into-counting.py', args)
    assert os.path.exists(hashfile)
    assert 'fp rate' in err, err

    outfile = utils.get_temp_filename('test-abund-read-3.fa.corr')
    args = ['--trusted-cov', '5', '-o', outfile]
    args.extend([hashfile, infile])
    (status, out, err) = utils.runscript('error-correct-pass2.py', args,
                                         sandbox=True)
    assert 'trusted: 5' in out, out
    assert os.path.exists(outfile)
    assert os.stat(outfile).st_size > 2000


def test_correct_reads():
    infile = utils.get_test_data('simple-genome-reads.fa')
    outfile = utils.get_temp_filename('simple-genome-reads.fa.corr')
    args = ['-o', outfile, infile]
    (status, out, err) = utils.runscript('correct-reads.py', args,
                                         sandbox=True)
    assert 'fp rate' in err, err
    assert os.path.exists(outfile)
    assert os.stat(outfile).st_size > 132000


def test_correct_reads_duplicate(tmp_path):
    infile = utils.get_test_data('test-abund-read-paired.fa')
    args = [infile, infile]
    (status, out, err) = utils.runscript('correct-reads.py', args,
                                         in_directory=str(tmp_path),
                                         sandbox=True, fail_ok=True)
    assert 'same filename multiple times' in str(err)
    assert status == 1
