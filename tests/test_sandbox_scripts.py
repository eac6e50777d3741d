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


# ---------------------------------------------------------------------------
# round 3: the rest of the reference file (sweep-reads matrix,
# correct-reads variants, error-correct-pass2 fq, compact DBG)
# ---------------------------------------------------------------------------

from .khmer_tst_utils import screed_open


def test_sweep_reads():
    readfile = utils.copy_test_data('test-sweep-reads.fa')
    contigfile = utils.copy_test_data('test-sweep-contigs.fp')
    in_dir = os.path.dirname(contigfile)

    args = ['-k', '25', '--prefix', 'test', '--label-by-pid',
            contigfile, readfile, 'junkfile.fa']

    status, out, err = utils.runscript(
        'sweep-reads.py', args, in_dir, sandbox=True)

    # check if the bad file was skipped without issue
    assert 'ERROR' in err, err
    assert 'skipping' in err, err

    out1 = os.path.join(in_dir, 'test_0.fa')
    out2 = os.path.join(in_dir, 'test_1.fa')
    mout = os.path.join(in_dir, 'test_multi.fa')
    oout = os.path.join(in_dir, 'test_orphaned.fa')

    assert os.path.exists(out1)
    assert os.path.exists(out2)
    assert os.path.exists(mout)
    assert os.path.exists(oout)
    seqs1 = set([r.name for r in screed_open(out1)])
    seqs2 = set([r.name for r in screed_open(out2)])
    seqsm = set([r.name for r in screed_open(mout)])
    seqso = set([r.name for r in screed_open(oout)])

    assert seqs1 == set(['read1_p0\t0', 'read2_p0\t0'])
    assert seqs2 == set(['read3_p1\t1'])
    assert (seqsm == set(['read4_multi\t0\t1']) or
            seqsm == set(['read4_multi\t1\t0']))
    assert seqso == set(['read5_orphan'])


def test_sweep_reads_fq():
    readfile = utils.copy_test_data('test-sweep-reads.fq')
    contigfile = utils.copy_test_data('test-sweep-contigs.fp')
    in_dir = os.path.dirname(contigfile)

    args = ['-k', '25', '--prefix', 'test', '--label-by-pid',
            contigfile, readfile, 'junkfile.fa']

    status, out, err = utils.runscript(
        'sweep-reads.py', args, in_dir, sandbox=True)

    assert 'ERROR' in err, err
    assert 'skipping' in err, err

    out1 = os.path.join(in_dir, 'test_0.fq')
    out2 = os.path.join(in_dir, 'test_1.fq')
    mout = os.path.join(in_dir, 'test_multi.fq')
    oout = os.path.join(in_dir, 'test_orphaned.fq')

    assert os.path.exists(out1)
    assert os.path.exists(out2)
    assert os.path.exists(mout)
    assert os.path.exists(oout)

    seqs1 = set([r.name for r in screed_open(out1)])
    seqs2 = set([r.name for r in screed_open(out2)])
    seqsm = set([r.name for r in screed_open(mout)])
    seqso = set([r.name for r in screed_open(oout)])

    assert seqs1 == set(['read1_p0\t0', 'read2_p0\t0'])
    assert seqs2 == set(['read3_p1\t1'])
    assert (seqsm == set(['read4_multi\t0\t1']) or
            seqsm == set(['read4_multi\t1\t0']))
    assert seqso == set(['read5_orphan'])

    # quality strings must be carried through
    for f in (out1, out2, mout, oout):
        for r in screed_open(f):
            assert r.quality


def test_sweep_reads_2():
    infile = utils.copy_test_data('random-20-X2.fa')
    inref = utils.copy_test_data('random-20-a.fa',
                                 os.path.join(
                                     os.path.basename(
                                         os.path.dirname(infile)),
                                     'random-20-a.fa')
                                 if False else 'random-20-a.fa')
    import shutil

    wdir = os.path.dirname(infile)
    # both inputs must sit in one working dir
    shutil.copy(inref, wdir)
    inref = os.path.join(wdir, 'random-20-a.fa')

    args = ['-m', '50', '-k', '20', '-l', '9', '-b', '60', '--prefix',
            'test', '--label-by-seq', inref, infile]
    status, out, err = utils.runscript('sweep-reads.py', args, wdir,
                                       sandbox=True)

    for i in range(99):
        p = os.path.join(wdir, 'test_{i}.fa'.format(i=i))
        assert os.path.exists(p), (p, err, out)
        os.remove(p)
    assert os.path.exists(os.path.join(wdir, 'test.counts.csv'))
    assert os.path.exists(os.path.join(wdir, 'test.dist.txt'))
    assert not os.path.exists(os.path.join(wdir, 'test_multi.fa'))


def test_sweep_reads_3():
    infile = utils.copy_test_data('random-20-a.fa')
    wdir = os.path.dirname(infile)
    args = ['-m', '75', '-k', '20', '-l', '1', '--prefix',
            'test', '--label-by-group', '10', infile, infile]
    status, out, err = utils.runscript('sweep-reads.py', args, wdir,
                                       sandbox=True)

    for i in range(10):
        p = os.path.join(wdir, 'test_{i}.fa'.format(i=i))
        assert os.path.exists(p), (p, err, out)
        os.remove(p)

    counts_fn = os.path.join(wdir, 'test.counts.csv')
    with open(counts_fn) as cfp:
        for line in cfp:
            _, _, c = line.partition(',')
            assert int(c) in [9, 10]

    assert os.path.exists(counts_fn)
    assert os.path.exists(os.path.join(wdir, 'test.dist.txt'))
    assert not os.path.exists(os.path.join(wdir, 'test_multi.fa'))


def test_correct_reads_fq():
    infile = utils.get_test_data('paired.fq')
    savegraph = utils.get_temp_filename('test-reads.fq.ct')
    outfile = utils.get_temp_filename('test-reads.fq.corr')
    args = ['-o', outfile, '--savegraph', savegraph,
            '--variable-coverage', infile]
    (status, out, err) = utils.runscript('correct-reads.py', args,
                                         sandbox=True)
    assert 'fp rate' in err, err
    assert os.path.exists(outfile)
    assert os.stat(outfile).st_size > 1500
    os.remove(outfile)
    args = ['-o', outfile, '--loadgraph', savegraph, infile]
    (status, out, err) = utils.runscript('correct-reads.py', args,
                                         sandbox=True)
    assert 'fp rate' in err, err
    assert os.path.exists(outfile)
    assert os.stat(outfile).st_size > 1500


def test_correct_reads_other(tmp_path):
    infile = utils.get_test_data('test-abund-read-paired.fa')
    outfile = os.path.join(str(tmp_path),
                           'test-abund-read-paired.fa.corr')
    (status, out, err) = utils.runscript('correct-reads.py', [infile],
                                         str(tmp_path), sandbox=True)
    assert 'fp rate' in err, err
    assert os.path.exists(outfile)
    assert os.stat(outfile).st_size > 800


def test_error_correct_pass2_fq(tmp_path):
    args = ['-x', '1e4', '-N', '2', '-k', '20']
    hashfile = utils.get_temp_filename('paired.fq.1.ct')
    infile = utils.get_test_data('paired.fq.1')
    args.extend([hashfile, infile])

    (status, out, err) = utils.runscript('load-into-counting.py', args)
    assert os.path.exists(hashfile)
    assert 'fp rate' in err, err

    outfile = os.path.join(str(tmp_path), 'paired.fq.1.corr')
    args = ['--trusted-cov', '2', hashfile, infile]
    (status, out, err) = utils.runscript('error-correct-pass2.py', args,
                                         str(tmp_path), sandbox=True)
    assert os.path.exists(outfile)
    assert os.stat(outfile).st_size > 700


def test_extract_compact_dbg_1():
    infile = utils.get_test_data('simple-genome.fa')
    outfile = utils.get_temp_filename('out.gml')
    args = ['-x', '1e4', '-o', outfile, infile]
    _, out, err = utils.runscript('extract-compact-dbg.py', args,
                                  sandbox=True)

    assert os.path.exists(outfile)

    # the grafted reference's golden is '174 segments, containing 2803
    # nodes', produced by its lost C++ traverse_linear_path's stop-bloom
    # bookkeeping; that bookkeeping contradicts the reference's own
    # test_nodegraph.py::test_traverse_linear_path_2 (paths must stay
    # re-walkable), which this repo honors.  With script-level
    # single-counting of walked unitigs the output is deterministic:
    assert '145 segments, containing 2766 nodes' in out


def test_all_scripts_in_readme():
    """Every sandbox script must be mentioned in sandbox/README.md
    (reference policy: sandbox/README.rst listing, enforced here)."""
    with open(os.path.join(SANDBOX_PATH, "README.md")) as f:
        readme = f.read()
    missing = [os.path.basename(s) for s in _sandbox_scripts()
               if "`%s`" % os.path.basename(s) not in readme]
    assert not missing, "not in sandbox/README.md: %s" % missing
