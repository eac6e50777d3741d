"""Diginorm behavior tests — the full port of the reference's
tests/test_normalize_by_median.py (44 tests): pairing semantics,
cutoffs, goldens, sizing sanity checks, fifo streaming, murmur long-k,
and savegraph round trips.

Fixture notes: test-large.fa / 100k-filtered.fa.gz are referenced by
the grafted reference's tests but not shipped in its test-data tree —
those tests are huge/known_failing there and stay deselected here.
"""

import io
import os
import shutil
import threading

import pytest

from . import khmer_tst_utils as utils
from .khmer_tst_utils import screed_open
from .test_scripts import _make_counting  # noqa: F401  (reference layout)


def test_normalize_by_median_indent():
    infile = utils.get_test_data('paired-mixed.fa.pe')
    hashfile = utils.get_test_data('normC20k20.ct')
    outfile = utils.get_temp_filename('paired-mixed.fa.pe.keep')
    script = 'normalize-by-median.py'
    args = ['--loadgraph', hashfile, '-o', outfile, infile]
    (status, out, err) = utils.runscript(script, args)
    assert status == 0, (out, err)
    assert os.path.exists(outfile)


def test_normalize_by_median_loadgraph_with_args():
    infile = utils.get_test_data("test-abund-read-2.fa")
    tablefile = utils.get_temp_filename("table")
    in_dir = os.path.dirname(tablefile)

    script = "load-into-counting.py"
    args = [tablefile, infile]
    (_, _, err) = utils.runscript(script, args)

    script = "normalize-by-median.py"
    args = ["--ksize", "7", "--loadgraph", tablefile, infile]
    (_, _, err) = utils.runscript(script, args, in_dir)
    assert 'WARNING: You are loading a saved k-mer countgraph from' \
        in err, err


def test_normalize_by_median_empty_file():
    infile = utils.copy_test_data('empty-file')
    script = 'normalize-by-median.py'
    in_dir = os.path.dirname(infile)

    args = [infile]
    (_, _, err) = utils.runscript(script, args, in_dir)

    assert 'WARNING:' in err, err
    assert 'is empty' in err, err
    assert 'SKIPPED' in err, err


def test_normalize_by_median():
    CUTOFF = '1'

    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = ['-C', CUTOFF, '-k', '17', infile]
    (_, _, err) = utils.runscript(script, args, in_dir)

    assert 'Total number of unique k-mers: 98' in err, err

    outfile = infile + '.keep'
    assert os.path.exists(outfile), outfile

    seqs = [r.sequence for r in screed_open(outfile)]
    assert len(seqs) == 1, seqs
    assert seqs[0].startswith('GGTTGACGGGGCTCAGGGGG'), seqs
    assert "I/O Errors" not in err


def test_normalize_by_median_quiet():
    CUTOFF = '1'

    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = ['-C', CUTOFF, '-k', '17', '--quiet', '-M', '2e6', infile]
    (_, out, err) = utils.runscript(script, args, in_dir)

    assert len(out) == 0, out
    assert len(err) < 460, len(err)

    outfile = infile + '.keep'
    assert os.path.exists(outfile), outfile

    seqs = [r.sequence for r in screed_open(outfile)]
    assert len(seqs) == 1, seqs
    assert seqs[0].startswith('GGTTGACGGGGCTCAGGGGG'), seqs
    assert "I/O Errors" not in err


def test_normalize_by_median_unpaired_final_read():
    CUTOFF = '1'

    infile = utils.copy_test_data('single-read.fq')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = ['-C', CUTOFF, '-k', '17', '-p', infile]
    (status, _, err) = utils.runscript(script, args, in_dir,
                                       fail_ok=True)
    assert status != 0
    assert "ERROR: Unpaired reads when require_paired" in err, err


def test_normalize_by_median_sanity_check_0():
    infile = utils.copy_test_data('single-read.fq')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = ['-U', '1024', '--max-mem', '60', infile]
    (status, _, err) = utils.runscript(script, args, in_dir,
                                       fail_ok=True)
    assert status != 0, status
    assert "recommended false positive ceiling of 0.1!" in err, err


def test_normalize_by_median_sanity_check_1():
    infile = utils.copy_test_data('test-filter-abund-Ns.fq')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = ['-U', '83', '--max-tablesize', '17', infile]
    (status, _, err) = utils.runscript(script, args, in_dir,
                                       fail_ok=True)
    assert status != 0
    assert "Warning: The given tablesize is too small!" in err, err


def test_normalize_by_median_sanity_check_2():
    infile = utils.copy_test_data('test-filter-abund-Ns.fq')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = ['-U', '83', infile]
    (_, _, err) = utils.runscript(script, args, in_dir)

    assert "*** INFO: set memory ceiling automatically." in err, err
    assert "*** Ceiling is: 1e+06 bytes" in err, err


def test_normalize_by_median_sanity_check_3():
    infile = utils.copy_test_data('test-filter-abund-Ns.fq')
    in_dir = os.path.dirname(infile)
    tablefile = utils.get_temp_filename('table', in_dir)

    script = 'normalize-by-median.py'
    args = ['-s', tablefile, '-U', '83', '--fp-rate', '0.7', infile]
    (_, _, err) = utils.runscript(script, args, in_dir)
    assert "Overriding default fp 0.1 with new fp: 0.7" in err, err

    args = ['--loadgraph', tablefile, '-U', '83', infile]
    (_, _, err) = utils.runscript(script, args, in_dir)

    assert "WARNING: You have asked that the graph size be auto" in err, err
    assert "NOT be set automatically" in err, err
    assert "loading an existing graph" in err, err


def test_normalize_by_median_unforced_badfile():
    CUTOFF = '1'

    infile = utils.get_temp_filename("potatoes")
    outfile = infile + '.keep'
    in_dir = os.path.dirname(infile)
    script = 'normalize-by-median.py'
    args = ['-C', CUTOFF, '-k', '17', infile]
    (status, _, err) = utils.runscript(script, args, in_dir,
                                       fail_ok=True)
    assert status != 0
    assert "ERROR: [Errno 2] No such file or directory:" in err, err

    if os.path.exists(outfile):
        assert False, '.keep file should have been removed: '


def test_normalize_by_median_contradictory_args():
    # (the reference uses test-large.fa, not shipped in its test-data;
    # the arg check fires before input is read)
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)
    outfile = utils.get_temp_filename('report.out')

    script = 'normalize-by-median.py'
    args = ['-C', '1', '-k', '17', '--force_single', '-p', '-R',
            outfile, infile]
    (status, _, err) = utils.runscript(script, args, in_dir,
                                       fail_ok=True)
    assert status != 0
    assert "cannot both be set" in err, err


def test_normalize_by_median_stdout_3():
    CUTOFF = '1'

    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = ['-C', CUTOFF, '-k', '17', infile, '--output', '-']
    (_, _, err) = utils.runscript(script, args, in_dir)

    assert 'Total number of unique k-mers: 98' in err, err
    assert 'in block device' in err or 'in /dev/stdout' in err, err
    assert "I/O Errors" not in err


@pytest.mark.known_failing
def test_normalize_by_median_known_good():
    # known_failing in the reference too (golden mismatch; also the
    # 100k-filtered.fa.gz fixture is not shipped)
    CUTOFF = '2'

    infile = utils.copy_test_data('100k-filtered.fa.gz')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = ['-C', CUTOFF, '-k', '20', '-x', '4e6', infile]
    utils.runscript(script, args, in_dir)

    outfile = infile + '.keep'
    assert os.path.exists(outfile), outfile
    iter_known = screed_open(utils.get_test_data('100k-filtered.fa.keep.gz'))
    iter_out = screed_open(outfile)
    for rknown, rout in zip(iter_known, iter_out):
        assert rknown.name == rout.name


def test_normalize_by_median_report_fp():
    # basic reporting of diginorm stats => report.out, including
    # aggregate stats over two input files
    infile = utils.copy_test_data("test-abund-read-2.fa")
    infile2 = utils.copy_test_data("test-abund-read-2.fa", "copyDataTwo")

    in_dir = os.path.dirname(infile)
    outfile = utils.get_temp_filename('report.out')

    script = 'normalize-by-median.py'
    args = ['-C', '1', '-k', '17', '-R', outfile, infile, infile2]
    utils.runscript(script, args, in_dir)

    assert os.path.exists(outfile)
    with open(outfile) as report:
        line = report.readline().strip()
        assert line == 'total,kept,f_kept', line
        line = report.readline().strip()
        assert line == '1001,1,0.000999', line
        line = report.readline().strip()
        assert line == '2002,1,0.0004995', line


def test_normalize_by_median_report_fp_hifreq():
    # high-frequency reporting of diginorm stats for a single file
    infile = utils.copy_test_data('test-abund-read-2.fa')

    in_dir = os.path.dirname(infile)
    outfile = utils.get_temp_filename('report.out')

    script = 'normalize-by-median.py'
    args = ['-C', '1', '-k', '17', '-R', outfile, infile,
            '--report-frequency', '100']
    utils.runscript(script, args, in_dir)

    assert os.path.exists(outfile)
    with open(outfile) as report:
        line = report.readline().strip()
        assert line == 'total,kept,f_kept', line
        line = report.readline().strip()
        assert line == '100,1,0.01', line
        line = report.readline().strip()
        assert line == '200,1,0.005', line


@pytest.mark.huge
def test_normalize_by_median_report_fp_huge():
    # huge-marked in the reference (needs the unshipped test-large.fa)
    infile = utils.copy_test_data('test-large.fa')
    in_dir = os.path.dirname(infile)
    outfile = utils.get_temp_filename('report.out')

    script = 'normalize-by-median.py'
    args = ['-C', '1', '-k', '17', '-R', outfile, infile]
    (_, _, err) = utils.runscript(script, args, in_dir)

    assert "fp rate estimated to be 0.623" in err, err
    with open(outfile) as report:
        report.readline()            # skip header
        line = report.readline()
    assert "100000,25261,0.2526" in line, line


def test_normalize_by_median_unpaired_and_paired():
    CUTOFF = '1'

    infile = utils.copy_test_data('test-abund-read-paired.fa')
    in_dir = os.path.dirname(infile)

    unpairedfile = utils.copy_test_data('random-20-a.fa')

    script = 'normalize-by-median.py'
    args = ['-C', CUTOFF, '-k', '17', '-u', unpairedfile, '-p', infile]
    (_, _, err) = utils.runscript(script, args, in_dir)

    assert 'Total number of unique k-mers: 4061' in err, err

    outfile = infile + '.keep'
    assert os.path.exists(outfile), outfile


def test_normalize_by_median_count_kmers_PE():
    CUTOFF = '1'
    infile = utils.copy_test_data('paired_one.base.dif.fa')
    in_dir = os.path.dirname(infile)
    # One pair of identical reads except the last base: the 2nd read
    # is discarded in unpaired mode but kept in paired mode, adding
    # only one more unique k-mer
    script = 'normalize-by-median.py'

    args = ['-C', CUTOFF, '-k', '17', '--force_single', infile]
    (_, _, err) = utils.runscript(script, args, in_dir)
    assert 'Total number of unique k-mers: 98' in err, err
    assert 'kept 1 of 2 or 50.0%' in err, err

    args = ['-C', CUTOFF, '-k', '17', '-p', infile]
    (_, _, err) = utils.runscript(script, args, in_dir)
    assert 'Total number of unique k-mers: 99' in err, err
    assert 'kept 2 of 2 or 100.0%' in err, err


def test_normalize_by_median_double_file_name():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = [utils.get_test_data('test-abund-read-2.fa'), infile]

    (status, _, err) = utils.runscript(script, args, in_dir,
                                       fail_ok=True)
    assert status != 0
    assert "Duplicate filename--Cannot handle this!" in err, err


def test_normalize_by_median_stdin_no_out():
    script = 'normalize-by-median.py'
    args = ["-"]

    (status, _, err) = utils.runscript(script, args, fail_ok=True)
    assert status != 0
    assert "Accepting input from stdin; output filename" in err, err


def test_normalize_by_median_overwrite():
    outfile = utils.copy_test_data('test-abund-read.fa')
    in_dir = os.path.dirname(outfile)

    CUTOFF = '1'
    infile = utils.copy_test_data('test-abund-read-3.fa')
    script = 'normalize-by-median.py'

    args = ['-C', CUTOFF, '-k', '17', '-o', outfile, infile]
    utils.runscript(script, args, in_dir)
    assert os.path.exists(outfile), outfile
    seqs = [r.sequence for r in screed_open(outfile)]
    assert len(seqs) == 1, seqs
    assert 'GACAGCgtgCCGCA' in seqs[0], seqs


def test_normalize_by_median_version():
    script = 'normalize-by-median.py'
    args = ['--version']
    _, _, err = utils.runscript(script, args)

    errlines = err.splitlines()
    for errline in errlines:
        if errline.startswith('||') or not errline.strip():
            continue
        break

    assert errline.startswith('khmer ')


def test_normalize_by_median_2():
    CUTOFF = '2'

    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = ['-C', CUTOFF, '-k', '17', infile]
    utils.runscript(script, args, in_dir)

    outfile = infile + '.keep'
    assert os.path.exists(outfile), outfile

    seqs = [r.sequence for r in screed_open(outfile)]
    assert len(seqs) == 2, seqs
    assert seqs[0].startswith('GGTTGACGGGGCTCAGGGGG'), seqs
    assert seqs[1] == 'GGTTGACGGGGCTCAGGG', seqs


def test_normalize_by_median_paired():
    CUTOFF = '1'

    infile = utils.copy_test_data('test-abund-read-paired.fa')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = ['-C', CUTOFF, '-p', '-k', '17', infile]
    utils.runscript(script, args, in_dir)

    outfile = infile + '.keep'
    assert os.path.exists(outfile), outfile

    seqs = [r.sequence for r in screed_open(outfile)]
    assert len(seqs) == 2, seqs
    assert seqs[0].startswith('GGTTGACGGGGCTCAGGGGG'), seqs
    assert seqs[1].startswith('GGTTGACGGGGCTCAGGG'), seqs


def test_normalize_by_median_paired_fq():
    CUTOFF = '20'

    infile = utils.copy_test_data('test-abund-read-paired.fq')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = ['-C', CUTOFF, '-p', '-k', '17', infile]
    _, out, err = utils.runscript(script, args, in_dir)

    outfile = infile + '.keep'
    assert os.path.exists(outfile), outfile

    seqs = [r.sequence for r in screed_open(outfile)]
    assert len(seqs) == 6, len(seqs)
    assert seqs[0].startswith('GGTTGACGGGGCTCAGGGGG'), seqs
    assert seqs[1].startswith('GGTTGACGGGGCTCAGGG'), seqs

    names = [r.name for r in screed_open(outfile)]
    assert len(names) == 6, names
    assert '895:1:37:17593:9954 1::FOO' in names, names
    assert '895:1:37:17593:9954 2::FOO' in names, names


def test_normalize_by_median_impaired():
    CUTOFF = '1'

    infile = utils.copy_test_data('test-abund-read-impaired.fa')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = ['-C', CUTOFF, '-p', '-k', '17', infile]
    status, _, err = utils.runscript(script, args, in_dir, fail_ok=True)
    assert status != 0
    assert 'ERROR: Unpaired reads ' in err, err


def test_normalize_by_median_force():
    CUTOFF = '1'

    corrupt_infile = utils.copy_test_data('test-error-reads.fq')
    good_infile = utils.copy_test_data('test-fastq-reads.fq')

    in_dir = os.path.dirname(good_infile)

    script = 'normalize-by-median.py'
    args = ['-f', '-C', CUTOFF, '-k', '17', corrupt_infile, good_infile]

    _, _, err = utils.runscript(script, args, in_dir)

    assert '*** Skipping' in err
    assert '** I/O Errors' in err


def test_normalize_by_median_no_bigcount():
    infile = utils.copy_test_data("test-abund-read-2.fa")
    hashfile = utils.get_temp_filename('test-out.ct')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    # 256 is outside the range of valid values for C
    args = ['-C', '256', '-k', '8', '--savegraph', hashfile, infile]

    (status, out, err) = utils.runscript(script, args, in_dir,
                                         fail_ok=True)
    assert status == 1, (out, err)
    assert "ERROR: khmer only supports 0 <= cutoff < 256" in err


def test_normalize_by_median_empty():
    CUTOFF = '1'

    infile = utils.copy_test_data('test-empty.fa')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = ['-C', CUTOFF, '-k', '17', infile]
    utils.runscript(script, args, in_dir)

    outfile = infile + '.keep'
    assert os.path.exists(outfile), outfile


def test_normalize_by_median_emptycountgraph():
    CUTOFF = '1'

    infile = utils.copy_test_data('test-empty.fa')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = ['-C', CUTOFF, '--loadgraph', infile, infile]
    (status, out, err) = utils.runscript(script, args, in_dir,
                                         fail_ok=True)
    assert status != 0
    assert 'ValueError' in err or 'OSError' in err, (status, out, err)


def test_normalize_by_median_fpr():
    MAX_TABLESIZE_PARAM = 12

    infile = utils.copy_test_data('test-fastq-reads.fq')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = ['-f', '-k', '17', '-x', str(MAX_TABLESIZE_PARAM), infile]

    (status, _, err) = utils.runscript(script, args, in_dir,
                                       fail_ok=True)

    assert status != 0
    assert os.path.exists(infile + '.keep'), infile
    assert '** ERROR: the graph structure is too small' in err, err


def write_by_chunks(infile, outfile, CHUNKSIZE=8192):
    ifile = io.open(infile, 'rb')
    ofile = io.open(outfile, 'wb')
    chunk = ifile.read(CHUNKSIZE)
    while len(chunk) > 0:
        ofile.write(chunk)
        chunk = ifile.read(CHUNKSIZE)

    ifile.close()
    ofile.close()


def test_normalize_by_median_streaming_0():
    CUTOFF = '20'

    infile = utils.get_test_data('100-reads.fq.gz')
    in_dir = os.path.dirname(utils.get_temp_filename('x'))
    fifo = utils.get_temp_filename('fifo')
    outfile = utils.get_temp_filename('outfile')

    # Use a fifo to copy stdout to a file for checking
    os.mkfifo(fifo)
    thread = threading.Thread(target=write_by_chunks, args=(fifo, outfile))
    thread.start()

    # Execute diginorm
    script = 'normalize-by-median.py'
    args = ['-C', CUTOFF, '-k', '17', '-o', fifo, infile]
    utils.runscript(script, args, in_dir)

    thread.join()

    assert os.path.exists(outfile), outfile
    with open(outfile) as fp:
        linecount = sum(1 for _ in fp)
    assert linecount == 400


def test_normalize_by_median_streaming_1():
    CUTOFF = '20'

    infile = utils.get_test_data('test-filter-abund-Ns.fq')
    in_dir = os.path.dirname(utils.get_temp_filename('x'))
    fifo = utils.get_temp_filename('fifo')
    outfile = utils.get_temp_filename('outfile')

    # Use a fifo to feed the INPUT this time
    os.mkfifo(fifo)
    thread = threading.Thread(target=write_by_chunks, args=(infile, fifo))
    thread.start()

    script = 'normalize-by-median.py'
    args = ['-C', CUTOFF, '-k', '17', '-o', outfile, fifo]
    (_, _, err) = utils.runscript(script, args, in_dir)

    thread.join()

    assert os.path.exists(outfile), outfile
    assert 'Total number of unique k-mers: 98' in err, err
    assert 'fifo is empty' not in err, err


def test_diginorm_basic_functionality_1():
    # each of these pairs has both a multicopy sequence ('ACTTCA...')
    # and a random sequence.  With 'C=1' and '-p', all should be kept.
    CUTOFF = ['-C', '1']
    PAIRING = ['-p']

    infile = utils.copy_test_data('dn-test-all-paired-all-keep.fa')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = list(CUTOFF) + list(PAIRING) + ['-k', '15', infile]
    utils.runscript(script, args, in_dir)

    outfile = infile + '.keep'
    assert os.path.exists(outfile), outfile

    seqs = set(r.name for r in screed_open(outfile))

    assert seqs == set(['a/1', 'a/2',
                        'b/1', 'b/2',
                        'c/1', 'c/2',
                        'd/1', 'd/2']), seqs


def test_diginorm_basic_functionality_2():
    # with 'C=1' and '--force_single', only random seqs should be
    # kept, together with one copy of the multicopy sequence
    CUTOFF = ['-C', '1']
    PAIRING = ['--force_single']

    infile = utils.copy_test_data('dn-test-all-paired-all-keep.fa')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = list(CUTOFF) + list(PAIRING) + ['-k', '15', infile]
    utils.runscript(script, args, in_dir)

    outfile = infile + '.keep'
    assert os.path.exists(outfile), outfile

    seqs = set(r.name for r in screed_open(outfile))

    assert seqs == set(['a/1', 'a/2',
                        'b/2',
                        'c/1',
                        'd/2']), seqs


def test_diginorm_basic_functionality_3():
    # entirely unpaired data with one duplicate: C=1 leaves three seqs
    CUTOFF = ['-C', '1']
    PAIRING = []

    infile = utils.copy_test_data('dn-test-none-paired.fa')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = list(CUTOFF) + list(PAIRING) + ['-k', '15', infile]
    utils.runscript(script, args, in_dir)

    outfile = infile + '.keep'
    assert os.path.exists(outfile), outfile

    seqs = set(r.name for r in screed_open(outfile))

    assert seqs == set(['a/1',
                        'b/2',
                        'd/1']), seqs


def test_diginorm_basic_functionality_4():
    # mixed paired/unpaired with one duplicate
    CUTOFF = ['-C', '1']

    infile = utils.copy_test_data('dn-test-some-paired-all-keep.fa')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = list(CUTOFF) + ['-k', '15', infile]

    utils.runscript(script, args, in_dir)

    outfile = infile + '.keep'
    assert os.path.exists(outfile), outfile

    seqs = set(r.name for r in screed_open(outfile))

    assert seqs == set(['a/1', 'a/2',
                        'b/2',
                        'c/1', 'c/2',
                        'd/2']), seqs


def test_diginorm_basic_functionality_5():
    CUTOFF = ['-C', '1']
    PAIRING = ['-p']

    infile = utils.copy_test_data('dn-test-all-paired-all-keep.fa')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = list(CUTOFF) + list(PAIRING) + ['-k', '15', infile]
    utils.runscript(script, args, in_dir)

    outfile = infile + '.keep'
    assert os.path.exists(outfile), outfile

    seqs = set(r.name for r in screed_open(outfile))

    assert seqs == set(['a/1', 'a/2',
                        'b/1', 'b/2',
                        'c/1', 'c/2',
                        'd/1', 'd/2']), seqs


def test_normalize_by_median_outfile_closed_err():
    infile1 = utils.get_test_data('paired-mixed.fa.pe')
    infile2 = utils.get_test_data("test-abund-read-2.fa")
    outfile = utils.get_temp_filename('outfile_xxx')
    script = 'normalize-by-median.py'
    args = ['-o', outfile, infile1, infile2]
    (status, out, err) = utils.runscript(script, args)
    assert status == 0, (out, err)
    assert os.path.exists(outfile)


def test_normalize_by_median_long_k():
    CUTOFF = '2'

    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = ['-C', CUTOFF, '-k', '33', '-H', 'murmur', infile]
    utils.runscript(script, args, in_dir)

    outfile = infile + '.keep'
    assert os.path.exists(outfile), outfile

    seqs = [r.sequence for r in screed_open(outfile)]
    assert len(seqs) == 1, seqs
    assert seqs[0].startswith('GGTTGACGGGGCTCAGGGGG'), seqs


def test_normalize_by_median_long_k_twobit_fails():
    CUTOFF = '2'

    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = ['-C', CUTOFF, '-k', '33', '-H', 'murmur', infile,
            '-H', 'twobit-exact']
    (status, out, err) = utils.runscript(script, args, in_dir,
                                         fail_ok=True)

    assert status == 1
    assert "'twobit-exact' only supports k-mer sizes <= 32" in err


def test_normalize_by_median_long_k_save_fails():
    CUTOFF = '2'

    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = ['-C', CUTOFF, '-k', '33', '-H', 'murmur', infile, '-s',
            'foo']
    (status, out, err) = utils.runscript(script, args, in_dir,
                                         fail_ok=True)

    assert status == 1
    assert 'ERROR: cannot save different hash functions yet.' in err


def test_normalize_by_median_long_k_load_fails():
    CUTOFF = '2'

    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    script = 'normalize-by-median.py'
    args = ['-C', CUTOFF, '-k', '33', '-H', 'murmur', infile, '-l',
            'foo']
    (status, out, err) = utils.runscript(script, args, in_dir,
                                         fail_ok=True)

    assert status == 1
    assert 'ERROR: cannot load different hash functions yet.' in err


def test_scan_link_width_invariance():
    """KHMER_TPU_SCAN_LINK (bundles per sequential scan link in the
    batched dn/trim kernels) must not change ANY output byte: the
    in-link overlap correction replays the per-bundle tally exactly
    (round-5 K-bundle links)."""
    import subprocess
    import sys

    infile = utils.get_test_data('test-abund-read-2.fa')
    outs = {}
    for link in ("1", "3", "8"):
        outfile = utils.get_temp_filename('keep_%s.fa' % link)
        env = utils.subprocess_env()
        env["KHMER_TPU_PLATFORM"] = "cpu"
        env["KHMER_TPU_SCAN_LINK"] = link
        r = subprocess.run(
            [sys.executable,
             utils.scriptpath('normalize-by-median.py'),
             '-C', '2', '-k', '17', '-o', outfile, infile],
            capture_output=True, text=True, timeout=300, env=env)
        assert r.returncode == 0, r.stderr[-1500:]
        with open(outfile, 'rb') as f:
            outs[link] = f.read()
        assert 'Total number of unique k-mers' in r.stderr
        outs[link + ':err'] = [
            l for l in r.stderr.splitlines() if 'unique' in l]
    assert outs["1"] == outs["3"] == outs["8"]
    assert outs["1:err"] == outs["3:err"] == outs["8:err"]
