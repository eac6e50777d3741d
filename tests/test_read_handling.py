"""Read-handling script tests ported from the reference
tests/test_read_handling.py (interleave/split/extract + ReadBundle)."""

import gzip
import os

import pytest

import khmer_tpu as khmer
from khmer_tpu.io.fastx import FastxReader
from khmer_tpu.utils import ReadBundle

from . import khmer_tst_utils as utils


def _records(filename):
    return list(FastxReader(filename))


def _same_records(expected_fn, actual_fn, check_quality=False):
    n = 0
    for r, q in zip(_records(expected_fn), _records(actual_fn)):
        n += 1
        assert r.name == q.name
        assert r.sequence == q.sequence
        if check_quality:
            assert r.quality == q.quality
    assert n > 0


def test_interleave_read_stdout():
    infile1 = utils.get_test_data('paired-slash1.fq.1')
    infile2 = utils.get_test_data('paired-slash1.fq.2')
    ex_outfile = utils.get_test_data('paired-slash1.fq')
    outfile = utils.get_temp_filename('out.fq')

    (stats, out, err) = utils.runscript('interleave-reads.py',
                                        [infile1, infile2])

    with open(outfile, 'w') as ofile:
        ofile.write(out)

    _same_records(ex_outfile, outfile)


def test_interleave_read_seq1_fq():
    infile1 = utils.get_test_data('paired-slash1.fq.1')
    infile2 = utils.get_test_data('paired-slash1.fq.2')
    ex_outfile = utils.get_test_data('paired-slash1.fq')
    outfile = utils.get_temp_filename('out.fq')

    utils.runscript('interleave-reads.py',
                    [infile1, infile2, '-o', outfile])

    _same_records(ex_outfile, outfile)


def test_interleave_read_badleft_badright():
    infile1 = utils.get_test_data('paired-broken.fq.badleft')
    infile2 = utils.get_test_data('paired-broken.fq.badright')
    ex_outfile = utils.get_test_data('paired-broken.fq.paired_bad')
    outfile = utils.get_temp_filename('out.fq')

    utils.runscript('interleave-reads.py',
                    [infile1, infile2, '-o', outfile])

    _same_records(ex_outfile, outfile)


def test_interleave_reads_1_fq():
    infile1 = utils.get_test_data('paired.fq.1')
    infile2 = utils.get_test_data('paired.fq.2')
    ex_outfile = utils.get_test_data('paired.fq')
    outfile = utils.get_temp_filename('out.fq')

    utils.runscript('interleave-reads.py',
                    [infile1, infile2, '-o', outfile])

    r = open(ex_outfile).read()
    q = open(outfile).read()

    assert r == q, (r, q)


def test_interleave_reads_no_reformat():
    infile1 = utils.get_test_data('paired.fq.1')
    infile2 = utils.get_test_data('paired.malformat.fq.2')
    ex_outfile = utils.get_test_data('paired.malformat.fq')
    outfile = utils.get_temp_filename('out.fq')

    utils.runscript('interleave-reads.py',
                    [infile1, infile2, '--no-reformat', '-o', outfile])

    r = open(ex_outfile).read()
    q = open(outfile).read()

    assert r == q, (r, q)


def test_interleave_reads_broken_fq():
    infile1 = utils.get_test_data('paired-broken.fq.1')
    infile2 = utils.get_test_data('paired-broken.fq.2')
    outfile = utils.get_temp_filename('out.fq')

    status, out, err = utils.runscript(
        'interleave-reads.py', [infile1, infile2, '-o', outfile],
        fail_ok=True)
    assert status == 1
    assert 'ERROR: Input files contain different number of records.' in err


@pytest.mark.parametrize('suffix', ['2', '3', '4'])
def test_interleave_reads_broken_fq_pairing(suffix):
    infile1 = utils.get_test_data('paired-broken%s.fq.1' % suffix)
    infile2 = utils.get_test_data('paired-broken%s.fq.2' % suffix)
    outfile = utils.get_temp_filename('out.fq')

    status, out, err = utils.runscript(
        'interleave-reads.py', [infile1, infile2, '-o', outfile],
        fail_ok=True)
    assert status == 1
    assert "ERROR: This doesn't look like paired data!" in err


def test_interleave_reads_2_fa():
    infile1 = utils.get_test_data('paired.fa.1')
    infile2 = utils.get_test_data('paired.fa.2')
    ex_outfile = utils.get_test_data('paired.fa')
    outfile = utils.get_temp_filename('out.fa')

    utils.runscript('interleave-reads.py',
                    [infile1, infile2, '-o', outfile])

    _same_records(ex_outfile, outfile)


def test_split_paired_reads_1_fa():
    infile = utils.get_test_data('paired.fa')

    ex_outfile1 = utils.get_test_data('paired.fa.1')
    ex_outfile2 = utils.get_test_data('paired.fa.2')

    outfile1 = utils.get_temp_filename('paired.fa.1')
    in_dir = os.path.dirname(outfile1)
    outfile2 = utils.get_temp_filename('paired.fa.2', in_dir)

    utils.runscript('split-paired-reads.py', [infile], in_dir)

    assert os.path.exists(outfile1), outfile1
    assert os.path.exists(outfile2), outfile2

    _same_records(ex_outfile1, outfile1)
    _same_records(ex_outfile2, outfile2)


def test_split_paired_reads_2_fq():
    infile = utils.get_test_data('paired.fq')

    ex_outfile1 = utils.get_test_data('paired.fq.1')
    ex_outfile2 = utils.get_test_data('paired.fq.2')

    outfile1 = utils.get_temp_filename('paired.fq.1')
    in_dir = os.path.dirname(outfile1)
    outfile2 = utils.get_temp_filename('paired.fq.2', in_dir)

    utils.runscript('split-paired-reads.py', [infile], in_dir)

    assert os.path.exists(outfile1), outfile1
    assert os.path.exists(outfile2), outfile2

    _same_records(ex_outfile1, outfile1, check_quality=True)
    _same_records(ex_outfile2, outfile2, check_quality=True)


def test_split_paired_reads_2_mixed_fq_require_pair():
    infile = utils.copy_test_data('paired-mixed.fq')
    in_dir = os.path.dirname(infile)

    status, out, err = utils.runscript('split-paired-reads.py', [infile],
                                       in_dir, fail_ok=True)
    assert status == 1, status
    assert "Unpaired reads found" in err


def test_split_paired_reads_2_stdin_no_out():
    status, out, err = utils.runscript('split-paired-reads.py', ['-'],
                                       fail_ok=True)
    assert status == 1
    assert "Accepting input from stdin; output filenames must " in err


def test_split_paired_reads_2_mixed_fq():
    infile = utils.copy_test_data('paired-mixed-2.fq')
    in_dir = os.path.dirname(infile)

    status, out, err = utils.runscript(
        'split-paired-reads.py', ['-0', '/dev/null', infile], in_dir)
    assert status == 0
    assert "split 6 sequences (3 left, 3 right, 5 orphans)" in err, err


def test_split_paired_reads_2_mixed_fq_orphans_to_file():
    infile = utils.copy_test_data('paired-mixed-2.fq')
    in_dir = os.path.dirname(infile)
    outfile = utils.get_temp_filename('out.fq')

    status, out, err = utils.runscript(
        'split-paired-reads.py', ['-0', outfile, infile], in_dir)
    assert status == 0
    assert "split 6 sequences (3 left, 3 right, 5 orphans)" in err, err

    n_orphans = len([1 for record in FastxReader(outfile)])
    assert n_orphans == 5
    n_left = len([1 for record in FastxReader(infile + '.1')])
    assert n_left == 3
    n_right = len([1 for record in FastxReader(infile + '.2')])
    assert n_right == 3
    for filename in [outfile, infile + '.1', infile + '.2']:
        fp = gzip.open(filename)
        try:
            fp.read()
        except IOError as e:
            assert "Not a gzipped file" in str(e), str(e)
        fp.close()


def test_split_paired_reads_2_mixed_fq_gzfile():
    infile = utils.copy_test_data('paired-mixed-2.fq')
    in_dir = os.path.dirname(infile)
    outfile = utils.get_temp_filename('out.fq')

    status, out, err = utils.runscript(
        'split-paired-reads.py', ['-0', outfile, '--gzip', infile],
        in_dir)
    assert status == 0
    assert "split 6 sequences (3 left, 3 right, 5 orphans)" in err, err

    n_orphans = len([1 for record in FastxReader(outfile)])
    assert n_orphans == 5
    n_left = len([1 for record in FastxReader(infile + '.1')])
    assert n_left == 3
    n_right = len([1 for record in FastxReader(infile + '.2')])
    assert n_right == 3

    for filename in [outfile, infile + '.1', infile + '.2']:
        fp = gzip.open(filename)
        fp.read()                       # this will fail if not gzip file
        fp.close()


def test_split_paired_reads_2_mixed_fq_broken_pairing_format():
    infile = utils.copy_test_data('paired-mixed-broken.fq')
    in_dir = os.path.dirname(infile)

    status, out, err = utils.runscript('split-paired-reads.py', [infile],
                                       in_dir, fail_ok=True)
    assert status == 1
    assert "Unpaired reads found starting at 895:1:37:17593:9954" in err, \
        err


def test_split_paired_reads_3_output_dir():
    infile = utils.get_test_data('paired.fq')

    ex_outfile1 = utils.get_test_data('paired.fq.1')
    ex_outfile2 = utils.get_test_data('paired.fq.2')

    testdir = utils.get_temp_filename('test')
    output_dir = os.path.join(os.path.dirname(testdir), "out")
    outfile1 = os.path.join(output_dir, 'paired.fq.1')
    outfile2 = os.path.join(output_dir, 'paired.fq.2')

    utils.runscript('split-paired-reads.py',
                    ['--output-dir', output_dir, infile])

    assert os.path.exists(outfile1), outfile1
    assert os.path.exists(outfile2), outfile2

    _same_records(ex_outfile1, outfile1, check_quality=True)
    _same_records(ex_outfile2, outfile2, check_quality=True)


def test_split_paired_reads_3_output_files():
    infile = utils.get_test_data('paired.fq')

    ex_outfile1 = utils.get_test_data('paired.fq.1')
    ex_outfile2 = utils.get_test_data('paired.fq.2')

    outfile1 = utils.get_temp_filename('xxx')
    output_dir = os.path.dirname(outfile1)
    outfile2 = utils.get_temp_filename('yyy', output_dir)

    utils.runscript('split-paired-reads.py',
                    ['-1', outfile1, '-2', outfile2, infile])

    assert os.path.exists(outfile1), outfile1
    assert os.path.exists(outfile2), outfile2

    _same_records(ex_outfile1, outfile1, check_quality=True)
    _same_records(ex_outfile2, outfile2, check_quality=True)


def test_split_paired_reads_3_output_files_left():
    infile = utils.get_test_data('paired.fq')

    ex_outfile1 = utils.get_test_data('paired.fq.1')
    ex_outfile2 = utils.get_test_data('paired.fq.2')

    outfile1 = utils.get_temp_filename('xxx')
    output_dir = os.path.dirname(outfile1)
    outfile2 = os.path.join(output_dir, 'paired.fq.2')

    utils.runscript('split-paired-reads.py',
                    ['-d', output_dir, '-1', outfile1, infile])

    assert os.path.exists(outfile1), outfile1
    assert os.path.exists(outfile2), outfile2

    _same_records(ex_outfile1, outfile1, check_quality=True)
    _same_records(ex_outfile2, outfile2, check_quality=True)


def test_split_paired_reads_3_output_files_right():
    infile = utils.get_test_data('paired.fq')

    ex_outfile1 = utils.get_test_data('paired.fq.1')
    ex_outfile2 = utils.get_test_data('paired.fq.2')

    outfile2 = utils.get_temp_filename('yyy')
    output_dir = os.path.dirname(outfile2)
    outfile1 = os.path.join(output_dir, 'paired.fq.1')

    utils.runscript('split-paired-reads.py',
                    ['-d', output_dir, '-2', outfile2, infile])

    assert os.path.exists(outfile1), outfile1
    assert os.path.exists(outfile2), outfile2

    _same_records(ex_outfile1, outfile1, check_quality=True)
    _same_records(ex_outfile2, outfile2, check_quality=True)


def test_extract_paired_reads_unpaired():
    infile = utils.get_test_data('random-20-a.fa')

    outfile1 = utils.get_temp_filename('unpaired.pe.fa')
    in_dir = os.path.dirname(outfile1)

    (_, _, err) = utils.runscript('extract-paired-reads.py', [infile],
                                  in_dir, fail_ok=True)
    assert 'no paired reads!? check file formats...' in err, err


def test_extract_paired_reads_1_fa():
    infile = utils.get_test_data('paired-mixed.fa')

    ex_outfile1 = utils.get_test_data('paired-mixed.fa.pe')
    ex_outfile2 = utils.get_test_data('paired-mixed.fa.se')

    outfile1 = utils.get_temp_filename('paired-mixed.fa.pe')
    in_dir = os.path.dirname(outfile1)
    outfile2 = utils.get_temp_filename('paired-mixed.fa.se', in_dir)

    utils.runscript('extract-paired-reads.py', [infile], in_dir)

    assert os.path.exists(outfile1), outfile1
    assert os.path.exists(outfile2), outfile2

    _same_records(ex_outfile1, outfile1)
    _same_records(ex_outfile2, outfile2)


def test_extract_paired_reads_2_fq():
    infile = utils.get_test_data('paired-mixed.fq')

    ex_outfile1 = utils.get_test_data('paired-mixed.fq.pe')
    ex_outfile2 = utils.get_test_data('paired-mixed.fq.se')

    outfile1 = utils.get_temp_filename('paired-mixed.fq.pe')
    in_dir = os.path.dirname(outfile1)
    outfile2 = utils.get_temp_filename('paired-mixed.fq.se', in_dir)

    utils.runscript('extract-paired-reads.py', [infile], in_dir)

    assert os.path.exists(outfile1), outfile1
    assert os.path.exists(outfile2), outfile2

    _same_records(ex_outfile1, outfile1, check_quality=True)
    _same_records(ex_outfile2, outfile2, check_quality=True)


def test_extract_paired_reads_3_output_dir():
    infile = utils.get_test_data('paired-mixed.fa')

    ex_outfile1 = utils.get_test_data('paired-mixed.fa.pe')
    ex_outfile2 = utils.get_test_data('paired-mixed.fa.se')

    out_dir = utils.get_temp_filename('output')

    utils.runscript('extract-paired-reads.py', [infile, '-d', out_dir])

    outfile1 = os.path.join(out_dir, 'paired-mixed.fa.pe')
    outfile2 = os.path.join(out_dir, 'paired-mixed.fa.se')
    assert os.path.exists(outfile1), outfile1
    assert os.path.exists(outfile2), outfile2

    _same_records(ex_outfile1, outfile1)
    _same_records(ex_outfile2, outfile2)


def test_extract_paired_reads_4_output_files():
    infile = utils.get_test_data('paired-mixed.fa')

    ex_outfile1 = utils.get_test_data('paired-mixed.fa.pe')
    ex_outfile2 = utils.get_test_data('paired-mixed.fa.se')

    outfile1 = utils.get_temp_filename('out_pe')
    outfile2 = utils.get_temp_filename('out_se')

    utils.runscript('extract-paired-reads.py',
                    [infile, '-p', outfile1, '-s', outfile2])

    assert os.path.exists(outfile1), outfile1
    assert os.path.exists(outfile2), outfile2

    _same_records(ex_outfile1, outfile1)
    _same_records(ex_outfile2, outfile2)


def test_extract_paired_reads_5_stdin_error():
    status, out, err = utils.runscript('extract-paired-reads.py',
                                       ['-f', '/dev/stdin'], fail_ok=True)
    assert status == 1
    assert "output filenames must be provided." in err


def test_read_bundler():
    infile = utils.get_test_data('unclean-reads.fastq')
    records = [r for r in khmer.ReadParser(infile)]
    bundle = ReadBundle(*records)

    raw_seqs = (
        'GGTTGACGGGGNNNAGGGGGCGGCTGACTCCGAGAGACAGCAGCCGCAGCTGTCGTCAGGGG'
        'ATTTCCGGGGCGGAGGCCGCAGACGCGAGTGGTGGAGG',
        'GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAGAGACAGCAGCCGCAGCTGTCGTCAGGGG'
        'ANNNCCGGGGCGGAGGCCGCAGACGCGAGTGGTGGAGG',
    )

    cleaned_seqs = (
        'GGTTGACGGGGAAAAGGGGGCGGCTGACTCCGAGAGACAGCAGCCGCAGCTGTCGTCAGGGG'
        'ATTTCCGGGGCGGAGGCCGCAGACGCGAGTGGTGGAGG',
        'GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAGAGACAGCAGCCGCAGCTGTCGTCAGGGG'
        'AAAACCGGGGCGGAGGCCGCAGACGCGAGTGGTGGAGG',
    )

    assert bundle.num_reads == 2
    assert bundle.total_length == 200

    for read, raw_seq, clean_seq in zip(bundle.reads, raw_seqs,
                                        cleaned_seqs):
        assert read.sequence == raw_seq
        assert read.cleaned_seq == clean_seq


def test_read_bundler_single_read():
    infile = utils.get_test_data('single-read.fq')
    records = [r for r in khmer.ReadParser(infile)]
    bundle = ReadBundle(*records)
    assert bundle.num_reads == 1
    assert bundle.reads[0].sequence == bundle.reads[0].cleaned_seq


def test_read_bundler_empty_file():
    infile = utils.get_test_data('empty-file')
    with pytest.raises(OSError):
        [r for r in khmer.ReadParser(infile)]


def test_read_bundler_empty_list():
    bundle = ReadBundle(*[])
    assert bundle.num_reads == 0


def test_interleave_reads_broken_fq_2():
    infile1 = utils.get_test_data('paired-broken2.fq.1')
    infile2 = utils.get_test_data('paired-broken2.fq.2')

    outfile = utils.get_temp_filename('out.fq')

    script = 'interleave-reads.py'
    args = [infile1, infile2, '-o', outfile]

    status, out, err = utils.runscript(script, args, fail_ok=True)
    assert status == 1
    assert "ERROR: This doesn't look like paired data!" in err


def test_interleave_reads_broken_fq_3():
    infile1 = utils.get_test_data('paired-broken3.fq.1')
    infile2 = utils.get_test_data('paired-broken3.fq.2')

    outfile = utils.get_temp_filename('out.fq')

    script = 'interleave-reads.py'
    args = [infile1, infile2, '-o', outfile]

    status, out, err = utils.runscript(script, args, fail_ok=True)
    assert status == 1
    assert "ERROR: This doesn't look like paired data!" in err


def test_interleave_reads_broken_fq_5():
    infile1 = utils.get_test_data('paired-broken4.fq.1')
    infile2 = utils.get_test_data('paired-broken4.fq.2')

    outfile = utils.get_temp_filename('out.fq')

    script = 'interleave-reads.py'
    args = [infile1, infile2, '-o', outfile]

    status, out, err = utils.runscript(script, args, fail_ok=True)
    assert status == 1
    assert "ERROR: This doesn't look like paired data!" in err
