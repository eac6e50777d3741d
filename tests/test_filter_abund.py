"""filter-abund / filter-abund-single tests ported from the reference
tests/test_filter_abund.py."""

import os
from hashlib import md5

from khmer_tpu.io.fastx import FastxReader

from . import khmer_tst_utils as utils


def _make_counting(infilename, SIZE=1e7, N=2, K=20, BIGCOUNT=True):
    args = ['-x', str(SIZE), '-N', str(N), '-k', str(K)]
    if not BIGCOUNT:
        args.append('-b')
    outfile = utils.get_temp_filename('out.ct')
    args.extend([outfile, infilename])
    utils.runscript('load-into-counting.py', args)
    assert os.path.exists(outfile)
    return outfile


def _seqs(path):
    try:
        return set(r.sequence for r in FastxReader(path))
    except OSError:
        # empty output file (parser raises like the reference)
        return set()


def _names(path):
    return set(r.name for r in FastxReader(path))


def test_filter_abund_1():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    n_infile = utils.copy_test_data('test-fastq-n-reads.fq')

    in_dir = os.path.dirname(infile)
    n_in_dir = os.path.dirname(n_infile)

    counting_ht = _make_counting(infile, K=17)
    n_counting_ht = _make_counting(n_infile, K=17)

    utils.runscript('filter-abund.py', [counting_ht, infile], in_dir)

    outfile = infile + '.abundfilt'
    n_outfile = n_infile + '.abundfilt'
    n_outfile2 = n_infile + '2.abundfilt'

    assert os.path.exists(outfile), outfile

    seqs = _seqs(outfile)
    assert len(seqs) == 1, seqs
    assert 'GGTTGACGGGGCTCAGGG' in seqs

    utils.runscript('filter-abund.py', [n_counting_ht, n_infile],
                    n_in_dir)
    assert os.path.exists(n_outfile), n_outfile

    utils.runscript('filter-abund.py',
                    [n_counting_ht, n_infile, '-o', n_outfile2], in_dir)
    assert os.path.exists(n_outfile2), n_outfile2


def test_filter_abund_2():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    counting_ht = _make_counting(infile, K=17)

    utils.runscript('filter-abund.py',
                    ['-C', '1', counting_ht, infile, infile], in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = _seqs(outfile)
    assert len(seqs) == 2, seqs
    assert 'GGTTGACGGGGCTCAGGG' in seqs


def test_filter_abund_2_stdin():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    counting_ht = _make_counting(infile, K=17)

    (status, out, err) = utils.runscript(
        'filter-abund.py', ['-C', '1', counting_ht, '-'], in_dir,
        fail_ok=True)
    assert status == 1
    assert "Accepting input from stdin; output filename must be provided" \
           in str(err)


def test_filter_abund_2_stdin_gzip_out():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)
    outfile = utils.get_temp_filename('out.fa.gz')

    counting_ht = _make_counting(infile, K=17)

    (status, out, err) = utils.runscript(
        'filter-abund.py',
        ['-C', '1', counting_ht, infile, '-o', outfile, '--gzip'],
        in_dir, fail_ok=True)
    assert status == 0


def test_filter_abund_3_fq_retained():
    infile = utils.copy_test_data('test-abund-read-2.fq')
    in_dir = os.path.dirname(infile)

    counting_ht = _make_counting(infile, K=17)

    utils.runscript('filter-abund.py',
                    ['-C', '1', counting_ht, infile, infile], in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = _seqs(outfile)
    assert len(seqs) == 2, seqs
    assert 'GGTTGACGGGGCTCAGGG' in seqs

    # check for 'quality' string.
    quals = set(r.quality for r in FastxReader(outfile))
    assert len(quals) == 2, quals
    assert '##################' in quals


def test_filter_abund_4_fq_casava_18():
    infile = utils.copy_test_data('test-abund-read-2.paired2.fq')
    in_dir = os.path.dirname(infile)

    counting_ht = _make_counting(infile, K=17)

    utils.runscript('filter-abund.py', [counting_ht, infile, infile],
                    in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    assert 'pair:foo 1::N' in _names(outfile)


def test_filter_abund_1_singlefile():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    (status, out, err) = utils.runscript(
        'filter-abund-single.py',
        ['-x', '1e7', '-N', '2', '-k', '17', infile], in_dir)

    assert 'Total number of unique k-mers: 98' in err, err

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = _seqs(outfile)
    assert len(seqs) == 1, seqs
    assert 'GGTTGACGGGGCTCAGGG' in seqs


def test_filter_abund_1_singlefile_long_k():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    (status, out, err) = utils.runscript(
        'filter-abund-single.py',
        ['-x', '1e7', '-N', '2', '-k', '35', '-H', 'murmur', infile],
        in_dir)

    assert 'Total number of unique k-mers: 80' in err, err

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = _seqs(outfile)
    assert len(seqs) == 0


def test_filter_abund_1_singlefile_long_k_nosave():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    (status, out, err) = utils.runscript(
        'filter-abund-single.py',
        ['-x', '1e7', '-N', '2', '-k', '35', '-H', 'murmur', infile,
         '--savegraph', 'foo'], in_dir, fail_ok=True)

    assert status == 1
    assert 'ERROR: cannot save different hash functions yet.' in err


def test_filter_abund_2_singlefile():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)
    tabfile = utils.get_temp_filename('test-savegraph.ct')

    (status, out, err) = utils.runscript(
        'filter-abund-single.py',
        ['-x', '1e7', '-N', '2', '-k', '17', '--savegraph', tabfile,
         infile], in_dir)

    assert 'Total number of unique k-mers: 98' in err, err

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = _seqs(outfile)
    assert len(seqs) == 1, seqs
    assert 'GGTTGACGGGGCTCAGGG' in seqs


def test_filter_abund_2_singlefile_fq_casava_18():
    infile = utils.copy_test_data('test-abund-read-2.paired2.fq')
    in_dir = os.path.dirname(infile)

    (status, out, err) = utils.runscript(
        'filter-abund-single.py',
        ['-x', '1e7', '-N', '2', '-k', '17', infile], in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    assert 'pair:foo 1::N' in _names(outfile)


def test_filter_abund_4_retain_low_abund():
    # -V does not trim low-abundance sequences
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    counting_ht = _make_counting(infile, K=17)

    utils.runscript('filter-abund.py', ['-V', counting_ht, infile],
                    in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = _seqs(outfile)
    assert len(seqs) == 2, seqs
    assert 'GGTTGACGGGGCTCAGGG' in seqs


def test_filter_abund_single_4_retain_low_abund():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    utils.runscript('filter-abund-single.py', ['-k', '17', '-V', infile],
                    in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = _seqs(outfile)
    assert len(seqs) == 2, seqs
    assert 'GGTTGACGGGGCTCAGGG' in seqs


def test_filter_abund_5_trim_high_abund():
    # -V *does* trim high-abundance sequences
    infile = utils.copy_test_data('test-abund-read-3.fa')
    in_dir = os.path.dirname(infile)

    counting_ht = _make_counting(infile, K=17)

    utils.runscript('filter-abund.py', ['-V', counting_ht, infile],
                    in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = _seqs(outfile)
    assert len(seqs) == 2, seqs

    # trimmed sequence @ error
    assert 'GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAGAGACAGC' in seqs


def test_filter_abund_single_trim_high_abund():
    infile = utils.copy_test_data('test-abund-read-3.fa')
    in_dir = os.path.dirname(infile)

    utils.runscript('filter-abund-single.py', ['-k', '17', '-V', infile],
                    in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = _seqs(outfile)
    assert len(seqs) == 2, seqs

    assert 'GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAGAGACAGC' in seqs


def test_filter_abund_6_trim_high_abund_Z():
    # -V/-Z interaction: no trimming when -Z is high enough
    infile = utils.copy_test_data('test-abund-read-3.fa')
    in_dir = os.path.dirname(infile)

    counting_ht = _make_counting(infile, K=17)

    for script, args in (('filter-abund.py',
                          ['-V', '-Z', '25', counting_ht, infile]),
                         ('filter-abund-single.py',
                          ['-k', '17', '-V', '-Z', '25', infile])):
        utils.runscript(script, args, in_dir)

        outfile = infile + '.abundfilt'
        assert os.path.exists(outfile), outfile

        seqs = _seqs(outfile)
        assert len(seqs) == 2, seqs

        # untrimmed seq.
        badseq = 'GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAGAGACAGCgtgCCGCAGCTG' \
                 'TCGTCAGGGGATTTCCGGGCGG'
        assert badseq in seqs       # should be there, untrimmed


def test_filter_abund_7_retain_Ns():
    # filter-abund retains sequences with Ns (treated as As)
    infile = utils.copy_test_data('test-filter-abund-Ns.fq')
    in_dir = os.path.dirname(infile)

    counting_ht = _make_counting(infile, K=17)

    utils.runscript('filter-abund.py', ['-C', '3', counting_ht, infile],
                    in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    names = _names(outfile)
    assert '895:1:37:17593:9954 1::FOO_withN' in names, names

    # the 'N' was counted as an 'A'...
    seqs = _seqs(outfile)
    assert 'GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAG' not in seqs, seqs

    # ...but an 'N' remains in the output sequences
    assert any('N' in s for s in seqs), seqs


def test_filter_abund_single_8_retain_Ns():
    infile = utils.copy_test_data('test-filter-abund-Ns.fq')
    in_dir = os.path.dirname(infile)

    utils.runscript(
        'filter-abund-single.py',
        ['-k', '17', '-x', '1e7', '-N', '2', '-C', '3', infile], in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    names = _names(outfile)
    assert '895:1:37:17593:9954 1::FOO_withN' in names, names

    seqs = _seqs(outfile)
    assert 'GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAG' not in seqs, seqs
    assert any('N' in s for s in seqs), seqs


def test_outfile():
    infile = utils.get_test_data('paired-mixed-witherror.fa.pe')
    outfile = utils.get_temp_filename(
        'paired-mixed-witherror.fa.pe.abundfilt')
    (status, out, err) = utils.runscript('filter-abund-single.py',
                                         ['-o', outfile, infile])
    m = md5()
    m.update(open(outfile, 'rb').read())
    assert m.hexdigest() == 'f17122f4c0c3dc0bcc4eeb375de93040', \
        m.hexdigest()


def test_filter_abund_1_quiet():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    counting_ht = _make_counting(infile, K=17)

    status, out, err = utils.runscript('filter-abund.py',
                                       ['-q', counting_ht, infile],
                                       in_dir)

    assert len(err) == 0
    assert len(out) < 1000

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile


def test_filter_abund_1_singlefile_quiet():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    (status, out, err) = utils.runscript(
        'filter-abund-single.py',
        ['-q', '-x', '1e7', '-N', '2', '-k', '17', infile], in_dir)

    assert len(err) == 0
    assert len(out) < 1000

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile
