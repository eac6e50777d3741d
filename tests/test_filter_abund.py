"""filter-abund / filter-abund-single behavior (reference
expectations from tests/test_filter_abund.py, reorganized)."""

import os
from hashlib import md5

import pytest

from khmer_tpu.io.fastx import FastxReader

from . import khmer_tst_utils as utils

ABUND2 = 'test-abund-read-2.fa'
ABUND2_FQ = 'test-abund-read-2.fq'
ABUND2_CASAVA = 'test-abund-read-2.paired2.fq'
ABUND3 = 'test-abund-read-3.fa'
LOWSEQ = 'GGTTGACGGGGCTCAGGG'
TRIMMED_AT_ERROR = 'GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAGAGACAGC'
UNTRIMMED = ('GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAGAGACAGCgtgCCGCAGCTG'
             'TCGTCAGGGGATTTCCGGGCGG')


def _counting_for(infile, K=17):
    outfile = utils.get_temp_filename('out.ct')
    utils.runscript('load-into-counting.py',
                    ['-x', '1e7', '-N', '2', '-k', str(K), outfile,
                     infile])
    return outfile


def _seqs(path):
    try:
        return set(r.sequence for r in FastxReader(path))
    except OSError:
        return set()        # empty output (parser raises like reference)


def _names(path):
    return set(r.name for r in FastxReader(path))


def _run_filter(datafile, extra=(), single=False, single_extra=(),
                expect_fail=False):
    """Run filter-abund (building a countgraph first) or
    filter-abund-single over a copied data file; returns
    (abundfilt path, status, out, err)."""
    infile = utils.copy_test_data(datafile)
    in_dir = os.path.dirname(infile)
    if single:
        args = list(single_extra) + [infile]
        script = 'filter-abund-single.py'
    else:
        ct = _counting_for(infile)
        args = list(extra) + [ct, infile]
        script = 'filter-abund.py'
    status, out, err = utils.runscript(script, args, in_dir,
                                       fail_ok=expect_fail)
    return infile + '.abundfilt', status, out, err


def test_basic_two_pass():
    out, _, _, _ = _run_filter(ABUND2)
    seqs = _seqs(out)
    assert seqs == {LOWSEQ}


def test_cutoff_one_keeps_both():
    infile = utils.copy_test_data(ABUND2)
    in_dir = os.path.dirname(infile)
    ct = _counting_for(infile)
    utils.runscript('filter-abund.py', ['-C', '1', ct, infile, infile],
                    in_dir)
    seqs = _seqs(infile + '.abundfilt')
    assert len(seqs) == 2 and LOWSEQ in seqs


def test_stdin_needs_outfile():
    infile = utils.copy_test_data(ABUND2)
    ct = _counting_for(infile)
    status, _, err = utils.runscript('filter-abund.py',
                                     ['-C', '1', ct, '-'],
                                     os.path.dirname(infile),
                                     fail_ok=True)
    assert status == 1
    assert "Accepting input from stdin; output filename must be provided" \
        in str(err)


def test_gzip_output():
    infile = utils.copy_test_data(ABUND2)
    ct = _counting_for(infile)
    outfile = utils.get_temp_filename('out.fa.gz')
    status, _, _ = utils.runscript(
        'filter-abund.py',
        ['-C', '1', ct, infile, '-o', outfile, '--gzip'],
        os.path.dirname(infile), fail_ok=True)
    assert status == 0


def test_fastq_quality_retained():
    infile = utils.copy_test_data(ABUND2_FQ)
    in_dir = os.path.dirname(infile)
    ct = _counting_for(infile)
    utils.runscript('filter-abund.py', ['-C', '1', ct, infile, infile],
                    in_dir)
    out = infile + '.abundfilt'
    seqs = _seqs(out)
    assert len(seqs) == 2 and LOWSEQ in seqs
    quals = set(r.quality for r in FastxReader(out))
    assert '##################' in quals and len(quals) == 2


@pytest.mark.parametrize("single", [False, True])
def test_casava_18_names_parsed(single):
    out, _, _, _ = _run_filter(
        ABUND2_CASAVA, single=single,
        single_extra=('-x', '1e7', '-N', '2', '-k', '17'))
    assert 'pair:foo 1::N' in _names(out)


def test_singlefile_basic():
    out, _, _, err = _run_filter(
        ABUND2, single=True,
        single_extra=('-x', '1e7', '-N', '2', '-k', '17'))
    assert 'Total number of unique k-mers: 98' in err, err
    assert _seqs(out) == {LOWSEQ}


def test_singlefile_long_k_murmur():
    out, _, _, err = _run_filter(
        ABUND2, single=True,
        single_extra=('-x', '1e7', '-N', '2', '-k', '35', '-H',
                      'murmur'))
    assert 'Total number of unique k-mers: 80' in err, err
    assert _seqs(out) == set()


def test_singlefile_long_k_savegraph_refused():
    _, status, _, err = _run_filter(
        ABUND2, single=True, expect_fail=True,
        single_extra=('-x', '1e7', '-N', '2', '-k', '35', '-H',
                      'murmur', '--savegraph', 'foo'))
    assert status == 1
    assert 'ERROR: cannot save different hash functions yet.' in err


def test_singlefile_savegraph():
    infile = utils.copy_test_data(ABUND2)
    tabfile = utils.get_temp_filename('saved.ct')
    _, _, err = utils.runscript(
        'filter-abund-single.py',
        ['-x', '1e7', '-N', '2', '-k', '17', '--savegraph', tabfile,
         infile], os.path.dirname(infile))
    assert 'Total number of unique k-mers: 98' in err, err
    assert _seqs(infile + '.abundfilt') == {LOWSEQ}


@pytest.mark.parametrize("single", [False, True])
def test_variable_coverage_retains_low_abund(single):
    out, _, _, _ = _run_filter(ABUND2, extra=('-V',), single=single,
                               single_extra=('-k', '17', '-V'))
    seqs = _seqs(out)
    assert len(seqs) == 2 and LOWSEQ in seqs


@pytest.mark.parametrize("single", [False, True])
def test_variable_coverage_trims_high_abund(single):
    out, _, _, _ = _run_filter(ABUND3, extra=('-V',), single=single,
                               single_extra=('-k', '17', '-V'))
    seqs = _seqs(out)
    assert len(seqs) == 2
    assert TRIMMED_AT_ERROR in seqs


def test_high_Z_suppresses_trimming():
    infile = utils.copy_test_data(ABUND3)
    in_dir = os.path.dirname(infile)
    ct = _counting_for(infile)
    for script, args in (('filter-abund.py',
                          ['-V', '-Z', '25', ct, infile]),
                         ('filter-abund-single.py',
                          ['-k', '17', '-V', '-Z', '25', infile])):
        utils.runscript(script, args, in_dir)
        seqs = _seqs(infile + '.abundfilt')
        assert len(seqs) == 2
        assert UNTRIMMED in seqs    # untrimmed because -Z 25


@pytest.mark.parametrize("single", [False, True])
def test_N_containing_reads_retained(single):
    out, _, _, _ = _run_filter(
        'test-filter-abund-Ns.fq', extra=('-C', '3'), single=single,
        single_extra=('-k', '17', '-x', '1e7', '-N', '2', '-C', '3'))

    assert '895:1:37:17593:9954 1::FOO_withN' in _names(out)
    seqs = _seqs(out)
    # the N was counted as an A...
    assert 'GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAG' not in seqs
    # ...but stays an N in the output
    assert any('N' in s for s in seqs)


def test_output_md5_golden():
    infile = utils.get_test_data('paired-mixed-witherror.fa.pe')
    outfile = utils.get_temp_filename('out.abundfilt')
    utils.runscript('filter-abund-single.py', ['-o', outfile, infile])
    m = md5(open(outfile, 'rb').read()).hexdigest()
    assert m == 'f17122f4c0c3dc0bcc4eeb375de93040', m


@pytest.mark.parametrize("single", [False, True])
def test_quiet_mode(single):
    out, _, stdout, err = _run_filter(
        ABUND2, extra=('-q',), single=single,
        single_extra=('-q', '-x', '1e7', '-N', '2', '-k', '17'))
    assert len(err) == 0
    assert len(stdout) < 1000
    assert os.path.exists(out)


# -- round 3: the reference's test_filter_abund.py cases under their
# original names/shapes (the reorganized tests above cover the same
# behaviors; these keep the one-to-one suite mapping).

from .test_scripts import _make_counting  # noqa: E402
from .khmer_tst_utils import screed_open  # noqa: E402


def test_filter_abund_1():
    script = 'filter-abund.py'

    infile = utils.copy_test_data('test-abund-read-2.fa')
    n_infile = utils.copy_test_data('test-fastq-n-reads.fq')

    in_dir = os.path.dirname(infile)
    n_in_dir = os.path.dirname(n_infile)

    counting_ht = _make_counting(infile, K=17)
    n_counting_ht = _make_counting(n_infile, K=17)

    args = [counting_ht, infile]
    utils.runscript(script, args, in_dir)

    outfile = infile + '.abundfilt'
    n_outfile = n_infile + '.abundfilt'
    n_outfile2 = n_infile + '2.abundfilt'

    assert os.path.exists(outfile), outfile

    seqs = set([r.sequence for r in screed_open(outfile)])

    assert len(seqs) == 1, seqs
    assert 'GGTTGACGGGGCTCAGGG' in seqs

    args = [n_counting_ht, n_infile]
    utils.runscript(script, args, n_in_dir)

    assert os.path.exists(n_outfile), n_outfile

    args = [n_counting_ht, n_infile, '-o', n_outfile2]
    utils.runscript(script, args, in_dir)
    assert os.path.exists(n_outfile2), n_outfile2


def test_filter_abund_2():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    counting_ht = _make_counting(infile, K=17)

    script = 'filter-abund.py'
    args = ['-C', '1', counting_ht, infile, infile]
    utils.runscript(script, args, in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = set([r.sequence for r in screed_open(outfile)])
    assert len(seqs) == 2, seqs
    assert 'GGTTGACGGGGCTCAGGG' in seqs


def test_filter_abund_2_stdin():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    counting_ht = _make_counting(infile, K=17)

    script = 'filter-abund.py'
    args = ['-C', '1', counting_ht, '-']
    (status, out, err) = utils.runscript(script, args, in_dir, fail_ok=True)
    assert status == 1
    assert "Accepting input from stdin; output filename must be provided" \
           in str(err)


def test_filter_abund_2_stdin_gzip_out():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)
    outfile = utils.get_temp_filename('out.fa.gz')

    counting_ht = _make_counting(infile, K=17)

    script = 'filter-abund.py'
    args = ['-C', '1', counting_ht, infile, '-o', outfile, '--gzip']
    (status, out, err) = utils.runscript(script, args, in_dir, fail_ok=True)
    assert status == 0


def test_filter_abund_3_fq_retained():
    infile = utils.copy_test_data('test-abund-read-2.fq')
    in_dir = os.path.dirname(infile)

    counting_ht = _make_counting(infile, K=17)

    script = 'filter-abund.py'
    args = ['-C', '1', counting_ht, infile, infile]
    utils.runscript(script, args, in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = set([r.sequence for r in screed_open(outfile)])
    assert len(seqs) == 2, seqs
    assert 'GGTTGACGGGGCTCAGGG' in seqs

    # check for 'quality' string.
    quals = set([r.quality for r in screed_open(outfile)])
    assert len(quals) == 2, quals
    assert '##################' in quals


def test_filter_abund_4_fq_casava_18():
    infile = utils.copy_test_data('test-abund-read-2.paired2.fq')
    in_dir = os.path.dirname(infile)

    counting_ht = _make_counting(infile, K=17)

    script = 'filter-abund.py'
    args = [counting_ht, infile, infile]
    utils.runscript(script, args, in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = set([r.name for r in screed_open(outfile)])
    assert 'pair:foo 1::N' in seqs, seqs


def test_filter_abund_1_singlefile():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    script = 'filter-abund-single.py'
    args = ['-x', '1e7', '-N', '2', '-k', '17', infile]
    (status, out, err) = utils.runscript(script, args, in_dir)

    assert 'Total number of unique k-mers: 98' in err, err

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = set([r.sequence for r in screed_open(outfile)])
    assert len(seqs) == 1, seqs
    assert 'GGTTGACGGGGCTCAGGG' in seqs


def test_filter_abund_1_singlefile_long_k():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    script = 'filter-abund-single.py'
    args = ['-x', '1e7', '-N', '2', '-k', '35', '-H', 'murmur', infile]
    (status, out, err) = utils.runscript(script, args, in_dir)

    assert 'Total number of unique k-mers: 80' in err, err

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = set([r.sequence for r in screed_open(outfile)])
    assert len(seqs) == 0


def test_filter_abund_1_singlefile_long_k_nosave():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    script = 'filter-abund-single.py'
    args = ['-x', '1e7', '-N', '2', '-k', '35', '-H', 'murmur', infile,
            '--savegraph', 'foo']
    (status, out, err) = utils.runscript(script, args, in_dir, fail_ok=True)

    assert status == 1
    assert 'ERROR: cannot save different hash functions yet.' in err


def test_filter_abund_2_singlefile():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)
    tabfile = utils.get_temp_filename('test-savegraph.ct')

    script = 'filter-abund-single.py'
    args = ['-x', '1e7', '-N', '2', '-k', '17', '--savegraph',
            tabfile, infile]
    (status, out, err) = utils.runscript(script, args, in_dir)

    assert 'Total number of unique k-mers: 98' in err, err

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = set([r.sequence for r in screed_open(outfile)])
    assert len(seqs) == 1, seqs
    assert 'GGTTGACGGGGCTCAGGG' in seqs


def test_filter_abund_2_singlefile_fq_casava_18():
    infile = utils.copy_test_data('test-abund-read-2.paired2.fq')
    in_dir = os.path.dirname(infile)

    script = 'filter-abund-single.py'
    args = ['-x', '1e7', '-N', '2', '-k', '17', infile]
    (status, out, err) = utils.runscript(script, args, in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = set([r.name for r in screed_open(outfile)])
    assert 'pair:foo 1::N' in seqs, seqs


def test_filter_abund_4_retain_low_abund():
    # -V does not trim sequences that are low abundance
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    counting_ht = _make_counting(infile, K=17)

    script, args = ('filter-abund.py', ['-V', counting_ht, infile])
    utils.runscript(script, args, in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = set([r.sequence for r in screed_open(outfile)])
    assert len(seqs) == 2, seqs
    assert 'GGTTGACGGGGCTCAGGG' in seqs


def test_filter_abund_single_4_retain_low_abund():
    # -V does not trim sequences that are low abundance
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    script, args = ('filter-abund-single.py', ['-k', '17', '-V', infile])
    utils.runscript(script, args, in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = set([r.sequence for r in screed_open(outfile)])
    assert len(seqs) == 2, seqs
    assert 'GGTTGACGGGGCTCAGGG' in seqs


def test_filter_abund_5_trim_high_abund():
    # -V *does* trim sequences that are high abundance
    infile = utils.copy_test_data('test-abund-read-3.fa')
    in_dir = os.path.dirname(infile)

    counting_ht = _make_counting(infile, K=17)

    script, args = ('filter-abund.py', ['-V', counting_ht, infile])
    utils.runscript(script, args, in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = set([r.sequence for r in screed_open(outfile)])
    assert len(seqs) == 2, seqs

    # trimmed sequence @ error
    assert 'GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAGAGACAGC' in seqs


def test_filter_abund_single_trim_high_abund():
    # -V *does* trim sequences that are high abundance
    infile = utils.copy_test_data('test-abund-read-3.fa')
    in_dir = os.path.dirname(infile)

    script, args = ('filter-abund-single.py', ['-k', '17', '-V', infile])
    utils.runscript(script, args, in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    seqs = set([r.sequence for r in screed_open(outfile)])
    assert len(seqs) == 2, seqs

    # trimmed sequence @ error
    assert 'GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAGAGACAGC' in seqs


def test_filter_abund_6_trim_high_abund_Z():
    # -V/-Z interact: no trimming when -Z is set high enough
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

        seqs = set([r.sequence for r in screed_open(outfile)])
        assert len(seqs) == 2, seqs

        # untrimmed seq.
        badseq = 'GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAGAGACAGCgtgCCGCAGCTG' \
                 'TCGTCAGGGGATTTCCGGGCGG'
        assert badseq in seqs       # should be there, untrimmed


def test_filter_abund_7_retain_Ns():
    # filter-abund retains sequences with Ns, treating them as As
    infile = utils.copy_test_data('test-filter-abund-Ns.fq')
    in_dir = os.path.dirname(infile)

    counting_ht = _make_counting(infile, K=17)

    script = 'filter-abund.py'
    args = ['-C', '3', counting_ht, infile]
    utils.runscript(script, args, in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    names = set([r.name for r in screed_open(outfile)])
    assert '895:1:37:17593:9954 1::FOO_withN' in names, names

    # the 'N' counts as an 'A'...
    seqs = set([r.sequence for r in screed_open(outfile)])
    assert 'GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAG' not in seqs, seqs

    # ...and an 'N' remains in the output sequences
    found_N = False
    for s in seqs:
        if 'N' in s:
            found_N = True
    assert found_N, seqs


def test_filter_abund_single_8_retain_Ns():
    # filter-abund-single retains sequences with Ns, treating them as As
    infile = utils.copy_test_data('test-filter-abund-Ns.fq')
    in_dir = os.path.dirname(infile)

    script = 'filter-abund-single.py'
    args = ['-k', '17', '-x', '1e7', '-N', '2', '-C', '3', infile]
    utils.runscript(script, args, in_dir)

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile

    names = set([r.name for r in screed_open(outfile)])
    assert '895:1:37:17593:9954 1::FOO_withN' in names, names

    seqs = set([r.sequence for r in screed_open(outfile)])
    assert 'GGTTGACGGGGCTCAGGGGGCGGCTGACTCCGAG' not in seqs, seqs

    found_N = False
    for s in seqs:
        if 'N' in s:
            found_N = True
    assert found_N, seqs


def test_outfile():
    infile = utils.get_test_data('paired-mixed-witherror.fa.pe')
    outfile = utils.get_temp_filename('paired-mixed-witherror.fa.pe.abundfilt')
    script = 'filter-abund-single.py'
    args = ['-o', outfile, infile]
    (status, out, err) = utils.runscript(script, args)
    md5hash = utils._calc_md5(open(outfile, 'rb'))
    assert md5hash == 'f17122f4c0c3dc0bcc4eeb375de93040', md5hash


def test_filter_abund_1_quiet():
    script = 'filter-abund.py'

    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    counting_ht = _make_counting(infile, K=17)

    args = ['-q', counting_ht, infile]
    status, out, err = utils.runscript(script, args, in_dir)

    assert len(err) == 0
    assert len(out) < 1000

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile


def test_filter_abund_1_singlefile_quiet():
    infile = utils.copy_test_data('test-abund-read-2.fa')
    in_dir = os.path.dirname(infile)

    script = 'filter-abund-single.py'
    args = ['-q', '-x', '1e7', '-N', '2', '-k', '17', infile]
    (status, out, err) = utils.runscript(script, args, in_dir)

    assert len(err) == 0
    assert len(out) < 1000

    outfile = infile + '.abundfilt'
    assert os.path.exists(outfile), outfile
