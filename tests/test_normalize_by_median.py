"""Diginorm behavior tests — ported from the reference
tests/test_normalize_by_median.py (pairing semantics, cutoffs, goldens,
savegraph round trip)."""

import os
import shutil

import pytest

from .khmer_tst_utils import runscript


@pytest.fixture
def copy_test_data(tmp_path, ref_test_data):
    def _copy(name):
        dst = tmp_path / name
        shutil.copyfile(os.path.join(ref_test_data, name), dst)
        return str(dst)

    return _copy


def records(path):
    from khmer_tpu.io.fastx import FastxReader

    try:
        return list(FastxReader(path))
    except OSError:
        # empty output file: the parser raises like the reference's
        # ReadParser ("does not contain any sequences!")
        return []


def test_normalize_by_median_2(copy_test_data, tmp_path):
    infile = copy_test_data('test-abund-read-2.fa')
    runscript('normalize-by-median.py',
              ['-C', '2', '-k', '17', infile], str(tmp_path))
    seqs = [r.sequence for r in records(infile + '.keep')]
    assert len(seqs) == 2, seqs
    assert seqs[0].startswith('GGTTGACGGGGCTCAGGGGG'), seqs
    assert seqs[1] == 'GGTTGACGGGGCTCAGGG', seqs


def test_normalize_by_median_paired(copy_test_data, tmp_path):
    infile = copy_test_data('test-abund-read-paired.fa')
    runscript('normalize-by-median.py',
              ['-C', '1', '-p', '-k', '17', infile], str(tmp_path))
    seqs = [r.sequence for r in records(infile + '.keep')]
    assert len(seqs) == 2, seqs
    assert seqs[0].startswith('GGTTGACGGGGCTCAGGGGG'), seqs
    assert seqs[1].startswith('GGTTGACGGGGCTCAGGG'), seqs


def test_normalize_by_median_unpaired_final_read(copy_test_data, tmp_path):
    infile = copy_test_data('single-read.fq')
    status, _, err = runscript(
        'normalize-by-median.py', ['-C', '1', '-k', '17', '-p', infile],
        str(tmp_path), fail_ok=True)
    assert status != 0
    assert "ERROR: Unpaired reads when require_paired" in err, err


def test_normalize_by_median_force_single(copy_test_data, tmp_path):
    # --force_single treats all reads as unpaired
    infile = copy_test_data('test-abund-read-paired.fa')
    runscript('normalize-by-median.py',
              ['-C', '1', '--force_single', '-k', '17', infile],
              str(tmp_path))
    seqs = [r.sequence for r in records(infile + '.keep')]
    # the pair shares its median k-mer profile, so only one is kept
    assert len(seqs) == 1, seqs


def test_normalize_by_median_savegraph_roundtrip(copy_test_data, tmp_path):
    infile = copy_test_data('test-abund-read-2.fa')
    table = str(tmp_path / 'save.ct')
    runscript('normalize-by-median.py',
              ['-C', '1', '-k', '17', '-s', table, infile], str(tmp_path))
    assert os.path.exists(table)
    # reload it for a second run
    _, _, err = runscript(
        'normalize-by-median.py',
        ['-C', '1', '-k', '17', '--loadgraph', table, '-o',
         str(tmp_path / 'second.keep'), infile], str(tmp_path))
    # everything is already at coverage in the loaded graph
    assert len(records(str(tmp_path / 'second.keep'))) == 0


def test_diginorm_basic_functionality_1(copy_test_data, tmp_path):
    # all pairs kept with -p -C 1 (pair retention)
    infile = copy_test_data('dn-test-all-paired-all-keep.fa')
    runscript('normalize-by-median.py',
              ['-C', '1', '-p', '-k', '15', infile], str(tmp_path))
    seqs = set(r.name for r in records(infile + '.keep'))
    assert seqs == set(['a/1', 'a/2', 'b/1', 'b/2',
                        'c/1', 'c/2', 'd/1', 'd/2']), seqs


def test_diginorm_basic_functionality_2(copy_test_data, tmp_path):
    # --force_single: only one copy of the multicopy sequence survives
    infile = copy_test_data('dn-test-all-paired-all-keep.fa')
    runscript('normalize-by-median.py',
              ['-C', '1', '--force_single', '-k', '15', infile],
              str(tmp_path))
    seqs = set(r.name for r in records(infile + '.keep'))
    assert seqs == set(['a/1', 'a/2', 'b/2', 'c/1', 'd/2']), seqs


def test_diginorm_basic_functionality_3(copy_test_data, tmp_path):
    infile = copy_test_data('dn-test-none-paired.fa')
    runscript('normalize-by-median.py',
              ['-C', '1', '-k', '15', infile], str(tmp_path))
    seqs = set(r.name for r in records(infile + '.keep'))
    assert seqs == set(['a/1', 'b/2', 'd/1']), seqs


def test_diginorm_basic_functionality_4(copy_test_data, tmp_path):
    infile = copy_test_data('dn-test-some-paired-all-keep.fa')
    runscript('normalize-by-median.py',
              ['-C', '1', '-k', '15', infile], str(tmp_path))
    seqs = set(r.name for r in records(infile + '.keep'))
    assert seqs == set(['a/1', 'a/2', 'b/2', 'c/1', 'c/2', 'd/2']), seqs


def test_normalize_by_median_stdin_no_out(tmp_path):
    # stdin input requires an explicit -o (reference
    # test_normalize_by_median_stdin_no_out)
    status, _, err = runscript(
        'normalize-by-median.py', ['-C', '1', '-k', '17', '-'],
        str(tmp_path), fail_ok=True)
    assert status != 0
    assert "output filename must be provided" in err, err
