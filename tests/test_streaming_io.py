"""Streaming/pipe tests — shell pipelines over stdin/stdout, ported
from the reference tests/test_streaming_io.py (its Layer-4 strategy)."""

import difflib
import os
import subprocess

import pytest

from .khmer_tst_utils import SCRIPTS_DIR

ENV = dict(os.environ, KHMER_TPU_PLATFORM="cpu")


def run_shell_cmd(cmd, fail_ok=False, work_dir=None):
    p = subprocess.run(cmd, shell=True, capture_output=True, text=True,
                       cwd=work_dir, env=ENV, timeout=300)
    if p.returncode != 0 and not fail_ok:
        raise AssertionError(
            "command failed: %s\nstdout:%s\nstderr:%s" %
            (cmd, p.stdout, p.stderr))
    return p


def files_are_equal(a, b):
    return open(a).readlines() == open(b).readlines()


def diff_files(a, b):
    return "\n".join(difflib.context_diff(
        open(a).readlines(), open(b).readlines(), fromfile=a, tofile=b))


def test_interleave_split_1(ref_test_data, tmp_path):
    in1 = ref_test_data + '/paired.fq.1'
    in2 = ref_test_data + '/paired.fq.2'
    out1 = str(tmp_path / 'a.fa')
    out2 = str(tmp_path / 'b.fa')

    cmd = """
       python {scripts}/interleave-reads.py {in1} {in2} -o -       |
       python {scripts}/split-paired-reads.py -1 {out1} -2 {out2} -
    """.format(scripts=SCRIPTS_DIR, in1=in1, in2=in2, out1=out1,
               out2=out2)
    run_shell_cmd(cmd, work_dir=str(tmp_path))

    assert files_are_equal(in1, out1), diff_files(in1, out1)
    assert files_are_equal(in2, out2), diff_files(in2, out2)


def test_extract_paired_pe(ref_test_data, tmp_path):
    # stdin-fed extract-paired-reads equals the file-fed run
    infile = ref_test_data + '/paired-mixed.fa'
    out_pe1 = str(tmp_path / 'pe1.fa')
    out_pe2 = str(tmp_path / 'pe2.fa')

    run_shell_cmd(
        "python {s}/extract-paired-reads.py {i} -p {o} -s /dev/null"
        .format(s=SCRIPTS_DIR, i=infile, o=out_pe1),
        work_dir=str(tmp_path))
    run_shell_cmd(
        "cat {i} | python {s}/extract-paired-reads.py - -p {o} "
        "-s /dev/null".format(s=SCRIPTS_DIR, i=infile, o=out_pe2),
        work_dir=str(tmp_path))

    assert files_are_equal(out_pe1, out_pe2), diff_files(out_pe1, out_pe2)


def test_norm_by_median_streaming(ref_test_data, tmp_path):
    # streaming diginorm from stdin equals the file-based run
    infile = ref_test_data + '/test-abund-read-2.fa'
    out1 = str(tmp_path / 'a.keep')
    out2 = str(tmp_path / 'b.keep')

    run_shell_cmd(
        "python {s}/normalize-by-median.py -C 1 -k 17 -o {o} {i}"
        .format(s=SCRIPTS_DIR, i=infile, o=out1), work_dir=str(tmp_path))
    run_shell_cmd(
        "cat {i} | python {s}/normalize-by-median.py -C 1 -k 17 -o {o} -"
        .format(s=SCRIPTS_DIR, i=infile, o=out2), work_dir=str(tmp_path))

    assert files_are_equal(out1, out2), diff_files(out1, out2)


def test_fastq_to_fasta_pipe(ref_test_data, tmp_path):
    infile = ref_test_data + '/test-fastq-reads.fq'
    out = str(tmp_path / 'out.fa')
    run_shell_cmd(
        "python {s}/fastq-to-fasta.py {i} -o - > {o}"
        .format(s=SCRIPTS_DIR, i=infile, o=out), work_dir=str(tmp_path))
    data = open(out).read()
    assert data.startswith('>')
    assert data.count('>') == 100


def test_extract_long_sequences_pipe(ref_test_data, tmp_path):
    infile = ref_test_data + '/paired-mixed.fa'
    out = str(tmp_path / 'long.fa')
    run_shell_cmd(
        "python {s}/extract-long-sequences.py -l 10 {i} -o - > {o}"
        .format(s=SCRIPTS_DIR, i=infile, o=out), work_dir=str(tmp_path))
    assert open(out).read().count('>') > 0


def test_load_into_counting_stdin(ref_test_data, tmp_path):
    # counting from a pipe equals counting from the file
    infile = ref_test_data + '/test-abund-read-2.fa'
    ct1 = str(tmp_path / 'a.ct')
    ct2 = str(tmp_path / 'b.ct')
    run_shell_cmd(
        "python {s}/load-into-counting.py -k 17 -x 1e6 -N 2 {o} {i}"
        .format(s=SCRIPTS_DIR, i=infile, o=ct1), work_dir=str(tmp_path))
    run_shell_cmd(
        "cat {i} | python {s}/load-into-counting.py -k 17 -x 1e6 -N 2 "
        "{o} -".format(s=SCRIPTS_DIR, i=infile, o=ct2),
        work_dir=str(tmp_path))
    assert open(ct1, 'rb').read() == open(ct2, 'rb').read()
