"""Script integration tests — golden expectations ported from the
reference tests/test_scripts.py and test_normalize_by_median.py,
run in-process against reference test-data."""

import gzip
import os
import shutil

import pytest

from .khmer_tst_utils import runscript


def fasta_seqs(path):
    seqs = []
    names = []
    cur = None
    for line in open(path):
        line = line.strip()
        if line.startswith(">") or line.startswith("@"):
            if line.startswith("@") and cur is not None and \
                    names and not seqs:
                pass
            names.append(line[1:])
            cur = ""
            seqs.append(cur)
        elif cur is not None and seqs and seqs[-1] == cur:
            seqs[-1] = line
            cur = None
    return names, seqs


def fastx_records(path):
    """Tiny fasta/fastq reader returning (names, seqs)."""
    from khmer_tpu.io.fastx import FastxReader

    names, seqs = [], []
    for r in FastxReader(path):
        names.append(r.name)
        seqs.append(r.sequence)
    return names, seqs


@pytest.fixture
def copy_test_data(tmp_path, ref_test_data):
    def _copy(name):
        src = os.path.join(ref_test_data, name)
        dst = tmp_path / name
        shutil.copyfile(src, dst)
        return str(dst)

    return _copy


def test_load_into_counting_info_json(tmp_path, ref_test_data):
    out = str(tmp_path / "out.ct")
    runscript("load-into-counting.py",
              ["-k", "20", "-x", "1e6", "-N", "4", "--summary-info",
               "json", out, ref_test_data + "/100-reads.fq.gz"])
    import json

    info = json.load(open(out + ".info.json"))
    assert info["num_kmers"] == 3855
    assert info["num_reads"] == 100


def test_normalize_by_median_paired_fq(copy_test_data, tmp_path):
    infile = copy_test_data("test-abund-read-paired.fq")
    runscript("normalize-by-median.py",
              ["-C", "20", "-p", "-k", "17", infile], str(tmp_path))
    names, seqs = fastx_records(infile + ".keep")
    assert len(seqs) == 6, seqs
    assert seqs[0].startswith("GGTTGACGGGGCTCAGGGGG"), seqs
    assert seqs[1].startswith("GGTTGACGGGGCTCAGGG"), seqs
    assert "895:1:37:17593:9954 1::FOO" in names, names
    assert "895:1:37:17593:9954 2::FOO" in names, names


def test_normalize_by_median_impaired(copy_test_data, tmp_path):
    infile = copy_test_data("test-abund-read-impaired.fa")
    status, _, err = runscript(
        "normalize-by-median.py", ["-C", "1", "-p", "-k", "17", infile],
        str(tmp_path), fail_ok=True)
    assert status != 0
    assert "ERROR: Unpaired reads " in err, err


def test_normalize_by_median_unpaired_and_paired(copy_test_data, tmp_path):
    # reference test: -u supplies an unpaired file alongside -p
    infile = copy_test_data("test-abund-read-paired.fq")
    unpaired = copy_test_data("random-20-a.fa")
    runscript("normalize-by-median.py",
              ["-C", "1", "-p", "-k", "17", "-u", unpaired, infile],
              str(tmp_path))
    assert os.path.exists(infile + ".keep")


def test_normalize_by_median_empty_file(tmp_path):
    empty = tmp_path / "empty.fa"
    empty.write_text("")
    status, _, err = runscript(
        "normalize-by-median.py", ["-k", "17", str(empty)],
        str(tmp_path), fail_ok=True)
    # reference logs 'SKIPPED empty file'
    assert "SKIPPED empty file" in err or status != 0


def test_filter_abund_single(copy_test_data, tmp_path):
    infile = copy_test_data("test-abund-read-2.fa")
    runscript("filter-abund-single.py",
              ["-k", "17", "-x", "1e7", "-N", "2", infile], str(tmp_path))
    _, seqs = fastx_records(infile + ".abundfilt")
    assert len(set(seqs)) == 1
    assert any(s.startswith("GGTTGACGGGGCTCAGGG") for s in seqs)


def test_abundance_dist_script(copy_test_data, tmp_path):
    infile = copy_test_data("test-abund-read-2.fa")
    ct = str(tmp_path / "x.ct")
    hist = str(tmp_path / "x.hist")
    runscript("load-into-counting.py",
              ["-k", "17", "-x", "1e7", "-N", "2", ct, infile],
              str(tmp_path))
    runscript("abundance-dist.py", ["-z", ct, infile, hist], str(tmp_path))
    with open(hist) as fp:
        assert fp.readline().strip() == \
            "abundance,count,cumulative,cumulative_fraction"
        # reference golden (test_scripts.py:2493-2496): 96 singleton
        # 17-mers plus 2 k-mers at bigcount abundance 1001
        assert fp.readline().strip() == "1,96,96,0.98"
        assert fp.readline().strip() == "1001,2,98,1.0"


def test_count_median_script(copy_test_data, tmp_path):
    infile = copy_test_data("test-abund-read-2.fa")
    ct = str(tmp_path / "x.ct")
    out = str(tmp_path / "meds.txt")
    runscript("load-into-counting.py",
              ["-k", "17", "-x", "1e7", "-N", "2", ct, infile],
              str(tmp_path))
    runscript("count-median.py", [ct, infile, out], str(tmp_path))
    lines = open(out).read().splitlines()
    assert lines[0] == "name,median,average,stddev,seqlen"
    assert len(lines) == 1002


def test_unique_kmers_report(copy_test_data, tmp_path):
    infile = copy_test_data("test-abund-read-2.fa")
    rpt = str(tmp_path / "rpt")
    _, _, err = runscript("unique-kmers.py",
                          ["-k", "17", "-R", rpt, infile], str(tmp_path))
    assert "Estimated number of unique 17-mers" in err
    assert os.path.exists(rpt)
