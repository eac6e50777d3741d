"""Cross-implementation file-format parity: load OXLI binaries that
were written by the REFERENCE khmer implementation (shipped in its
tests/test-data) — the real proof of byte-format compatibility."""

import os

import pytest

from khmer_tpu import Countgraph, Nodegraph
from khmer_tpu.io.oxli_format import OxliFileError

from .khmer_tst_utils import runscript


def td(ref_test_data, name):
    return os.path.join(ref_test_data, name)


def test_load_reference_written_countgraph(ref_test_data):
    # normC20k20.ct was produced by the reference's own
    # normalize-by-median --savegraph run
    ct = Countgraph.load(td(ref_test_data, "normC20k20.ct"))
    assert ct.ksize() == 20
    assert ct.n_tables() == 4
    assert ct.hashsizes()[0] == 999983
    # the fixture's header says occupied=0 (khmer-2.x wrote it that
    # way); honor the header but verify the table content is loaded
    assert ct.storage.raw_bytes().sum() > 0


def test_reference_countgraph_drives_diginorm(ref_test_data, tmp_path):
    # reference test_normalize_by_median_indent: load the reference-made
    # graph and normalize a paired file against it
    outfile = str(tmp_path / "out.keep")
    runscript("normalize-by-median.py",
              ["--loadgraph", td(ref_test_data, "normC20k20.ct"),
               "-o", outfile, td(ref_test_data, "paired-mixed.fa.pe")],
              str(tmp_path))
    assert os.path.exists(outfile)
    assert os.path.getsize(outfile) > 0


def test_load_reference_written_nodegraph(ref_test_data):
    ng = Nodegraph.load(td(ref_test_data, "goodversion-k12.ht"))
    assert ng.ksize() == 12
    ng2 = Nodegraph.load(td(ref_test_data, "goodversion-k12.ht.gz"))
    assert ng2.ksize() == 12
    assert ng.hashsizes() == ng2.hashsizes()


def test_counting_file_version_check(ref_test_data):
    # reference test_countgraph.py: bad version must raise OSError
    with pytest.raises(OSError):
        Countgraph.load(td(ref_test_data, "badversion-k12.ct"))


def test_counting_file_type_check(ref_test_data):
    # loading a nodegraph file as a countgraph must fail
    with pytest.raises(OSError):
        Countgraph.load(td(ref_test_data, "goodversion-k12.ht"))
    with pytest.raises(OSError):
        Countgraph.load(td(ref_test_data, "goodversion-k12.ht.gz"))


def test_load_reference_written_tagset(ref_test_data):
    ng = Nodegraph(32, 1e4, 2)
    ng.load_tagset(td(ref_test_data, "goodversion-k32.tagset"))
    assert ng.n_tags > 0


def test_load_reference_written_stoptags(ref_test_data):
    ng = Nodegraph(32, 1e4, 2)
    ng.load_stop_tags(td(ref_test_data, "goodversion-k32.stoptags"))
    assert len(ng.stop_tags) > 0


def test_bad_tagset_version(ref_test_data):
    ng = Nodegraph(32, 1e4, 2)
    with pytest.raises(OSError):
        ng.load_tagset(td(ref_test_data, "badversion-k32.tagset"))
    with pytest.raises(OSError):
        ng.load_stop_tags(td(ref_test_data, "badversion-k32.stoptags"))
