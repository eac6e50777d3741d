"""Label tests ported from the reference tests/test_labelhash.py."""

import pytest

from khmer_tpu import GraphLabels, Nodegraph
from khmer_tpu.io.fastx import FastxReader


def test_n_labels(ref_test_data):
    lh = GraphLabels.NodeGraphLabels(20, 1e7, 4)
    lh.consume_seqfile_and_tag_with_labels(ref_test_data + '/test-labels.fa')
    assert lh.n_labels == 4


def test_get_all_labels(ref_test_data):
    lb = GraphLabels.NodeGraphLabels(20, 1e7, 4)
    lb.consume_seqfile_and_tag_with_labels(ref_test_data + '/test-labels.fa')
    labels = list(lb.labels())
    expected = [0, 1, 2, 3]
    for e_label in expected:
        assert e_label in labels
    for a_label in labels:
        assert a_label in expected


def test_get_labels_save_load(ref_test_data, tmp_path):
    lb_pre = GraphLabels.NodeGraphLabels(20, 1e7, 4)
    lb_pre.consume_seqfile_and_tag_with_labels(
        ref_test_data + '/test-labels.fa')

    savepath = str(tmp_path / 'saved.labels')
    lb_pre.save_labels_and_tags(savepath)
    del lb_pre

    graph = Nodegraph(20, 1e7, 4)
    lb = GraphLabels.load(savepath, graph)

    labels = list(lb.labels())
    expected = [0, 1, 2, 3]
    for e_label in expected:
        assert e_label in labels
    for a_label in labels:
        assert a_label in expected


def test_get_labels_save_load_wrong_ksize(ref_test_data, tmp_path):
    lb_pre = GraphLabels.NodeGraphLabels(19, 1e7, 4)
    lb_pre.consume_seqfile_and_tag_with_labels(
        ref_test_data + '/test-labels.fa')

    savepath = str(tmp_path / 'saved.labels')
    lb_pre.save_labels_and_tags(savepath)
    del lb_pre

    lb = GraphLabels.NodeGraphLabels(20, 1e7, 4)
    with pytest.raises(OSError) as err:
        lb.load_labels_and_tags(savepath)
    assert "Incorrect k-mer size" in str(err.value)


def test_get_tag_labels(ref_test_data):
    lb = GraphLabels.NodeGraphLabels(20, 1e7, 4)
    lb.consume_seqfile_and_tag_with_labels(
        ref_test_data + '/single-read.fq')
    tag = 173473779682

    labels = list(lb.get_tag_labels(tag))
    assert len(labels) == 1
    assert labels.pop() == 0


def test_get_labels_for_sequence(ref_test_data):
    lb = GraphLabels.NodeGraphLabels(20, 1e7, 4)
    filename = ref_test_data + '/single-read.fq'
    lb.consume_seqfile_and_tag_with_labels(filename)

    seq = [r.sequence for r in FastxReader(filename)][0]
    labels = list(lb.get_labels_for_sequence(seq))

    tag = 173473779682
    labels2 = list(lb.get_tag_labels(tag))

    assert labels == labels2
    assert len(labels) == 1
    assert labels.pop() == 0


def test_link_tag_and_label():
    lb = GraphLabels.NodeGraphLabels(20, 1, 1)

    tag = 173473779682
    lb.add_tag(tag)
    lb.link_tag_and_label(tag, 1)

    labels = list(lb.get_tag_labels(tag))
    assert len(labels) == 1
    assert labels.pop() == 1


def test_link_tag_and_label_using_string():
    lb = GraphLabels.NodeGraphLabels(20, 1, 1)

    kmer = lb.graph.reverse_hash(173473779682)
    lb.add_tag(kmer)
    lb.link_tag_and_label(lb.graph.hash(kmer), 1)

    labels = list(lb.get_tag_labels(kmer))
    assert len(labels) == 1
    assert labels.pop() == 1


def test_sweep_tag_neighborhood(ref_test_data):
    lb = GraphLabels.NodeGraphLabels(20, 1e7, 4)
    lb.graph.consume_seqfile_and_tag(ref_test_data + '/single-read.fq')

    tags = lb.sweep_tag_neighborhood(
        'CAGGCGCCCACCACCGTGCCCTCCAACCTGATGGT')
    assert len(tags) == 1
    assert list(tags) == [173473779682]


def test_sweep_label_neighborhood(ref_test_data):
    lb = GraphLabels.NodeGraphLabels(20, 1e7, 4)
    lb.consume_seqfile_and_tag_with_labels(
        ref_test_data + '/single-read.fq')

    labels = list(lb.sweep_label_neighborhood(
        'CAGGCGCCCACCACCGTGCCCTCCAACCTGATGGT'))
    assert len(labels) == 1
    assert labels.pop() == 0


def test_label_tag_correctness(ref_test_data):
    # reads A <-> B <-> C overlap; D stands alone
    lb = GraphLabels.NodeGraphLabels(20, 1e7, 4)
    lb.consume_seqfile_and_tag_with_labels(
        ref_test_data + '/test-labels.fa')

    # read A
    labels = list(lb.sweep_label_neighborhood(
        'ATCGTGTAAGCTATCGTAATCGTAAGCTCTGCCTAGAGCTAGGCTAGGCTCTGCCTAGAG'
        'CTAGGCTAGGTGTGCTCTGCCTAGAGCTAGGCTAGGTGT'))
    assert len(labels) == 2
    assert 0 in labels
    assert 1 in labels

    # read B
    labels = list(lb.sweep_label_neighborhood(
        'GCGTAATCGTAAGCTCTGCCTAGAGCTAGGCTAGCTCTGCCTAGAGCTAGGCTAGGTGTTGGGG'
        'ATAGATAGATAGATGACCTAGAGCTAGGCTAGGTGTTGGGGATAGATAGATAGATGA'))
    assert len(labels) == 3
    assert 0 in labels
    assert 1 in labels
    assert 2 in labels

    # read C
    labels = list(lb.sweep_label_neighborhood(
        'TGGGATAGATAGATAGATGACCTAGAGCTAGGCTAGGTGTTGGGGATAGATAGATAGATGACC'
        'TAGAGCTAGGCTAGGTGTTGGGGATAGATAGATAGATGAGTTGGGGATAGATAGATAGATGAG'
        'TGTAGATCCAACAACACATACA'))
    assert len(labels) == 2
    assert 1 in labels
    assert 2 in labels

    # read D
    labels = list(lb.sweep_label_neighborhood(
        'TATATATATAGCTAGCTAGCTAACTAGCTAGCATCGATCGATCGATC'))
    assert len(labels) == 1
    assert 3 in labels
