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


# ---------------------------------------------------------------------------
# round 3: the rest of the reference file (label sweeps on CountGraph,
# save/load matrix, error paths)
# ---------------------------------------------------------------------------

import os

import khmer_tpu as khmer

from . import khmer_tst_utils as utils
from .khmer_tst_utils import screed_open

_READ_A = ('ATCGTGTAAGCTATCGTAATCGTAAGCTCTGCCTAGAGCTAGGCTAGGCTCTGCCTAGAG'
           'CTAGGCTAGGTGTGCTCTGCCTAGAGCTAGGCTAGGTGT')
_READ_B = ('GCGTAATCGTAAGCTCTGCCTAGAGCTAGGCTAGCTCTGCCTAGAGCTAGGCTAGGTGTT'
           'GGGGATAGATAGATAGATGACCTAGAGCTAGGCTAGGTGTTGGGGATAGATAGATAGATGA')
_READ_C = ('TGGGATAGATAGATAGATGACCTAGAGCTAGGCTAGGTGTTGGGGATAGATAGATAGATG'
           'ACCTAGAGCTAGGCTAGGTGTTGGGGATAGATAGATAGATGAGTTGGGGATAGATAGATA'
           'GATGAGTGTAGATCCAACAACACATACA')
_READ_D = 'TATATATATAGCTAGCTAGCTAACTAGCTAGCATCGATCGATCGATC'


@pytest.mark.huge
def test_toobig():
    try:
        GraphLabels.NodeGraphLabels(20, 1e13, 1)
        assert 0, "This should fail."
    except MemoryError as err:
        print(str(err))


def test_error_create():
    with pytest.raises((TypeError, ValueError)):
        GraphLabels.NodeGraphLabels(None, None, None)


def test_consume_sequence_and_tag_with_labels():
    lb = GraphLabels.NodeGraphLabels(20, 1e6, 4)
    label = 0
    sequence = 'ATGCATCGATCGATCGATCGATCGATCGATCGATCGATCG'

    lb.consume_sequence_and_tag_with_labels(sequence, label)
    labels = set()
    labels.update(lb.sweep_label_neighborhood(sequence))

    assert label in labels
    assert len(labels) == 1


def test_consume_sequence_and_tag_with_labels_2():
    lb = GraphLabels.NodeGraphLabels(20, 1e6, 4)
    label = 56                            # randomly chosen / non-zero
    sequence = 'ATGCATCGATCGATCGATCGATCGATCGATCGATCGATCG'

    lb.consume_sequence_and_tag_with_labels(sequence, label)
    labels = set()
    labels.update(lb.sweep_label_neighborhood(sequence))

    assert label in labels
    assert len(labels) == 1


def test_consume_seqfile_and_tag_with_labels():
    lb = GraphLabels.NodeGraphLabels(20, 1e7, 4)
    read_1 = 'ACGTAACCGGTTAAACCCGGGTTTAAAACCCCGGGGTTTT'
    filename = utils.get_test_data('test-transcript.fa')

    total_reads, _ = lb.consume_seqfile_and_tag_with_labels(filename)
    assert lb.graph.get(read_1[:20])
    assert total_reads == 3
    assert lb.n_labels == 3


def test_consume_partitioned_fasta_and_tag_with_labels():
    lb = GraphLabels.NodeGraphLabels(20, 1e7, 4)
    filename = utils.get_test_data('real-partition-small.fa')

    lb.consume_partitioned_fasta_and_tag_with_labels(filename)
    labels = set()
    for record in screed_open(filename):
        seq = record.sequence
        labels.update(lb.sweep_label_neighborhood(seq, 0, False, False))
    assert len(labels) == 1
    assert labels.pop() == 2
    assert lb.n_labels == 1


def test_counting_label_tag_correctness():
    lb = GraphLabels.CountGraphLabels(20, 1e7, 4)
    filename = utils.get_test_data('test-labels.fa')
    lb.consume_seqfile_and_tag_with_labels(filename)

    # read A
    labels = list(lb.sweep_label_neighborhood(_READ_A))
    assert len(labels) == 2
    assert 0 in labels
    assert 1 in labels

    # read B
    labels = list(lb.sweep_label_neighborhood(_READ_B))
    assert len(labels) == 3
    assert 0 in labels
    assert 1 in labels
    assert 2 in labels

    # read C
    labels = list(lb.sweep_label_neighborhood(_READ_C))
    assert len(labels) == 2
    assert 1 in labels
    assert 2 in labels

    # read D
    labels = list(lb.sweep_label_neighborhood(_READ_D))
    assert len(labels) == 1
    assert 3 in labels


def test_label_tag_correctness_save_load():
    lb_pre = GraphLabels.NodeGraphLabels(20, 1e7, 4)
    filename = utils.get_test_data('test-labels.fa')
    lb_pre.consume_seqfile_and_tag_with_labels(filename)

    # save labels to a file, trash the old GraphLabels, reload
    savepath = utils.get_temp_filename('saved.labels')
    lb_pre.save_labels_and_tags(savepath)
    del lb_pre

    lb = GraphLabels.NodeGraphLabels(20, 1e7, 4)
    lb.load_labels_and_tags(savepath)

    labels = list(lb.sweep_label_neighborhood(_READ_A))
    assert len(labels) == 2
    assert 0 in labels
    assert 1 in labels

    labels = list(lb.sweep_label_neighborhood(_READ_B))
    assert len(labels) == 3
    assert 0 in labels
    assert 1 in labels
    assert 2 in labels

    labels = list(lb.sweep_label_neighborhood(_READ_C))
    assert len(labels) == 2
    assert 1 in labels
    assert 2 in labels

    labels = list(lb.sweep_label_neighborhood(_READ_D))
    assert len(labels) == 1
    assert 3 in labels


def test_link_tag_and_label_using_string_2():
    lb = GraphLabels.NodeGraphLabels(20, 1, 1)

    tag = 173473779682
    kmer = lb.graph.reverse_hash(tag)
    lb.add_tag(kmer)
    lb.link_tag_and_label(kmer, 1)

    labels = list(lb.get_tag_labels(tag))    # use 'tag', not 'kmer'
    assert len(labels) == 1
    assert labels.pop() == 1


def test_load_wrong_filetype():
    lb = GraphLabels.NodeGraphLabels(20, 1e7, 4)

    # try to load a tagset
    filename = utils.get_test_data('goodversion-k32.tagset')
    with pytest.raises(OSError) as err:
        lb.load_labels_and_tags(filename)
    assert "Incorrect file format type" in str(err.value)

    # try to load a nonsense file
    filename = utils.get_test_data('all-A.fa')
    with pytest.raises(OSError) as err:
        lb.load_labels_and_tags(filename)
    assert "Incorrect file signature" in str(err.value)


def test_load_wrong_fileversion():
    lb = GraphLabels.NodeGraphLabels(20, 1e7, 4)

    filename = utils.get_test_data('badversion-k32.tagset')
    with pytest.raises(OSError) as err:
        lb.load_labels_and_tags(filename)
    assert "Incorrect file format version" in str(err.value)


def test_save_fail_readonly():
    if os.getuid() == 0:
        pytest.skip("running as root: readonly check is a no-op")
    lb_pre = GraphLabels.NodeGraphLabels(20, 1e7, 4)
    filename = utils.get_test_data('test-labels.fa')
    lb_pre.consume_seqfile_and_tag_with_labels(filename)

    savepath = utils.get_temp_filename('saved.labels')
    fp = open(savepath, 'w')
    fp.close()

    os.chmod(savepath, 0x444)

    with pytest.raises(OSError):
        lb_pre.save_labels_and_tags(savepath)


def test_save_load_corrupted():
    lb_pre = GraphLabels.NodeGraphLabels(20, 1e7, 4)
    filename = utils.get_test_data('test-labels.fa')
    lb_pre.consume_seqfile_and_tag_with_labels(filename)

    savepath = utils.get_temp_filename('saved.labels')
    lb_pre.save_labels_and_tags(savepath)
    del lb_pre

    lb = GraphLabels.NodeGraphLabels(20, 1e7, 4)

    # produce truncated versions of this file (sampled for speed)
    data = open(savepath, 'rb').read()
    truncated = utils.get_temp_filename('trunc.labels')
    for i in list(range(0, min(64, len(data)))) + \
            list(range(64, len(data), 23)):
        fp = open(truncated, 'wb')
        fp.write(data[:i])
        fp.close()

        with pytest.raises(OSError):
            lb.load_labels_and_tags(truncated)
