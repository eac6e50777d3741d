"""Partitioning tests ported from the reference tests/test_subset_graph.py
(subset merge semantics, partition output, real-data partitions)."""

import khmer_tpu as khmer
from khmer_tpu.io.fastx import FastxReader


def _parts(outfile):
    return [r.name.rsplit('\t', 1)[1] for r in FastxReader(outfile)]


def test_3_merge_013(ref_test_data, tmp_path):
    ht = khmer.Nodegraph(20, 4 ** 4 + 1, 2)
    filename = ref_test_data + '/test-graph2.fa'

    total_reads, _ = ht.consume_seqfile_and_tag(filename)
    assert total_reads == 3, total_reads

    divvy = list(ht.divide_tags_into_subsets(1))
    assert len(divvy) == 3
    (a, b, _) = divvy

    x = ht.do_subset_partition(a, a)
    ht.merge_subset(x)

    y = ht.do_subset_partition(b, 0)
    ht.merge_subset(y)

    outfile = str(tmp_path / 'out')
    n_partitions = ht.output_partitions(filename, outfile)
    assert n_partitions == 1, n_partitions        # combined.


def test_3_merge_023(ref_test_data, tmp_path):
    ht = khmer.Nodegraph(20, 4 ** 4 + 1, 2)
    filename = ref_test_data + '/test-graph2.fa'

    total_reads, _ = ht.consume_seqfile_and_tag(filename)
    assert total_reads == 3, total_reads

    divvy = list(ht.divide_tags_into_subsets(1))
    assert len(divvy) == 3
    (a, b, c) = divvy

    x = ht.do_subset_partition(b, c)
    ht.merge_subset(x)

    y = ht.do_subset_partition(a, b)
    ht.merge_subset(y)

    outfile = str(tmp_path / 'out.part')
    n_partitions = ht.output_partitions(filename, outfile)
    assert n_partitions == 1, n_partitions


def test_5_merge_046(ref_test_data, tmp_path):
    ht = khmer.Nodegraph(20, 4 ** 4 + 1, 2)
    filename = ref_test_data + '/test-graph5.fa'

    total_reads, _ = ht.consume_seqfile_and_tag(filename)
    assert total_reads == 6, total_reads

    divvy = list(ht.divide_tags_into_subsets(1))

    x = ht.do_subset_partition(divvy[0], divvy[4])
    ht.merge_subset(x)

    y = ht.do_subset_partition(divvy[4], 0)
    ht.merge_subset(y)

    outfile = str(tmp_path / 'out.part')
    n_partitions = ht.output_partitions(filename, outfile)
    assert n_partitions == 1, n_partitions


def test_random_20_a_succ(ref_test_data, tmp_path):
    ht = khmer.Nodegraph(20, 4 ** 7 + 1, 2)
    filename = ref_test_data + '/random-20-a.fa'
    outfile = str(tmp_path / 'out')

    total_reads, _ = ht.consume_seqfile_and_tag(filename)

    subset_size = total_reads // 2 + total_reads % 2
    divvy = list(ht.divide_tags_into_subsets(subset_size))
    assert len(divvy) == 4

    x = ht.do_subset_partition(divvy[0], divvy[2])
    ht.merge_subset(x)
    y = ht.do_subset_partition(divvy[2], 0)
    ht.merge_subset(y)

    n_partitions = ht.output_partitions(filename, outfile)
    assert n_partitions == 1, n_partitions


def test_output_partitions(ref_test_data, tmp_path):
    filename = ref_test_data + '/test-output-partitions.fa'

    ht = khmer.Nodegraph(10, 1, 1)
    ht.set_partition_id('TTAGGACTGC', 2)
    ht.set_partition_id('TGCGTTTCAA', 3)
    ht.set_partition_id('ATACTGTAAA', 4)

    outfile = str(tmp_path / 'part')
    ht.output_partitions(filename, outfile)

    parts = _parts(outfile)
    assert parts[0] == '2'
    assert parts[1] == '3'
    assert parts[2] == '4'


def test_tiny_real_partitions(ref_test_data, tmp_path):
    filename = ref_test_data + '/real-partition-tiny.fa'

    ht = khmer.Nodegraph(32, 8e2, 4)
    ht.consume_seqfile_and_tag(filename)

    subset = ht.do_subset_partition(0, 0)
    ht.merge_subset(subset)

    outfile = str(tmp_path / 'part')
    ht.output_partitions(filename, outfile)

    parts = _parts(outfile)
    assert len(parts) == 2, len(parts)
    assert len(set(parts)) == 1
    assert set(parts) != set(['0'])


def test_small_real_partitions(ref_test_data, tmp_path):
    filename = ref_test_data + '/real-partition-small.fa'

    ht = khmer.Nodegraph(32, 2e3, 4)
    ht.consume_seqfile_and_tag(filename)

    subset = ht.do_subset_partition(0, 0)
    ht.merge_subset(subset)

    outfile = str(tmp_path / 'part')
    ht.output_partitions(filename, outfile)

    parts = _parts(outfile)
    assert len(parts) == 6, len(parts)
    assert len(set(parts)) == 1
    assert set(parts) != set(['0'])


FIRST = (
    "CAGACTTGGAAGCTGAGAGTCCGACGTCACTGCCTCAACTCGCGCAAATGTTCCCGCCAA"
    "ATTGTATCCTAGGGATCTTCCATAAGCTTATATACGGGGGTTTCCAAGGCCCTGATGCCA"
    "GTGCCTAATCTTTTGGAGTCCTCTCAGGGCCACTAGATGCCATGCTACGCGTCCCAGGTT"
    "GGCCTGAGGGTCTACACGGAGTGGGAAGCATGGGTACCTTAGCGAACATTCATACTGGCC"
    "TGTTTATGCTTATCAGACTTCAGCTTCGCTTAGCGCGTCACCGTTTGTAACTTGTTATCT")

SECOND = (
    "TGTTTATGCTTATCAGACTTCAGCTTCGCTTAGCGCGTCACCGTTTGTAACTTGTTATCT"
    "GACTGTAGACTTGAACCTCGATGGAATGCAGGTCCCATTCTCTGGCCTGACTCATGGAAC"
    "CGAGGCCAAAAAAGCATGGCACGAAGACGCTATGCGAGGGTGCTCGCCCATGTCGTCGCC"
    "GTACCACGACAGATTTATACAATGCGTTTCTACAGGCCCCATTGGGAACAAACAAAAAGT"
    "CCTCGGGCCTTTCCGTTCCGTTGCCGCCCAAGCTCTCTAGCATCGAATCGGTCAAGCGGT")


def test_partition_overlap_2(tmp_path):
    kh = khmer.Countgraph(20, 4e3, 4)
    for _ in range(10):
        kh.consume_and_tag(FIRST)

    for _ in range(10):
        kh.consume_and_tag(SECOND)

    # this should join them, since they overlap
    p = kh.do_subset_partition(0, 0)
    kh.merge_subset(p)

    n_partitions, n_unassigned = kh.count_partitions()
    assert n_partitions == 1, n_partitions
