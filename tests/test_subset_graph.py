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


# ---------------------------------------------------------------------------
# round 3: the rest of the reference file (merge orderings, pmap
# save/load matrix, abundance partitioning)
# ---------------------------------------------------------------------------

import os

import khmer_tpu as khmer
from khmer_tpu.partitioning import SubsetPartition

from . import khmer_tst_utils as utils


def test_random_20_a_succ_II():
    ht = khmer.Nodegraph(20, 4 ** 7 + 1, 2)
    filename = utils.get_test_data('random-20-a.fa')
    outfile = utils.get_temp_filename('out')

    total_reads, _ = ht.consume_seqfile_and_tag(filename)

    subset_size = total_reads // 2 + total_reads % 2
    divvy = list(ht.divide_tags_into_subsets(subset_size))
    assert len(divvy) == 4

    x = ht.do_subset_partition(divvy[0], divvy[2])
    y = ht.do_subset_partition(divvy[2], 0)
    ht.merge_subset(x)
    ht.merge_subset(y)

    n_partitions = ht.output_partitions(filename, outfile)
    assert n_partitions == 1, n_partitions


def test_random_20_a_succ_III():
    ht = khmer.Nodegraph(20, 4 ** 7 + 1, 2)
    filename = utils.get_test_data('random-20-a.fa')
    outfile = utils.get_temp_filename('out')

    total_reads, _ = ht.consume_seqfile_and_tag(filename)

    subset_size = total_reads // 2 + total_reads % 2
    divvy = list(ht.divide_tags_into_subsets(subset_size))
    assert len(divvy) == 4, len(divvy)

    x = ht.do_subset_partition(divvy[0], divvy[2])
    y = ht.do_subset_partition(divvy[2], 0)

    x._validate_partitionmap()
    y._validate_partitionmap()

    ht.merge_subset(y)
    ht.merge_subset(x)

    n_partitions = ht.output_partitions(filename, outfile)
    assert n_partitions == 1, n_partitions


def test_random_20_a_succ_IV():
    ht = khmer.Nodegraph(20, 4 ** 7 + 1, 2)
    filename = utils.get_test_data('random-20-a.fa')
    outfile = utils.get_temp_filename('out')

    ht.consume_seqfile_and_tag(filename)
    subsets = []

    divvy = list(ht.divide_tags_into_subsets(1))
    divvy.append(0)
    for i in range(len(divvy) - 1):
        x = ht.do_subset_partition(divvy[i], divvy[i + 1])
        subsets.append(x)

    for x in reversed(subsets):
        ht.merge_subset(x)

    n_partitions = ht.output_partitions(filename, outfile)
    assert n_partitions == 1, n_partitions


def test_random_20_a_succ_IV_save():
    ht = khmer.Nodegraph(20, 4 ** 7 + 1, 2)
    filename = utils.get_test_data('random-20-a.fa')

    savefile_ht = utils.get_temp_filename('ht')
    savefile_tags = utils.get_temp_filename('tags')
    outfile = utils.get_temp_filename('out')

    ht.consume_seqfile_and_tag(filename)

    ht.save(savefile_ht)
    ht.save_tagset(savefile_tags)

    del ht
    ht = khmer.Nodegraph.load(savefile_ht)
    ht.load_tagset(savefile_tags)

    divvy = list(ht.divide_tags_into_subsets(1))
    divvy.append(0)

    subsets = []
    for i in range(len(divvy) - 1):
        x = ht.do_subset_partition(divvy[i], divvy[i + 1])
        subsets.append(x)

    for x in reversed(subsets):
        ht.merge_subset(x)

    n_partitions = ht.output_partitions(filename, outfile)
    assert n_partitions == 1, n_partitions


class Test_SaveLoadPmap(object):

    def test_save_load_merge(self):
        ht = khmer.Nodegraph(20, 4 ** 4 + 1, 2)
        filename = utils.get_test_data('test-graph2.fa')

        (total_reads, _) = ht.consume_seqfile_and_tag(filename)
        assert total_reads == 3, total_reads

        divvy = list(ht.divide_tags_into_subsets(1))
        assert len(divvy) == 3
        (a, b, _) = divvy

        outfile1 = utils.get_temp_filename('x.pmap')
        outfile2 = utils.get_temp_filename('y.pmap')

        x = ht.do_subset_partition(a, b)
        x.save_partitionmap(outfile1)
        del x

        y = ht.do_subset_partition(b, 0)
        y.save_partitionmap(outfile2)
        del y

        a = SubsetPartition.load(outfile1, ht)
        b = SubsetPartition.load(outfile2, ht)

        ht.merge_subset(a)
        ht.merge_subset(b)

        outfile = utils.get_temp_filename('out.part')
        n_partitions = ht.output_partitions(filename, outfile)
        assert n_partitions == 1, n_partitions        # combined.

    def test_save_load_merge_truncate(self):
        ht = khmer.Nodegraph(20, 4 ** 4 + 1, 2)
        filename = utils.get_test_data('test-graph2.fa')

        (total_reads, _) = ht.consume_seqfile_and_tag(filename)
        assert total_reads == 3, total_reads

        divvy = list(ht.divide_tags_into_subsets(1))
        assert len(divvy) == 3
        (a, b, _) = divvy

        outfile1 = utils.get_temp_filename('x.pmap')
        outfile3 = utils.get_temp_filename('z.pmap')

        x = ht.do_subset_partition(a, b)
        x.save_partitionmap(outfile1)
        del x

        data = open(outfile1, 'rb').read()

        for i in range(len(data)):
            fp = open(outfile3, 'wb')
            fp.write(data[:i])
            fp.close()

            try:
                SubsetPartition.load(outfile3, ht)
                assert 0, "this should not pass"
            except OSError as err:
                print(str(err), i)

    def test_save_load_merge_2(self):
        ht = khmer.Nodegraph(20, 4 ** 8 + 1, 2)
        filename = utils.get_test_data('random-20-a.fa')

        (total_reads, _) = ht.consume_seqfile_and_tag(filename)

        subset_size = total_reads // 2 + total_reads % 2
        divvy = list(ht.divide_tags_into_subsets(subset_size))

        outfile1 = utils.get_temp_filename('x.pmap')
        outfile2 = utils.get_temp_filename('y.pmap')

        x = ht.do_subset_partition(divvy[0], divvy[1])
        x.save_partitionmap(outfile1)
        del x

        y = ht.do_subset_partition(divvy[1], 0)
        y.save_partitionmap(outfile2)
        del y

        assert os.path.exists(outfile1)
        assert os.path.exists(outfile2)
        a = SubsetPartition.load(outfile1, ht)
        b = SubsetPartition.load(outfile2, ht)

        ht.merge_subset(a)
        ht.merge_subset(b)

        outfile = utils.get_temp_filename('out.part')
        n_partitions = ht.output_partitions(filename, outfile)
        assert n_partitions == 1, n_partitions        # combined.

    def test_save_load_merge_nexist(self):
        ht = khmer.Nodegraph(20, 1, 1)
        try:
            ht.load_partitionmap('this does not exist')
            assert 0, "this should not succeed"
        except OSError as e:
            print(str(e))

    def test_save_merge_from_disk(self):
        ht = khmer.Nodegraph(20, 4 ** 4 + 1, 2)
        filename = utils.get_test_data('test-graph2.fa')

        (total_reads, _) = ht.consume_seqfile_and_tag(filename)
        assert total_reads == 3, total_reads

        divvy = list(ht.divide_tags_into_subsets(1))
        (a, b, _) = divvy

        outfile1 = utils.get_temp_filename('x.pmap')
        outfile2 = utils.get_temp_filename('y.pmap')

        x = ht.do_subset_partition(a, b)
        x.save_partitionmap(outfile1)
        del x

        y = ht.do_subset_partition(b, 0)
        y.save_partitionmap(outfile2)
        del y

        ht.merge_subset_from_disk(outfile1)
        ht.merge_subset_from_disk(outfile2)

        outfile = utils.get_temp_filename('out.part')
        n_partitions = ht.output_partitions(filename, outfile)
        assert n_partitions == 1, n_partitions        # combined.

    def test_save_merge_from_disk_2(self):
        ht = khmer.Nodegraph(20, 4 ** 7 + 1, 2)
        filename = utils.get_test_data('random-20-a.fa')

        (total_reads, _) = ht.consume_seqfile_and_tag(filename)

        subset_size = total_reads // 2 + total_reads % 2
        divvy = list(ht.divide_tags_into_subsets(subset_size))

        outfile1 = utils.get_temp_filename('x.pmap')
        outfile2 = utils.get_temp_filename('y.pmap')

        x = ht.do_subset_partition(divvy[0], divvy[1])
        x.save_partitionmap(outfile1)
        del x

        y = ht.do_subset_partition(divvy[1], 0)
        y.save_partitionmap(outfile2)
        del y

        assert os.path.exists(outfile1)
        assert os.path.exists(outfile2)
        ht.merge_subset_from_disk(outfile1)
        ht.merge_subset_from_disk(outfile2)

        outfile = utils.get_temp_filename('out.part')
        n_partitions = ht.output_partitions(filename, outfile)
        assert n_partitions == 1, n_partitions        # combined.

    def test_save_merge_from_disk_file_not_exist(self):
        ht = khmer.Nodegraph(20, 4 ** 4 + 1, 2)
        filename = utils.get_test_data('test-graph2.fa')

        (total_reads, _) = ht.consume_seqfile_and_tag(filename)
        assert total_reads == 3, total_reads

        outfile1 = utils.get_temp_filename('x.pmap')

        # fail to create file... => failure expected
        try:
            ht.merge_subset_from_disk(outfile1)
            assert 0, "this should fail"
        except OSError as e:
            print(str(e))

    def test_merge_from_disk_file_bad_type(self):
        ht = khmer.Nodegraph(20, 4 ** 4 + 1, 2)
        infile = utils.get_test_data('goodversion-k12.ht')

        try:
            ht.merge_subset_from_disk(infile)
            assert 0, "this should fail"
        except OSError as e:
            print(str(e))

    def test_merge_from_disk_file_version(self):
        ht = khmer.Nodegraph(20, 4 ** 4 + 1, 2)
        infile = utils.get_test_data('badversion-k12.ht')

        try:
            ht.merge_subset_from_disk(infile)
            assert 0, "this should fail"
        except OSError as e:
            print(str(e))

    def test_save_merge_from_disk_ksize(self):
        ht = khmer.Nodegraph(20, 4 ** 4 + 1, 2)
        filename = utils.get_test_data('test-graph2.fa')

        (total_reads, _) = ht.consume_seqfile_and_tag(filename)
        assert total_reads == 3, total_reads

        divvy = list(ht.divide_tags_into_subsets(1))
        (a, b, _) = divvy

        outfile1 = utils.get_temp_filename('x.pmap')
        x = ht.do_subset_partition(a, b)
        x.save_partitionmap(outfile1)
        del x

        ht = khmer.Nodegraph(19, 1, 1)
        try:
            ht.merge_subset_from_disk(outfile1)
            assert 0, "this should fail"
        except OSError as e:
            print(str(e))


def test_save_load_merge_on_graph():
    ht = khmer.Nodegraph(20, 4 ** 4 + 1, 2)
    filename = utils.get_test_data('test-graph2.fa')

    (total_reads, _) = ht.consume_seqfile_and_tag(filename)
    assert total_reads == 3, total_reads

    divvy = list(ht.divide_tags_into_subsets(1))
    assert len(divvy) == 3
    (a, b, _) = divvy

    outfile1 = utils.get_temp_filename('x.pmap')
    outfile2 = utils.get_temp_filename('y.pmap')

    x = ht.do_subset_partition(a, b)
    x.save_partitionmap(outfile1)
    del x

    y = ht.do_subset_partition(b, 0)
    y.save_partitionmap(outfile2)
    del y

    ht.load_partitionmap(outfile1)  # <-- this is different
    b = SubsetPartition.load(outfile2, ht)

    ht.merge_subset(b)

    outfile = utils.get_temp_filename('out.part')
    n_partitions = ht.output_partitions(filename, outfile)
    assert n_partitions == 1, n_partitions        # combined.


def test_save_load_on_graph_truncate():
    ht = khmer.Nodegraph(20, 4 ** 4 + 1, 2)
    filename = utils.get_test_data('test-graph2.fa')

    (total_reads, _) = ht.consume_seqfile_and_tag(filename)
    assert total_reads == 3, total_reads

    divvy = list(ht.divide_tags_into_subsets(1))
    assert len(divvy) == 3
    (a, b, _) = divvy

    outfile1 = utils.get_temp_filename('x.pmap')
    outfile3 = utils.get_temp_filename('z.pmap')

    x = ht.do_subset_partition(a, b)
    x.save_partitionmap(outfile1)
    del x

    data = open(outfile1, 'rb').read()

    for i in range(len(data)):
        fp = open(outfile3, 'wb')
        fp.write(data[:i])
        fp.close()

        try:
            ht.load_partitionmap(outfile3)
            assert 0, "this should not pass"
        except OSError as err:
            print(str(err), i)


first = (
    "CAGACTTGGAAGCTGAGAGTCCGACGTCACTGCCTCAACTCGCGCAAATGTTCCCGCCAA"
    "ATTGTATCCTAGGGATCTTCCATAAGCTTATATACGGGGGTTTCCAAGGCCCTGATGCCA"
    "GTGCCTAATCTTTTGGAGTCCTCTCAGGGCCACTAGATGCCATGCTACGCGTCCCAGGTT"
    "GGCCTGAGGGTCTACACGGAGTGGGAAGCATGGGTACCTTAGCGAACATTCATACTGGCC"
    "TGTTTATGCTTATCAGACTTCAGCTTCGCTTAGCGCGTCACCGTTTGTAACTTGTTATCT"
)

second = (
    "TGTTTATGCTTATCAGACTTCAGCTTCGCTTAGCGCGTCACCGTTTGTAACTTGTTATCT"
    "GACTGTAGACTTGAACCTCGATGGAATGCAGGTCCCATTCTCTGGCCTGACTCATGGAAC"
    "CGAGGCCAAAAAAGCATGGCACGAAGACGCTATGCGAGGGTGCTCGCCCATGTCGTCGCC"
    "GTACCACGACAGATTTATACAATGCGTTTCTACAGGCCCCATTGGGAACAAACAAAAAGT"
    "CCTCGGGCCTTTCCGTTCCGTTGCCGCCCAAGCTCTCTAGCATCGAATCGGTCAAGCGGT"
)


def test_partition_on_abundance_1():
    kh = khmer.Countgraph(20, 1e3, 4)
    for _ in range(10):
        kh.consume_and_tag(first)

    for _ in range(10):
        kh.consume_and_tag(second)

    # all paths in 'a' and 'b'
    p = kh.do_subset_partition_with_abundance(10, 50)
    x = p.count_partitions()
    assert x == (1, 0)                  # one partition, no remainders


def test_partition_on_abundance_2():
    kh = khmer.Countgraph(20, 1e3, 4)
    for _ in range(10):
        kh.consume_and_tag(first)

    for _ in range(5):
        kh.consume_and_tag(second)

    # all paths in 'a'
    p = kh.do_subset_partition_with_abundance(10, 50)
    x = p.count_partitions()
    assert x == (1, 6)                  # one partition, six disconnected


def test_partition_on_abundance_3():
    kh = khmer.Countgraph(20, 1e4, 4)
    for _ in range(10):
        kh.consume_and_tag(first)

    for _ in range(5):
        kh.consume_and_tag(second)

    # this will get paths only in 'a'
    p = kh.do_subset_partition_with_abundance(10, 50)

    # this will get paths only in 'b'
    p = kh.do_subset_partition_with_abundance(5, 10)

    x = p.count_partitions()
    assert x == (2, 2)                  # two partitions, two ignored tags
