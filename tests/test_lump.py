"""Partition 'lump' tests, ported from the reference
tests/test_lump.py: fakelump.fa is 3x1kb sequences sharing their last
79 bases; stop tags must break the lump apart."""

import os

import khmer_tpu as khmer

from .conftest import REF_TEST_DATA


def _data(name):
    return os.path.join(REF_TEST_DATA, name)


def test_fakelump_together():
    ht = khmer.Nodegraph(32, 1e5, 4)
    ht.consume_seqfile_and_tag(_data('fakelump.fa'))

    subset = ht.do_subset_partition(0, 0)
    ht.merge_subset(subset)

    (n_partitions, _) = ht.count_partitions()
    assert n_partitions == 1, n_partitions


def test_fakelump_stop():
    ht = khmer.Nodegraph(32, 1e5, 4)
    ht.consume_seqfile_and_tag(_data('fakelump.fa'))

    for line in open(_data('fakelump.fa.stoptags.txt')):
        ht.add_stop_tag(line.strip())

    subset = ht.do_subset_partition(0, 0, True)
    ht.merge_subset(subset)

    (n_partitions, _) = ht.count_partitions()
    assert n_partitions == 3, n_partitions


def test_fakelump_stop2():
    ht = khmer.Nodegraph(32, 1e5, 4)
    ht.consume_seqfile_and_tag(_data('fakelump.fa'))

    ht.add_stop_tag('GGGGAGGGGTGCAGTTGTGACTTGCTCGAGAG')

    subset = ht.do_subset_partition(0, 0, True)
    ht.merge_subset(subset)

    (n_partitions, _) = ht.count_partitions()
    assert n_partitions == 3, n_partitions


def test_fakelump_repartitioning(tmp_path):
    fakelump_fa = _data('fakelump.fa')
    fakelump_fa_foo = str(tmp_path / 'fakelump.fa.stopfoo')

    ht = khmer.Nodegraph(32, 1e5, 4)
    ht.consume_seqfile_and_tag(fakelump_fa)

    subset = ht.do_subset_partition(0, 0)
    ht.merge_subset(subset)

    (n_partitions, _) = ht.count_partitions()
    assert n_partitions == 1, n_partitions

    # break partitions on repeated k-mers seen on big excursions:
    # excursions 40 out that encounter more than 82 k-mers
    EXCURSION_DISTANCE = 40
    EXCURSION_KMER_THRESHOLD = 82
    EXCURSION_KMER_COUNT_THRESHOLD = 1
    counting = khmer.Countgraph(32, 1e5, 4)

    ht.repartition_largest_partition(counting,
                                     EXCURSION_DISTANCE,
                                     EXCURSION_KMER_THRESHOLD,
                                     EXCURSION_KMER_COUNT_THRESHOLD)

    ht.save_stop_tags(fakelump_fa_foo)

    # now re-do everything with these stop tags, specifically.
    ht = khmer.Nodegraph(32, 1e5, 4)
    ht.consume_seqfile_and_tag(fakelump_fa)
    ht.load_stop_tags(fakelump_fa_foo)

    subset = ht.do_subset_partition(0, 0, True)
    ht.merge_subset(subset)

    (n_partitions, _) = ht.count_partitions()
    assert n_partitions == 6, n_partitions


def test_fakelump_load_stop_tags_trunc(tmp_path):
    fakelump_fa = _data('fakelump.fa')
    fakelump_fa_foo = str(tmp_path / 'fakelump.fa.stopfoo')

    ht = khmer.Nodegraph(32, 1e5, 4)
    ht.consume_seqfile_and_tag(fakelump_fa)

    subset = ht.do_subset_partition(0, 0)
    ht.merge_subset(subset)

    (n_partitions, _) = ht.count_partitions()
    assert n_partitions == 1, n_partitions

    EXCURSION_DISTANCE = 40
    EXCURSION_KMER_THRESHOLD = 82
    EXCURSION_KMER_COUNT_THRESHOLD = 1
    counting = khmer.Countgraph(32, 1, 1, primes=[5, 7, 11, 13])

    ht.repartition_largest_partition(counting,
                                     EXCURSION_DISTANCE,
                                     EXCURSION_KMER_THRESHOLD,
                                     EXCURSION_KMER_COUNT_THRESHOLD)

    ht.save_stop_tags(fakelump_fa_foo)
    data = open(fakelump_fa_foo, 'rb').read()

    fp = open(fakelump_fa_foo, 'wb')
    fp.write(data[:10])
    fp.close()

    # now try loading these truncated stop tags; should fail.
    ht = khmer.Nodegraph(32, 1, 1, primes=[5, 7, 11, 13])
    ht.consume_seqfile_and_tag(fakelump_fa)

    try:
        ht.load_stop_tags(fakelump_fa_foo)
        assert 0, "this test should fail"
    except OSError:
        pass


def test_fakelump_load_stop_tags_notexist(tmp_path):
    fakelump_fa_foo = str(tmp_path / 'fakelump.fa.stopfoo')

    ht = khmer.Nodegraph(32, 1, 1, primes=[5, 7, 11, 13])

    try:
        ht.load_stop_tags(fakelump_fa_foo)
        assert 0, "this test should fail"
    except OSError:
        pass
