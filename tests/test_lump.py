"""Stop-tag partition-splitting over the fakelump data (reference
expectations from tests/test_lump.py; fakelump.fa = 3x1kb sequences
sharing their last 79 bases)."""

import os

import pytest

import khmer_tpu as khmer

from .conftest import REF_TEST_DATA

FAKELUMP = os.path.join(REF_TEST_DATA, 'fakelump.fa')
STOPTXT = os.path.join(REF_TEST_DATA, 'fakelump.fa.stoptags.txt')


def _tagged_graph(size=1e5, n_tables=4, primes=None):
    if primes is not None:
        ht = khmer.Nodegraph(32, 1, 1, primes=primes)
    else:
        ht = khmer.Nodegraph(32, size, n_tables)
    ht.consume_seqfile_and_tag(FAKELUMP)
    return ht


def _partition_count(ht, break_on_stops=False):
    subset = ht.do_subset_partition(0, 0, break_on_stops)
    ht.merge_subset(subset)
    return ht.count_partitions()[0]


def test_one_lump_without_stoptags():
    assert _partition_count(_tagged_graph()) == 1


@pytest.mark.parametrize("stop_source", ["file", "single"])
def test_stoptags_split_the_lump(stop_source):
    ht = _tagged_graph()
    if stop_source == "file":
        for line in open(STOPTXT):
            ht.add_stop_tag(line.strip())
    else:
        ht.add_stop_tag('GGGGAGGGGTGCAGTTGTGACTTGCTCGAGAG')

    assert _partition_count(ht, break_on_stops=True) == 3


def _repartition_and_save_stoptags(ht, counting, outfile):
    # break partitions on repeated k-mers seen on big excursions
    # (excursions 40 out encountering > 82 k-mers)
    ht.repartition_largest_partition(counting, 40, 82, 1)
    ht.save_stop_tags(outfile)


def test_repartitioning_splits_into_six(tmp_path):
    stopfile = str(tmp_path / 'fakelump.stoptags')

    ht = _tagged_graph()
    assert _partition_count(ht) == 1

    _repartition_and_save_stoptags(ht, khmer.Countgraph(32, 1e5, 4),
                                   stopfile)

    # re-run with the discovered stop tags: the lump breaks apart
    ht = _tagged_graph()
    ht.load_stop_tags(stopfile)
    assert _partition_count(ht, break_on_stops=True) == 6


def test_truncated_stoptags_fail_to_load(tmp_path):
    stopfile = str(tmp_path / 'fakelump.stoptags')

    ht = _tagged_graph()
    assert _partition_count(ht) == 1

    _repartition_and_save_stoptags(
        ht, khmer.Countgraph(32, 1, 1, primes=[5, 7, 11, 13]), stopfile)

    data = open(stopfile, 'rb').read()
    with open(stopfile, 'wb') as fp:
        fp.write(data[:10])

    ht = _tagged_graph(primes=[5, 7, 11, 13])
    with pytest.raises(OSError):
        ht.load_stop_tags(stopfile)


def test_missing_stoptags_fail_to_load(tmp_path):
    ht = khmer.Nodegraph(32, 1, 1, primes=[5, 7, 11, 13])
    with pytest.raises(OSError):
        ht.load_stop_tags(str(tmp_path / 'nonexistent.stoptags'))


# -- round 3: the reference's test_lump.py cases under their original
# names/shapes.

from . import khmer_tst_utils as utils  # noqa: E402


def test_fakelump_together():
    fakelump_fa = utils.get_test_data('fakelump.fa')

    ht = khmer.Nodegraph(32, 1e5, 4)
    ht.consume_seqfile_and_tag(fakelump_fa)

    subset = ht.do_subset_partition(0, 0)
    ht.merge_subset(subset)

    (n_partitions, _) = ht.count_partitions()
    assert n_partitions == 1, n_partitions


def test_fakelump_stop():
    fakelump_fa = utils.get_test_data('fakelump.fa')
    fakelump_stoptags_txt = utils.get_test_data('fakelump.fa.stoptags.txt')

    ht = khmer.Nodegraph(32, 1e5, 4)
    ht.consume_seqfile_and_tag(fakelump_fa)

    for line in open(fakelump_stoptags_txt):
        ht.add_stop_tag(line.strip())

    subset = ht.do_subset_partition(0, 0, True)
    ht.merge_subset(subset)

    (n_partitions, _) = ht.count_partitions()
    assert n_partitions == 3, n_partitions


def test_fakelump_stop2():
    # specific insertion of one stop tag
    fakelump_fa = utils.get_test_data('fakelump.fa')

    ht = khmer.Nodegraph(32, 1e5, 4)
    ht.consume_seqfile_and_tag(fakelump_fa)

    ht.add_stop_tag('GGGGAGGGGTGCAGTTGTGACTTGCTCGAGAG')

    subset = ht.do_subset_partition(0, 0, True)
    ht.merge_subset(subset)

    (n_partitions, _) = ht.count_partitions()
    assert n_partitions == 3, n_partitions


def test_fakelump_repartitioning():
    fakelump_fa = utils.get_test_data('fakelump.fa')
    fakelump_fa_foo = utils.get_temp_filename('fakelump.fa.stopfoo')

    ht = khmer.Nodegraph(32, 1e5, 4)
    ht.consume_seqfile_and_tag(fakelump_fa)

    subset = ht.do_subset_partition(0, 0)
    ht.merge_subset(subset)

    (n_partitions, _) = ht.count_partitions()
    assert n_partitions == 1, n_partitions

    # break partitions on any k-mer seen more than once on big
    # excursions (40 out, >82 k-mers encountered)
    EXCURSION_DISTANCE = 40
    EXCURSION_KMER_THRESHOLD = 82
    EXCURSION_KMER_COUNT_THRESHOLD = 1
    counting = khmer.Countgraph(32, 1e5, 4)

    ht.repartition_largest_partition(counting,
                                     EXCURSION_DISTANCE,
                                     EXCURSION_KMER_THRESHOLD,
                                     EXCURSION_KMER_COUNT_THRESHOLD)

    ht.save_stop_tags(fakelump_fa_foo)

    # now re-do everything with these stop tags, specifically
    ht = khmer.Nodegraph(32, 1e5, 4)
    ht.consume_seqfile_and_tag(fakelump_fa)
    ht.load_stop_tags(fakelump_fa_foo)

    subset = ht.do_subset_partition(0, 0, True)
    ht.merge_subset(subset)

    (n_partitions, _) = ht.count_partitions()
    assert n_partitions == 6, n_partitions


def test_fakelump_load_stop_tags_trunc():
    fakelump_fa = utils.get_test_data('fakelump.fa')
    fakelump_fa_foo = utils.get_temp_filename('fakelump.fa.stopfoo')

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

    # now try loading these truncated stop tags; should fail
    ht = khmer.Nodegraph(32, 1, 1, primes=[5, 7, 11, 13])
    ht.consume_seqfile_and_tag(fakelump_fa)

    try:
        ht.load_stop_tags(fakelump_fa_foo)
        assert 0, "this test should fail"
    except OSError:
        pass


def test_fakelump_load_stop_tags_notexist():
    fakelump_fa_foo = utils.get_temp_filename('fakelump.fa.stopfoo')

    ht = khmer.Nodegraph(32, 1, 1, primes=[5, 7, 11, 13])

    try:
        ht.load_stop_tags(fakelump_fa_foo)
        assert 0, "this test should fail"
    except OSError:
        pass
