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
