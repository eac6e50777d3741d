"""Nodegraph tests ported from the reference tests/test_nodegraph.py
(bloom occupancy goldens, update_from, neighbors, radius counts,
unique paths, partitioned fasta, stop-tag traversal)."""

import pytest

import khmer_tpu as khmer
from khmer_tpu.io.fastx import FastxReader


def test_update_from():
    nodegraph = khmer.Nodegraph(5, 1000, 4)
    other_nodegraph = khmer.Nodegraph(5, 1000, 4)

    assert nodegraph.get('AAAAA') == 0
    assert nodegraph.n_occupied() == 0

    other_nodegraph.count('AAAAA')
    assert other_nodegraph.get('AAAAA') == 1
    assert other_nodegraph.n_occupied() == 1

    nodegraph.count('GCGCG')
    assert nodegraph.get('GCGCG') == 1
    assert nodegraph.n_occupied() == 1

    nodegraph.update(other_nodegraph)

    assert nodegraph.get('AAAAA') == 1
    assert nodegraph.get('GCGCG') == 1
    assert nodegraph.n_occupied() == 2
    assert other_nodegraph.get('AAAAA') == 1
    assert other_nodegraph.get('GCGCG') == 0


def test_update_from_diff_ksize():
    nodegraph = khmer.Nodegraph(5, 1000, 4)
    other_nodegraph = khmer.Nodegraph(4, 1000, 4)

    with pytest.raises(ValueError):
        nodegraph.update(other_nodegraph)


def test_update_from_diff_tablesize():
    nodegraph = khmer.Nodegraph(5, 100, 4)
    other_nodegraph = khmer.Nodegraph(5, 1000, 4)

    with pytest.raises(ValueError):
        nodegraph.update(other_nodegraph)


def test_n_occupied_1(ref_test_data):
    nodegraph = khmer.Nodegraph(20, 100000, 1)
    for record in FastxReader(ref_test_data + '/random-20-a.fa'):
        nodegraph.consume(record.sequence)
    # this number calculated independently (reference golden)
    assert nodegraph.n_occupied() == 3884, nodegraph.n_occupied()


def test_bloom_c_1(ref_test_data):
    nodegraph = khmer.Nodegraph(20, 100000, 3)
    nodegraph.consume_seqfile(ref_test_data + '/random-20-a.fa')
    assert nodegraph.n_occupied() == 3884
    assert nodegraph.n_unique_kmers() == 3960


def test_count_within_radius_simple(ref_test_data):
    nodegraph = khmer.Nodegraph(4, 1, 1, primes=[3, 5])
    nodegraph.consume_seqfile(ref_test_data + '/all-A.fa')
    assert nodegraph.count_kmers_within_radius('AAAA', 1) == 1
    assert nodegraph.count_kmers_within_radius('AAAA', 10) == 1


def test_count_within_radius_big(ref_test_data):
    nodegraph = khmer.Nodegraph(20, 1e5, 4)
    nodegraph.consume_seqfile(ref_test_data + '/random-20-a.fa')
    n = nodegraph.count_kmers_within_radius('CGCAGGCTGGATTCTAGAGG',
                                            int(1e6))
    assert n == 3961, n

    nodegraph = khmer.Nodegraph(21, 1e5, 4)
    nodegraph.consume_seqfile(ref_test_data + '/random-20-a.fa')
    n = nodegraph.count_kmers_within_radius('CGCAGGCTGGATTCTAGAGGC',
                                            int(1e6))
    assert n == 39


def test_count_kmer_degree(ref_test_data):
    nodegraph = khmer.Nodegraph(4, 1, 1, primes=[3, 5])
    nodegraph.consume_seqfile(ref_test_data + '/all-A.fa')

    assert nodegraph.kmer_degree('AAAA') == 2
    assert nodegraph.kmer_degree('AAAT') == 1
    assert nodegraph.kmer_degree('AATA') == 0
    assert nodegraph.kmer_degree('TAAA') == 1


def test_kmer_neighbors(ref_test_data):
    nodegraph = khmer.Nodegraph(4, 100, 1)
    nodegraph.consume_seqfile(ref_test_data + '/all-A.fa')

    def n_to_str(x):
        return [str(i) for i in x]

    h = nodegraph.hash('AAAA')
    assert n_to_str(nodegraph.neighbors(h)) == ['AAAA', 'AAAA']
    assert n_to_str(nodegraph.neighbors('AAAA')) == ['AAAA', 'AAAA']

    h = nodegraph.hash('AAAT')
    assert n_to_str(nodegraph.neighbors(h)) == ['AAAA']
    assert n_to_str(nodegraph.neighbors('AAAT')) == ['AAAA']

    h = nodegraph.hash('AATA')
    assert nodegraph.neighbors(h) == []

    h = nodegraph.hash('TAAA')
    assert n_to_str(nodegraph.neighbors(h)) == ['AAAA']


def test_kmer_neighbors_wrong_ksize(ref_test_data):
    nodegraph = khmer.Nodegraph(4, 1, 1, primes=[3, 5])
    nodegraph.consume_seqfile(ref_test_data + '/all-A.fa')

    with pytest.raises(ValueError):
        nodegraph.neighbors('AAAAA')

    with pytest.raises(TypeError):
        nodegraph.neighbors({})


def test_extract_unique_paths_0():
    kh = khmer.Nodegraph(10, 1, 1, primes=[5, 7, 11, 13])

    x = kh.extract_unique_paths(
        'ATGGAGAGACACAGATAGACAGGAGTGGCGATG', 10, 1)
    assert x == ['ATGGAGAGACACAGATAGACAGGAGTGGCGATG']

    kh.consume('ATGGAGAGACACAGATAGACAGGAGTGGCGATG')
    x = kh.extract_unique_paths(
        'ATGGAGAGACACAGATAGACAGGAGTGGCGATG', 10, 1)
    assert not x


def test_extract_unique_paths_1():
    kh = khmer.Nodegraph(10, 1, 1, primes=[5, 7, 11, 13])

    kh.consume('AGTGGCGATG')
    x = kh.extract_unique_paths(
        'ATGGAGAGACACAGATAGACAGGAGTGGCGATG', 10, 1)
    assert x == ['ATGGAGAGACACAGATAGACAGGAGTGGCGAT']


def test_extract_unique_paths_2():
    kh = khmer.Nodegraph(10, 1, 1, primes=[5, 7, 11, 13])

    kh.consume('ATGGAGAGAC')
    x = kh.extract_unique_paths(
        'ATGGAGAGACACAGATAGACAGGAGTGGCGATG', 10, 1)
    assert x == ['TGGAGAGACACAGATAGACAGGAGTGGCGATG']


def test_extract_unique_paths_3():
    kh = khmer.Nodegraph(10, 1, 1, primes=[5, 7, 11, 13])

    kh.consume('ATGGAGAGAC')
    kh.consume('AGTGGCGATG')
    x = kh.extract_unique_paths(
        'ATGGAGAGACACAGATAGACAGGAGTGGCGATG', 10, 1)
    assert x == ['TGGAGAGACACAGATAGACAGGAGTGGCGAT']


def test_extract_unique_paths_4():
    kh = khmer.Nodegraph(10, 1e6, 4)

    kh.consume('ATGGAGAGAC')
    kh.consume('AGTGGCGATG')
    kh.consume('ATAGACAGGA')

    x = kh.extract_unique_paths(
        'ATGGAGAGACACAGATAGACAGGAGTGGCGATG', 10, 1)
    assert x == ['TGGAGAGACACAGATAGACAGG', 'TAGACAGGAGTGGCGAT']


def test_combine_pe(ref_test_data):
    nodegraph = khmer.Nodegraph(32, 1, 1)
    nodegraph.consume_partitioned_fasta(
        ref_test_data + '/combine_parts_1.fa')
    assert nodegraph.count_partitions() == (2, 0)

    first_seq = "CATGCAGAAGTTCCGCAACCATACCGTTCAGT"
    pid1 = nodegraph.get_partition_id(first_seq)

    second_seq = "CAAATGTACATGCACTTAAAATCATCCAGCCG"
    pid2 = nodegraph.get_partition_id(second_seq)

    assert pid1 == 2
    assert pid2 == 80293

    nodegraph.join_partitions(pid1, pid2)

    pid1 = nodegraph.get_partition_id(first_seq)
    pid2 = nodegraph.get_partition_id(second_seq)

    assert pid1 == pid2
    assert nodegraph.count_partitions() == (1, 0)


def test_consume_partitioned_fail(ref_test_data):
    nodegraph = khmer.Nodegraph(32, 1, 1)
    with pytest.raises(ValueError):
        nodegraph.consume_partitioned_fasta(
            ref_test_data + '/test-reads.fa')


def test_stop_traverse(ref_test_data):
    nodegraph = khmer.Nodegraph(20, 1e4, 3)

    # without tagging/joining across consume, this breaks into two
    # partitions; with, it is one
    nodegraph.add_stop_tag('TTGCATACGTTGAGCCAGCG')

    nodegraph.consume_seqfile_and_tag(ref_test_data + '/random-20-a.fa')
    subset = nodegraph.do_subset_partition(0, 0, True)
    nodegraph.merge_subset(subset)

    n, _ = nodegraph.count_partitions()
    assert n == 2, n
