"""Ported from the reference tests/test_hashbits_obj.py — "an exact
copy of test_hashbits, with all invocations of khmer.new_hashbits
replaced by khmer.Hashbits constructor calls" — exercising the
Hashbits class surface (khmer_tpu/legacy.py).  Size-dependent goldens
follow the same adaptations as tests/test_hashbits.py (the modern
prime selection matches the reference's own 3.0 goldens,
tests/test_nodegraph.py:554-559)."""

import pytest

import khmer_tpu as khmer
from khmer_tpu import Hashbits

from . import khmer_tst_utils as utils


@pytest.mark.huge
def test_toobig():
    try:
        Hashbits(32, 1e13, 1)
        assert 0, "This should fail"
    except MemoryError as err:
        print(str(err))


def test__get_set_tag_density():
    ht = Hashbits(32, 1, 1)

    orig = ht._get_tag_density()
    assert orig != 2
    ht._set_tag_density(2)
    assert ht._get_tag_density() == 2


def test_n_occupied_1():
    filename = utils.get_test_data('random-20-a.fa')

    ht1 = Hashbits(20, 100000, 1)
    for _, record in enumerate(utils.screed_open(filename)):
        ht1.consume(record.sequence)

    # 2.x golden 3877; 3884 with the 3.0 prime selection
    assert ht1.n_occupied() == 3884, ht1.n_occupied()


def test_bloom_python_1():
    filename = utils.get_test_data('random-20-a.fa')
    K = 20
    ht2 = Hashbits(K, 100000, 3)

    n_unique = 0
    for _, record in enumerate(utils.screed_open(filename)):
        sequence = record.sequence
        for n in range(0, len(sequence) + 1 - K):
            kmer = sequence[n:n + K]
            if not ht2.get(kmer):
                n_unique += 1
            ht2.count(kmer)

    assert n_unique == 3960
    assert ht2.n_occupied() == 3884, ht2.n_occupied()  # 2.x: 3882
    assert ht2.n_unique_kmers() == 3960


def test_bloom_c_1():
    filename = utils.get_test_data('random-20-a.fa')
    ht3 = Hashbits(20, 100000, 3)

    for _, record in enumerate(utils.screed_open(filename)):
        ht3.consume(record.sequence)

    assert ht3.n_occupied() == 3884  # 2.x golden 3882
    assert ht3.n_unique_kmers() == 3960


def test_n_occupied_2():
    ht1 = Hashbits(4, 1, 1, primes=[11])  # 2.x: size 10 -> prime 11
    ht1.count('AAAA')
    assert ht1.n_occupied() == 1
    ht1.count('ACTG')
    assert ht1.n_occupied() == 2
    ht1.count('AACG')  # collision 1
    assert ht1.n_occupied() == 2
    ht1.count('AGAC')  # collision 2
    assert ht1.n_occupied() == 2


def test_bloom_c_2():
    # one table: no bloom filter
    ht1 = Hashbits(4, 1, 1, primes=[11])
    ht1.count('AAAA')
    ht1.count('ACTG')
    assert ht1.n_unique_kmers() == 2
    ht1.count('AACG')  # collision with 1st kmer
    assert ht1.n_unique_kmers() == 2
    ht1.count('AGAC')  # collision with 2nd kmer
    assert ht1.n_unique_kmers() == 2

    # two tables: firewalls the collisions
    ht2 = Hashbits(4, 1, 2, primes=[11, 13])
    ht2.count('AAAA')
    ht2.count('ACTG')
    assert ht2.n_unique_kmers() == 2
    ht2.count('AACG')  # collision with only 1st kmer
    assert ht2.n_unique_kmers() == 3
    ht2.count('AGAC')  # collision with both 2nd and 3rd
    assert ht2.n_unique_kmers() == 3


def test_filter_if_present():
    ht = Hashbits(32, 1e4, 2)  # 2.x: (32, 2, 2); see test_hashbits.py

    maskfile = utils.get_test_data('filter-test-A.fa')
    inputfile = utils.get_test_data('filter-test-B.fa')
    outfile = utils.get_temp_filename('filter')

    ht.consume_fasta(maskfile)
    ht.filter_if_present(inputfile, outfile)

    records = list(utils.screed_open(outfile))
    assert len(records) == 1
    assert records[0].name == '3'


def test_combine_pe():
    inpfile = utils.get_test_data('combine_parts_1.fa')
    ht = Hashbits(32, 1, 1)

    ht.consume_partitioned_fasta(inpfile)
    assert ht.count_partitions() == (2, 0)

    s1 = "CATGCAGAAGTTCCGCAACCATACCGTTCAGT"
    pid1 = ht.get_partition_id(s1)
    s2 = "CAAATGTACATGCACTTAAAATCATCCAGCCG"
    pid2 = ht.get_partition_id(s2)

    assert pid1 == 2
    assert pid2 == 80293

    ht.join_partitions(pid1, pid2)
    assert ht.get_partition_id(s1) == ht.get_partition_id(s2)
    assert ht.count_partitions() == (1, 0)


def test_load_partitioned():
    inpfile = utils.get_test_data('combine_parts_1.fa')
    ht = Hashbits(32, 1, 1)

    ht.consume_partitioned_fasta(inpfile)
    assert ht.count_partitions() == (2, 0)

    s1 = "CATGCAGAAGTTCCGCAACCATACCGTTCAGT"
    assert ht.get(s1)

    s2 = "CAAATGTACATGCACTTAAAATCATCCAGCCG"
    assert ht.get(s2)

    s3 = "CATGCAGAAGTTCCGCAACCATACCGTTCAGTTCCTGGTGGCTA"[-32:]
    assert ht.get(s3)


def test_count_within_radius_simple():
    inpfile = utils.get_test_data('all-A.fa')
    ht = Hashbits(4, 1e4, 2)

    print(ht.consume_fasta(inpfile))
    n = ht.count_kmers_within_radius('AAAA', 1)
    assert n == 1


def test_count_within_radius_big():
    inpfile = utils.get_test_data('random-20-a.fa')
    ht = Hashbits(20, 1e6, 4)  # FP-free table; see test_hashbits.py

    ht.consume_fasta(inpfile)
    n = ht.count_kmers_within_radius('CGCAGGCTGGATTCTAGAGG', int(1e6))
    assert n == 3960, n

    ht = Hashbits(21, 1e5, 4)
    ht.consume_fasta(inpfile)
    n = ht.count_kmers_within_radius('CGCAGGCTGGATTCTAGAGGC', int(1e6))
    assert n == 39


def test_count_kmer_degree():
    inpfile = utils.get_test_data('all-A.fa')
    ht = Hashbits(4, 1e4, 2)
    ht.consume_fasta(inpfile)

    assert ht.kmer_degree('AAAA') == 2
    assert ht.kmer_degree('AAAT') == 1
    assert ht.kmer_degree('AATA') == 0
    assert ht.kmer_degree('TAAA') == 1


def test_save_load_tagset():
    ht = Hashbits(32, 1, 1)

    outfile = utils.get_temp_filename('tagset')

    ht.add_tag('A' * 32)
    ht.save_tagset(outfile)

    ht.add_tag('G' * 32)

    ht.load_tagset(outfile)              # implicitly => clear_tags=True
    ht.save_tagset(outfile)

    # if tags have been cleared, then the new tagfile is one tag long
    fp = open(outfile, 'rb')
    data = fp.read()
    fp.close()
    assert len(data) == 30, len(data)


def test_save_load_tagset_noclear():
    ht = Hashbits(32, 1, 1)

    outfile = utils.get_temp_filename('tagset')

    ht.add_tag('A' * 32)
    ht.save_tagset(outfile)

    ht.add_tag('G' * 32)

    ht.load_tagset(outfile, False)       # clear_tags=False: keep both
    ht.save_tagset(outfile)

    fp = open(outfile, 'rb')
    data = fp.read()
    fp.close()
    assert len(data) == 38, len(data)


def test_stop_traverse():
    filename = utils.get_test_data('random-20-a.fa')

    ht = Hashbits(20, 1e4, 3)
    ht.add_stop_tag('TTGCATACGTTGAGCCAGCG')

    ht.consume_fasta_and_tag(filename)   # DO NOT join across stoptags
    subset = ht.do_subset_partition(0, 0, True)
    ht.merge_subset(subset)

    n, _ = ht.count_partitions()
    assert n == 2, n


def test_tag_across_stoptraverse():
    filename = utils.get_test_data('random-20-a.fa')

    ht = Hashbits(20, 1e4, 3)
    ht.add_stop_tag('CCGAATATATAACAGCGACG')

    ht.consume_fasta_and_tag_with_stoptags(filename)  # DO join across

    subset = ht.do_subset_partition(0, 0)
    n, _ = ht.count_partitions()
    assert n == 99

    n, _ = ht.subset_count_partitions(subset)
    assert n == 2

    ht.merge_subset(subset)
    n, _ = ht.count_partitions()
    assert n == 1, n


def test_notag_across_stoptraverse():
    filename = utils.get_test_data('random-20-a.fa')

    ht = Hashbits(20, 1e4, 3)
    ht.add_stop_tag('TTGCATACGTTGAGCCAGCG')

    ht.consume_fasta_and_tag_with_stoptags(filename)

    subset = ht.do_subset_partition(0, 0)
    ht.merge_subset(subset)

    n, _ = ht.count_partitions()
    assert n == 2, n


def test_find_stoptags():
    ht = Hashbits(5, 1, 1)
    ht.add_stop_tag("AAAAA")

    assert ht.identify_stoptags_by_position("AAAAA") == [0]
    assert ht.identify_stoptags_by_position("AAAAAA") == [0, 1]
    assert ht.identify_stoptags_by_position("TTTTT") == [0]
    assert ht.identify_stoptags_by_position("TTTTTT") == [0, 1]


def test_find_stoptags2():
    ht = Hashbits(4, 1, 1)
    ht.add_stop_tag("ATGC")

    x = ht.identify_stoptags_by_position("ATGCATGCGCAT")
    assert x == [0, 2, 4, 8], x


def test_get_ksize():
    kh = Hashbits(22, 1, 1)
    assert kh.ksize() == 22


def test_get_hashsizes():
    kh = Hashbits(22, 100, 4)
    # the reference's own 3.0 golden (tests/test_nodegraph.py:554-559);
    # the 2.x file expected primes above 100
    assert kh.hashsizes() == [97, 89, 83, 79], kh.hashsizes()


def test_extract_unique_paths_0():
    kh = Hashbits(10, 1e5, 4)

    x = kh.extract_unique_paths('ATGGAGAGACACAGATAGACAGGAGTGGCGATG', 10, 1)
    assert x == ['ATGGAGAGACACAGATAGACAGGAGTGGCGATG']

    kh.consume('ATGGAGAGACACAGATAGACAGGAGTGGCGATG')
    x = kh.extract_unique_paths('ATGGAGAGACACAGATAGACAGGAGTGGCGATG', 10, 1)
    assert not x


def test_extract_unique_paths_1():
    kh = Hashbits(10, 1e5, 4)

    kh.consume('AGTGGCGATG')
    x = kh.extract_unique_paths('ATGGAGAGACACAGATAGACAGGAGTGGCGATG', 10, 1)
    assert x == ['ATGGAGAGACACAGATAGACAGGAGTGGCGAT']  # all but last k-mer


def test_extract_unique_paths_2():
    kh = Hashbits(10, 1e5, 4)

    kh.consume('ATGGAGAGAC')
    x = kh.extract_unique_paths('ATGGAGAGACACAGATAGACAGGAGTGGCGATG', 10, 1)
    assert x == ['TGGAGAGACACAGATAGACAGGAGTGGCGATG']  # all but 1st k-mer


def test_extract_unique_paths_3():
    kh = Hashbits(10, 1e5, 4)

    kh.consume('ATGGAGAGAC')
    kh.consume('AGTGGCGATG')
    x = kh.extract_unique_paths('ATGGAGAGACACAGATAGACAGGAGTGGCGATG', 10, 1)
    assert x == ['TGGAGAGACACAGATAGACAGGAGTGGCGAT']  # all but 1st/last


def test_extract_unique_paths_4():
    kh = Hashbits(10, 1e5, 4)

    kh.consume('ATGGAGAGAC')
    kh.consume('AGTGGCGATG')
    kh.consume('ATAGACAGGA')

    x = kh.extract_unique_paths('ATGGAGAGACACAGATAGACAGGAGTGGCGATG', 10, 1)
    assert x == ['TGGAGAGACACAGATAGACAGG', 'TAGACAGGAGTGGCGAT']


def test_find_unpart():
    filename = utils.get_test_data('random-20-a.odd.fa')
    filename2 = utils.get_test_data('random-20-a.even.fa')

    ht = Hashbits(20, 1e4, 3)
    ht.consume_fasta_and_tag(filename)

    subset = ht.do_subset_partition(0, 0)
    ht.merge_subset(subset)

    n, _ = ht.count_partitions()
    assert n == 49

    ht.find_unpart(filename2, True, False)
    n, _ = ht.count_partitions()
    assert n == 1, n                     # all sequences connect


def test_find_unpart_notraverse():
    filename = utils.get_test_data('random-20-a.odd.fa')
    filename2 = utils.get_test_data('random-20-a.even.fa')

    ht = Hashbits(20, 1e4, 3)
    ht.consume_fasta_and_tag(filename)

    subset = ht.do_subset_partition(0, 0)
    ht.merge_subset(subset)

    n, _ = ht.count_partitions()
    assert n == 49

    ht.find_unpart(filename2, False, False)     # <-- don't traverse
    n, _ = ht.count_partitions()
    assert n == 99, n                    # all sequences disconnected


def test_find_unpart_fail():
    filename = utils.get_test_data('random-20-a.odd.fa')
    filename2 = utils.get_test_data('random-20-a.odd.fa')  # <- odd again

    ht = Hashbits(20, 1e4, 3)
    ht.consume_fasta_and_tag(filename)

    subset = ht.do_subset_partition(0, 0)
    ht.merge_subset(subset)

    n, _ = ht.count_partitions()
    assert n == 49

    ht.find_unpart(filename2, True, False)
    n, _ = ht.count_partitions()
    assert n == 49, n                    # only 49 sequences worth of tags


def test_simple_median():
    hi = Hashbits(6, 1e5, 2)

    (median, average, stddev) = hi.get_median_count("AAAAAA")
    print(median, average, stddev)
    assert median == 0
    assert average == 0.0
    assert stddev == 0.0

    hi.consume("AAAAAA")
    (median, average, stddev) = hi.get_median_count("AAAAAA")
    assert median == 1
    assert average == 1.0
    assert stddev == 0.0


def test_badget():
    hbts = Hashbits(6, 1e6, 1)

    dna = "AGCTTTTCATTCTGACTGCAACGGGCAATATGTCTCTGTGTGGATTAAAAAAAGAGTGTCTGATAG"

    hbts.consume(dna)

    assert hbts.get("AGCTTT") == 1
    assert hbts.get("GATGAG") == 0

    try:
        hbts.get("AGCTT")
        assert 0, "this should fail"
    except ValueError as err:
        print(str(err))


def test_bad_primes():
    try:
        Hashbits(6, 1, 1, primes=["a", "b", "c"])
        assert 0, "this should fail"
    except (TypeError, ValueError) as e:
        print(str(e))


def test_consume_fasta_and_tag_with_badreads_parser():
    presencetable = Hashbits(6, 1e6, 2)
    try:
        readsparser = khmer.ReadParser(utils.get_test_data("test-empty.fa"))
        presencetable.consume_fasta_and_tag_with_reads_parser(readsparser)
        assert 0, "this should fail"
    except OSError as e:
        print(str(e))
    except ValueError as e:
        print(str(e))
