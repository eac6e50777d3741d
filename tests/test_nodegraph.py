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


# ---------------------------------------------------------------------------
# round 3: the rest of the reference file (tags, tagset/stoptag file
# matrix, occupancy goldens, linear-path traversal, arg errors)
# ---------------------------------------------------------------------------

import pytest

from . import khmer_tst_utils as utils
from .khmer_tst_utils import screed_open


@pytest.mark.huge
def test_toobig():
    try:
        khmer.Nodegraph(32, 1e13, 1)
        assert 0, "This should fail"
    except MemoryError as err:
        print(str(err))


def test_add_tag():
    nodegraph = khmer.Nodegraph(6, 1, 1)

    assert nodegraph.n_tags == 0
    nodegraph.add_tag('AATAAG')
    assert nodegraph.n_tags == 1

    assert nodegraph.get_tagset() == ['AATAAG']


def test_get_tag_sequences():
    nodegraph = khmer.Nodegraph(6, 1, 1)

    assert nodegraph.n_tags == 0
    kmer = nodegraph.hash('AATAAG')
    nodegraph.add_tag(kmer)
    assert nodegraph.n_tags == 1

    tagset = list(nodegraph.get_tags_for_sequence('GGGAATAAGGGG'))

    assert len(tagset) == 1
    assert nodegraph.reverse_hash(tagset[0]) == 'AATAAG'


def test_add_stop_tag():
    nodegraph = khmer.Nodegraph(6, 1, 1)

    nodegraph.add_stop_tag('AATAAG')
    assert nodegraph.get_stop_tags() == ['AATAAG']


def test_add_stop_tag_hashval():
    nodegraph = khmer.Nodegraph(6, 1, 1)

    kmer = nodegraph.hash('AATAAG')
    nodegraph.add_stop_tag(kmer)
    assert nodegraph.get_stop_tags() == ['AATAAG']


def test__get_set_tag_density():
    nodegraph = khmer.Nodegraph(32, 1, 1)
    orig = nodegraph.tag_density
    assert orig != 2
    nodegraph.tag_density = 2
    assert nodegraph.tag_density == 2


def test_update_from_2():
    ng1 = khmer.Nodegraph(20, 1000, 4)
    ng2 = khmer.Nodegraph(20, 1000, 4)

    filename = utils.get_test_data('random-20-a.fa')
    ng1.consume_seqfile(filename)
    ng2.consume_seqfile(filename)

    assert ng1.n_occupied() == ng2.n_occupied()
    ng1.update(ng2)

    assert ng1.n_occupied() == ng2.n_occupied()


def test_update_from_diff_ksize_2():
    nodegraph = khmer.Nodegraph(5, 1000, 4)
    other_nodegraph = khmer.Nodegraph(4, 1000, 4)

    with pytest.raises(ValueError):
        nodegraph.update(other_nodegraph)

    with pytest.raises(ValueError):
        other_nodegraph.update(nodegraph)


def test_update_from_diff_num_tables():
    nodegraph = khmer.Nodegraph(5, 1000, 3)
    other_nodegraph = khmer.Nodegraph(5, 1000, 4)

    with pytest.raises(ValueError):
        nodegraph.update(other_nodegraph)


def test_bloom_python_1():
    # count unique kmers in python using the bloom filter
    filename = utils.get_test_data('random-20-a.fa')

    ksize = 20
    htable_size = 100000
    num_nodegraphs = 3

    nodegraph = khmer.Nodegraph(ksize, htable_size, num_nodegraphs)

    n_unique = 0
    for record in screed_open(filename):
        sequence = record.sequence
        seq_len = len(sequence)
        for num in range(0, seq_len + 1 - ksize):
            kmer = sequence[num:num + ksize]
            if not nodegraph.get(kmer):
                n_unique += 1
            nodegraph.count(kmer)

    assert n_unique == 3960
    assert nodegraph.n_occupied() == 3884, nodegraph.n_occupied()

    # this number equals n_unique
    assert nodegraph.n_unique_kmers() == 3960, nodegraph.n_unique_kmers()


def test_n_occupied_2():  # simple one
    ksize = 4

    nodegraph = khmer.Nodegraph(ksize, 1, 1, primes=[11])
    nodegraph.count('AAAA')  # 00 00 00 00 = 0
    assert nodegraph.n_occupied() == 1

    nodegraph.count('ACTG')  # 00 10 01 11 =
    assert nodegraph.n_occupied() == 2

    nodegraph.count('AACG')  # 00 00 10 11 = 11  # collision 1

    assert nodegraph.n_occupied() == 2
    nodegraph.count('AGAC')   # 00  11 00 10 # collision 2
    assert nodegraph.n_occupied() == 2, nodegraph.n_occupied()


def test_n_occupied_2_add_is_count():  # 'add' synonym for 'count'
    ksize = 4

    nodegraph = khmer.Nodegraph(ksize, 1, 1, primes=[11])
    nodegraph.add('AAAA')
    assert nodegraph.n_occupied() == 1

    nodegraph.add('ACTG')
    assert nodegraph.n_occupied() == 2

    nodegraph.add('AACG')  # collision 1
    assert nodegraph.n_occupied() == 2

    nodegraph.add('AGAC')  # collision 2
    assert nodegraph.n_occupied() == 2, nodegraph.n_occupied()


def test_bloom_c_2():  # simple one
    ksize = 4

    # use only 1 hashtable, no bloom filter
    nodegraph = khmer.Nodegraph(ksize, 1, 1, primes=[11])
    nodegraph.count('AAAA')
    nodegraph.count('ACTG')
    assert nodegraph.n_unique_kmers() == 2
    nodegraph.count('AACG')  # collision with 1st kmer
    assert nodegraph.n_unique_kmers() == 2
    nodegraph.count('AGAC')  # collision with 2nd kmer
    assert nodegraph.n_unique_kmers() == 2

    # use two hashtables with 11,13
    other_nodegraph = khmer.Nodegraph(ksize, 1, 1, primes=[11, 13])
    other_nodegraph.count('AAAA')

    other_nodegraph.count('ACTG')
    assert other_nodegraph.n_unique_kmers() == 2
    # collision with only 1st kmer
    other_nodegraph.count('AACG')
    assert other_nodegraph.n_unique_kmers() == 3
    other_nodegraph.count('AGAC')
    # collision with both 2nd and 3rd kmers
    assert other_nodegraph.n_unique_kmers() == 3


def test_load_partitioned():
    inpfile = utils.get_test_data('combine_parts_1.fa')
    nodegraph = khmer.Nodegraph(32, 1, 1)

    nodegraph.consume_partitioned_fasta(inpfile)
    assert nodegraph.count_partitions() == (2, 0)

    first_seq = "CATGCAGAAGTTCCGCAACCATACCGTTCAGT"
    assert nodegraph.get(first_seq)

    second_seq = "CAAATGTACATGCACTTAAAATCATCCAGCCG"
    assert nodegraph.get(second_seq)

    third_s = "CATGCAGAAGTTCCGCAACCATACCGTTCAGTTCCTGGTGGCTA"[-32:]
    assert nodegraph.get(third_s)


def test_save_load_tagset():
    nodegraph = khmer.Nodegraph(32, 1, 1)

    outfile = utils.get_temp_filename('tagset')

    nodegraph.add_tag('A' * 32)
    nodegraph.save_tagset(outfile)

    nodegraph.add_tag('G' * 32)

    nodegraph.load_tagset(outfile)       # implicitly => clear_tags=True
    nodegraph.save_tagset(outfile)

    # if tags have been cleared, then the new tagfile is smaller (one
    # tag, 30 bytes, not two, 38 bytes)
    fp = open(outfile, 'rb')
    data = fp.read()
    fp.close()
    assert len(data) == 30, len(data)


def test_save_load_tagset_noclear():
    nodegraph = khmer.Nodegraph(32, 1, 1)

    outfile = utils.get_temp_filename('tagset')

    nodegraph.add_tag('A' * 32)
    nodegraph.save_tagset(outfile)

    nodegraph.add_tag('G' * 32)

    nodegraph.load_tagset(outfile, False)  # clear_tags => False
    nodegraph.save_tagset(outfile)

    fp = open(outfile, 'rb')
    data = fp.read()
    fp.close()
    assert len(data) == 38, len(data)


def test_get_ksize():
    kh = khmer.Nodegraph(22, 1, 1)
    assert kh.ksize() == 22


def test_get_hashsizes():
    kh = khmer.Nodegraph(22, 100, 4)
    expected = utils.longify([97, 89, 83, 79])
    assert kh.hashsizes() == expected, kh.hashsizes()


def test_get_raw_tables():
    kh = khmer.Nodegraph(10, 1e6, 4)
    kh.consume('ATGGAGAGAC')
    kh.consume('AGTGGCGATG')
    kh.consume('ATAGACAGGA')
    tables = kh.get_raw_tables()

    for size, table in zip(kh.hashsizes(), tables):
        assert isinstance(table, memoryview)
        # bit storage: packed 8 buckets per byte
        assert size // 8 + 1 == len(table)


def test_simple_median():
    hi = khmer.Nodegraph(6, 1e5, 2)

    (median, average, stddev) = hi.get_median_count("AAAAAA")
    assert median == 0
    assert average == 0.0
    assert stddev == 0.0

    hi.consume("AAAAAA")
    (median, average, stddev) = hi.get_median_count("AAAAAA")
    assert median == 1
    assert average == 1.0
    assert stddev == 0.0


def test_badget():
    hbts = khmer.Nodegraph(6, 1e6, 1)

    dna = ("AGCTTTTCATTCTGACTGCAACGGGCAATATGTCTCTGTGTGGATTAAAAAAAGAGTG"
           "TCTGATAG")

    hbts.consume(dna)

    assert hbts.get("AGCTTT") == 1
    assert hbts.get("GATGAG") == 0

    with pytest.raises(ValueError):
        hbts.get("AGCTT")


def test_load_notexist_should_fail():
    savepath = utils.get_temp_filename('tempnodegraphsave0.htable')

    with pytest.raises(OSError):
        khmer.Countgraph.load(savepath)


def test_load_truncated_should_fail():
    inpath = utils.get_test_data('random-20-a.fa')
    savepath = utils.get_temp_filename('tempnodegraphsave0.ct')

    hi = khmer.Countgraph(12, 1000, 2)

    hi.consume_seqfile(inpath)
    hi.save(savepath)

    fp = open(savepath, 'rb')
    data = fp.read()
    fp.close()

    fp = open(savepath, 'wb')
    fp.write(data[:1000])
    fp.close()

    with pytest.raises(OSError):
        khmer.Countgraph.load(savepath)


def test_save_load_tagset_notexist():
    nodegraph = khmer.Nodegraph(32, 1, 1)

    outfile = utils.get_temp_filename('tagset')
    with pytest.raises(OSError):
        nodegraph.load_tagset(outfile)


def test_save_load_tagset_trunc():
    nodegraph = khmer.Nodegraph(32, 1, 1)

    outfile = utils.get_temp_filename('tagset')

    nodegraph.add_tag('A' * 32)
    nodegraph.add_tag('G' * 32)
    nodegraph.save_tagset(outfile)

    # truncate tagset file...
    fp = open(outfile, 'rb')
    data = fp.read()
    fp.close()

    for i in range(len(data)):
        fp = open(outfile, 'wb')
        fp.write(data[:i])
        fp.close()

        with pytest.raises(OSError):
            nodegraph.load_tagset(outfile)


def test_hashbits_file_version_check():
    inpath = utils.get_test_data('badversion-k12.htable')

    with pytest.raises(OSError):
        khmer.Nodegraph.load(inpath)


def test_nodegraph_file_type_check():
    kh = khmer.Countgraph(12, 1, 1)
    savepath = utils.get_temp_filename('tempcountingsave0.ct')
    kh.save(savepath)

    with pytest.raises(OSError):
        khmer.Nodegraph.load(savepath)


def test_stoptags_file_version_check():
    nodegraph = khmer.Nodegraph(32, 1, 1)

    inpath = utils.get_test_data('badversion-k32.stoptags')

    with pytest.raises(OSError):
        nodegraph.load_stop_tags(inpath)


def test_stoptags_ksize_check():
    nodegraph = khmer.Nodegraph(31, 1, 1)

    inpath = utils.get_test_data('goodversion-k32.stoptags')
    with pytest.raises(OSError):
        nodegraph.load_stop_tags(inpath)


def test_stop_tags_filetype_check():
    nodegraph = khmer.Nodegraph(31, 1, 1)

    inpath = utils.get_test_data('goodversion-k32.tagset')
    with pytest.raises(OSError):
        nodegraph.load_stop_tags(inpath)


def test_tagset_file_version_check():
    nodegraph = khmer.Nodegraph(32, 1, 1)

    inpath = utils.get_test_data('badversion-k32.tagset')

    with pytest.raises(OSError):
        nodegraph.load_tagset(inpath)


def test_stop_tags_truncate_check():
    nodegraph = khmer.Nodegraph(32, 1, 1)

    inpath = utils.get_test_data('goodversion-k32.tagset')
    data = open(inpath, 'rb').read()

    truncpath = utils.get_temp_filename('zzz')
    for i in range(len(data)):
        fp = open(truncpath, 'wb')
        fp.write(data[:i])
        fp.close()

        with pytest.raises(OSError):
            nodegraph.load_stop_tags(truncpath)


def test_tagset_ksize_check():
    nodegraph = khmer.Nodegraph(31, 1, 1)

    inpath = utils.get_test_data('goodversion-k32.tagset')
    with pytest.raises(OSError):
        nodegraph.load_tagset(inpath)


def test_tagset_filetype_check():
    nodegraph = khmer.Nodegraph(31, 1, 1)

    inpath = utils.get_test_data('goodversion-k32.stoptags')
    with pytest.raises(OSError):
        nodegraph.load_tagset(inpath)


def test_bad_primes_list():
    with pytest.raises((TypeError, ValueError)):
        khmer.Nodegraph(31, 1, 1, primes=["a", "b", "c"])


def test_bad_primes():
    with pytest.raises((TypeError, ValueError)):
        khmer.Nodegraph(6, 1, 1, primes=["a", "b", "c"])


def test_consume_absentfasta():
    nodegraph = khmer.Nodegraph(31, 1, 1)
    with pytest.raises(TypeError):
        nodegraph.consume_seqfile()
    from khmer_tpu import ReadParser

    with pytest.raises((OSError, ValueError)):
        readparser = ReadParser(utils.get_test_data('empty-file'))
        nodegraph.consume_seqfile(readparser)


def test_consume_seqfile_and_tag_with_badreads_parser():
    nodegraph = khmer.Nodegraph(6, 1e6, 2)
    with pytest.raises((OSError, ValueError)):
        readsparser = khmer.ReadParser(utils.get_test_data("test-empty.fa"))
        nodegraph.consume_seqfile_and_tag(readsparser)


def test_n_occupied_save_load():
    filename = utils.get_test_data('random-20-a.fa')

    nodegraph = khmer.Nodegraph(20, 100000, 3)

    for record in screed_open(filename):
        nodegraph.consume(record.sequence)

    assert nodegraph.n_occupied() == 3884
    assert nodegraph.n_unique_kmers() == 3960

    savefile = utils.get_temp_filename('out')
    nodegraph.save(savefile)

    ng2 = khmer.Nodegraph.load(savefile)
    assert ng2.n_occupied() == 3884, ng2.n_occupied()
    assert ng2.n_unique_kmers() == 0    # this is intended behavior, sigh.


def test_n_occupied_vs_countgraph():
    filename = utils.get_test_data('random-20-a.fa')

    nodegraph = khmer.Nodegraph(20, 100000, 3)
    countgraph = khmer.Countgraph(20, 100000, 3)

    assert nodegraph.n_occupied() == 0, nodegraph.n_occupied()
    assert countgraph.n_occupied() == 0, countgraph.n_occupied()

    assert nodegraph.n_unique_kmers() == 0
    assert countgraph.n_unique_kmers() == 0

    for record in screed_open(filename):
        nodegraph.consume(record.sequence)
        countgraph.consume(record.sequence)

    assert nodegraph.hashsizes() == nodegraph.hashsizes()

    # these are all the same -- good :).
    assert nodegraph.n_occupied() == 3884, nodegraph.n_occupied()
    assert countgraph.n_occupied() == 3884, countgraph.n_occupied()

    assert nodegraph.n_unique_kmers() == 3960
    assert countgraph.n_unique_kmers() == 3960


def test_n_occupied_vs_countgraph_another_size():
    filename = utils.get_test_data('random-20-a.fa')

    nodegraph = khmer.Nodegraph(20, 10000, 3)
    countgraph = khmer.Countgraph(20, 10000, 3)

    for record in screed_open(filename):
        nodegraph.consume(record.sequence)
        countgraph.consume(record.sequence)

    assert nodegraph.n_occupied() == 3269, nodegraph.n_occupied()
    assert countgraph.n_occupied() == 3269, countgraph.n_occupied()

    # collision-suppressed reference golden (sequential claim rule)
    assert nodegraph.n_unique_kmers() == 3916
    assert countgraph.n_unique_kmers() == 3916


def test_traverse_linear_path():
    contigfile = utils.get_test_data('simple-genome.fa')
    contig = list(screed_open(contigfile))[0].sequence

    K = 21

    nodegraph = khmer.Nodegraph(K, 1e5, 4)
    stopgraph = khmer.Nodegraph(K, 1e5, 4)

    nodegraph.consume(contig)

    degree_nodes = khmer.HashSet(K)
    size, conns, visited = nodegraph.traverse_linear_path(contig[:K],
                                                          degree_nodes,
                                                          stopgraph)
    assert size == 980
    assert len(conns) == 0
    assert len(visited) == 980


def test_find_high_degree_nodes():
    contigfile = utils.get_test_data('simple-genome.fa')
    contig = list(screed_open(contigfile))[0].sequence

    K = 21

    nodegraph = khmer.Nodegraph(K, 1e5, 4)

    nodegraph.consume(contig)

    degree_nodes = nodegraph.find_high_degree_nodes(contig)
    assert len(degree_nodes) == 0


def test_find_high_degree_nodes_2():
    contigfile = utils.get_test_data('simple-genome.fa')
    contig = list(screed_open(contigfile))[0].sequence

    K = 21

    nodegraph = khmer.Nodegraph(K, 1e5, 4)

    nodegraph.consume(contig)
    nodegraph.count(contig[2:22] + 'G')   # another neighbor for 1:22

    degree_nodes = nodegraph.find_high_degree_nodes(contig)
    assert len(degree_nodes) == 1
    assert nodegraph.hash(contig[1:22]) in degree_nodes


def test_traverse_linear_path_2():
    contigfile = utils.get_test_data('simple-genome.fa')
    contig = list(screed_open(contigfile))[0].sequence

    K = 21

    nodegraph = khmer.Nodegraph(K, 1e5, 4)
    stopgraph = khmer.Nodegraph(K, 1e5, 4)

    nodegraph.consume(contig)
    nodegraph.count(contig[101:121] + 'G')  # will add another neighbor

    degree_nodes = nodegraph.find_high_degree_nodes(contig)

    assert len(degree_nodes) == 1
    assert nodegraph.hash(contig[100:121]) in degree_nodes

    # traverse from start, should end at node 100:121
    size, conns, visited = nodegraph.traverse_linear_path(contig[0:21],
                                                          degree_nodes,
                                                          stopgraph)

    assert size == 100
    assert len(visited) == 100
    assert nodegraph.hash(contig[100:121]) in conns
    assert len(conns) == 1

    # traverse from immediately after 100:121, should end at the end
    size, conns, visited = nodegraph.traverse_linear_path(contig[101:122],
                                                          degree_nodes,
                                                          stopgraph)

    assert size == 879
    assert len(visited) == 879
    assert nodegraph.hash(contig[100:121]) in conns
    assert len(conns) == 1

    # traverse from end, should end at 100:121
    size, conns, visited = nodegraph.traverse_linear_path(contig[-21:],
                                                          degree_nodes,
                                                          stopgraph)

    assert size == 879
    assert len(visited) == 879
    assert nodegraph.hash(contig[100:121]) in conns
    assert len(conns) == 1


def test_traverse_linear_path_3_stopgraph():
    contigfile = utils.get_test_data('simple-genome.fa')
    contig = list(screed_open(contigfile))[0].sequence

    K = 21

    nodegraph = khmer.Nodegraph(K, 1e5, 4)
    stopgraph = khmer.Nodegraph(K, 1e5, 4)

    nodegraph.consume(contig)
    nodegraph.count(contig[101:121] + 'G')  # will add another neighbor

    degree_nodes = nodegraph.find_high_degree_nodes(contig)

    assert len(degree_nodes) == 1
    assert nodegraph.hash(contig[100:121]) in degree_nodes

    stopgraph.count(contig[101:122])       # stop traversal

    size, conns, visited = nodegraph.traverse_linear_path(contig[101:122],
                                                          degree_nodes,
                                                          stopgraph)

    assert size == 0
    assert len(visited) == 0
    assert len(conns) == 0


@pytest.mark.parametrize('ntables,targetsize', [
    (4, 1e5),
    (6, 1e5),
    (8, 1e5),
    (5, 1e6),
    (7, 1e6),
    (9, 1e6),
])
def test_create_matching_nodegraph(ntables, targetsize):
    from khmer_tpu.khmer_args import create_matching_nodegraph

    cg = khmer.Countgraph(31, targetsize, ntables)
    ng = create_matching_nodegraph(cg)
    assert cg.hashsizes() == ng.hashsizes()
