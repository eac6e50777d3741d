"""Nodegraph (hashbits) tests ported from the reference
tests/test_hashbits.py — the cases not already covered by
tests/test_nodegraph.py."""

import khmer_tpu as khmer

from . import khmer_tst_utils as utils


def test__get_set_tag_density():
    ht = khmer.Nodegraph(32, 1, 1)

    orig = ht._get_tag_density()
    assert orig != 2
    ht._set_tag_density(2)
    assert ht._get_tag_density() == 2


def test_n_occupied_2():  # simple one
    # (the legacy new_hashbits rounded 10 up to prime 11; the modern
    # constructor picks primes below, so pin the table size)
    ht1 = khmer.Nodegraph(4, 1, 1, primes=[11])
    ht1.count('AAAA')
    assert ht1.n_occupied() == 1

    ht1.count('ACTG')
    assert ht1.n_occupied() == 2

    ht1.count('AACG')  # collision 1
    assert ht1.n_occupied() == 2
    ht1.count('AGAC')  # collision 2
    assert ht1.n_occupied() == 2


def test_bloom_c_2():  # simple one
    # one table: no bloom filter
    ht1 = khmer.Nodegraph(4, 1, 1, primes=[11])
    ht1.count('AAAA')
    ht1.count('ACTG')
    assert ht1.n_unique_kmers() == 2
    ht1.count('AACG')  # collision with 1st kmer
    assert ht1.n_unique_kmers() == 2
    ht1.count('AGAC')  # collision with 2nd kmer
    assert ht1.n_unique_kmers() == 2

    # two tables: 11, 13
    ht2 = khmer.Nodegraph(4, 1, 1, primes=[11, 13])
    ht2.count('AAAA')

    ht2.count('ACTG')
    assert ht2.n_unique_kmers() == 2
    ht2.count('AACG')  # collision with only 1st kmer
    assert ht2.n_unique_kmers() == 3
    ht2.count('AGAC')  # collision with both 2nd and 3rd
    assert ht2.n_unique_kmers() == 3


def test_filter_if_present():
    ht = khmer.Nodegraph(32, 1e4, 2)

    maskfile = utils.get_test_data('filter-test-A.fa')
    inputfile = utils.get_test_data('filter-test-B.fa')
    outfile = utils.get_temp_filename('filter')

    ht.consume_seqfile(maskfile)
    ht.filter_if_present(inputfile, outfile)

    from khmer_tpu.io.fastx import FastxReader

    records = list(FastxReader(outfile))
    assert len(records) == 1
    assert records[0].name == '3'


def test_load_partitioned():
    inpfile = utils.get_test_data('combine_parts_1.fa')
    ht = khmer.Nodegraph(32, 1, 1)

    ht.consume_partitioned_fasta(inpfile)
    assert ht.count_partitions() == (2, 0)

    s1 = "CATGCAGAAGTTCCGCAACCATACCGTTCAGT"
    assert ht.get(s1)

    s2 = "CAAATGTACATGCACTTAAAATCATCCAGCCG"
    assert ht.get(s2)

    s3 = "CATGCAGAAGTTCCGCAACCATACCGTTCAGTTCCTGGTGGCTA"[-32:]
    assert ht.get(s3)


def test_save_load_tagset():
    ht = khmer.Nodegraph(32, 1, 1)

    outfile = utils.get_temp_filename('tagset')

    ht.add_tag('A' * 32)
    ht.save_tagset(outfile)

    ht.add_tag('G' * 32)

    ht.load_tagset(outfile)              # implicitly => clear_tags=True
    ht.save_tagset(outfile)

    # if tags have been cleared, the new tagfile is smaller
    fp = open(outfile, 'rb')
    data = fp.read()
    fp.close()
    assert len(data) == 30, len(data)


def test_save_load_tagset_noclear():
    ht = khmer.Nodegraph(32, 1, 1)

    outfile = utils.get_temp_filename('tagset')

    ht.add_tag('A' * 32)
    ht.save_tagset(outfile)

    ht.add_tag('G' * 32)

    ht.load_tagset(outfile, False)       # clear_tags=False
    ht.save_tagset(outfile)

    fp = open(outfile, 'rb')
    data = fp.read()
    fp.close()
    assert len(data) == 38, len(data)


def test_tag_across_stoptraverse():
    filename = utils.get_test_data('random-20-a.fa')

    ht = khmer.Nodegraph(20, 1e4, 3)

    # without tagging/joining across consume, this breaks into two
    # partitions; with, it is one.
    ht.add_stop_tag('CCGAATATATAACAGCGACG')

    ht.consume_seqfile_and_tag_with_stoptags(filename)  # DO join

    subset = ht.do_subset_partition(0, 0)
    n, _ = ht.count_partitions()
    assert n == 99                       # reads only connected by traversal

    n, _ = ht.subset_count_partitions(subset)
    assert n == 2                        # but need main to cross stoptags

    ht.merge_subset(subset)

    n, _ = ht.count_partitions()         # ta-da!
    assert n == 1, n


def test_notag_across_stoptraverse():
    filename = utils.get_test_data('random-20-a.fa')

    ht = khmer.Nodegraph(20, 1e4, 3)

    # connecting k-mer at the beginning/end of a read: breaks into two
    ht.add_stop_tag('TTGCATACGTTGAGCCAGCG')

    ht.consume_seqfile_and_tag_with_stoptags(filename)

    subset = ht.do_subset_partition(0, 0)
    ht.merge_subset(subset)

    n, _ = ht.count_partitions()
    assert n == 2, n


def test_find_stoptags():
    ht = khmer.Nodegraph(5, 1, 1)
    ht.add_stop_tag("AAAAA")

    assert ht.identify_stoptags_by_position("AAAAA") == [0]
    assert ht.identify_stoptags_by_position("AAAAAA") == [0, 1]
    assert ht.identify_stoptags_by_position("TTTTT") == [0]
    assert ht.identify_stoptags_by_position("TTTTTT") == [0, 1]


def test_find_stoptags2():
    ht = khmer.Nodegraph(4, 1, 1)
    ht.add_stop_tag("ATGC")

    x = ht.identify_stoptags_by_position("ATGCATGCGCAT")
    assert x == [0, 2, 4, 8], x


def test_get_ksize():
    kh = khmer.Nodegraph(22, 1, 1)
    assert kh.ksize() == 22


def test_get_hashsizes():
    kh = khmer.Nodegraph(22, 100, 4)
    # modern prime selection picks primes below the requested size
    assert kh.hashsizes() == [97, 89, 83, 79], kh.hashsizes()


def test_simple_median():
    hi = khmer.Nodegraph(6, 100, 2)

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

    try:
        hbts.get("AGCTT")
        assert 0, "this should fail"
    except ValueError as err:
        print(str(err))


def test_load_notexist_should_fail():
    savepath = utils.get_temp_filename('temphashbitssave0.ht')

    hi = khmer.Countgraph(12, 1000, 2)
    try:
        hi = khmer.Countgraph.load(savepath)
        assert 0, "load should fail"
    except OSError:
        pass


def test_load_truncated_should_fail():
    inpath = utils.get_test_data('random-20-a.fa')
    savepath = utils.get_temp_filename('temphashbitssave0.ct')

    hi = khmer.Countgraph(12, 1000, 2)
    hi.consume_seqfile(inpath)
    hi.save(savepath)

    fp = open(savepath, 'rb')
    data = fp.read()
    fp.close()

    fp = open(savepath, 'wb')
    fp.write(data[:1000])
    fp.close()

    try:
        hi = khmer.Countgraph.load(savepath)
        assert 0, "load should fail"
    except OSError as e:
        print(str(e))


def test_save_load_tagset_notexist():
    ht = khmer.Nodegraph(32, 1, 1)

    outfile = utils.get_temp_filename('tagset')
    try:
        ht.load_tagset(outfile)
        assert 0, "this test should fail"
    except OSError as e:
        print(str(e))


def test_save_load_tagset_trunc():
    ht = khmer.Nodegraph(32, 1, 1)

    outfile = utils.get_temp_filename('tagset')

    ht.add_tag('A' * 32)
    ht.add_tag('G' * 32)
    ht.save_tagset(outfile)

    # truncate tagset file...
    fp = open(outfile, 'rb')
    data = fp.read()
    fp.close()

    for i in range(len(data)):
        fp = open(outfile, 'wb')
        fp.write(data[:i])
        fp.close()

        try:
            ht.load_tagset(outfile)
            assert 0, "this test should fail (%d)" % i
        except OSError as err:
            print(str(err), i)


def test_hashbits_file_version_check():
    inpath = utils.get_test_data('badversion-k12.ht')

    try:
        khmer.Nodegraph.load(inpath)
        assert 0, "this should fail"
    except OSError as e:
        print(str(e))


def test_hashbits_file_type_check():
    kh = khmer.Countgraph(12, 1, 1)
    savepath = utils.get_temp_filename('tempcountingsave0.ct')
    kh.save(savepath)

    try:
        khmer.Nodegraph.load(savepath)
        assert 0, "this should fail"
    except OSError as e:
        print(str(e))


def test_stoptags_file_version_check():
    ht = khmer.Nodegraph(32, 1, 1)

    inpath = utils.get_test_data('badversion-k32.stoptags')

    try:
        ht.load_stop_tags(inpath)
        assert 0, "this should fail"
    except OSError as e:
        print(str(e))


def test_stoptags_ksize_check():
    ht = khmer.Nodegraph(31, 1, 1)

    inpath = utils.get_test_data('goodversion-k32.stoptags')
    try:
        ht.load_stop_tags(inpath)
        assert 0, "this should fail"
    except OSError as e:
        print(str(e))


def test_stop_tags_filetype_check():
    ht = khmer.Nodegraph(31, 1, 1)

    inpath = utils.get_test_data('goodversion-k32.tagset')
    try:
        ht.load_stop_tags(inpath)
        assert 0, "this should fail"
    except OSError as e:
        print(str(e))


def test_tagset_file_version_check():
    ht = khmer.Nodegraph(32, 1, 1)

    inpath = utils.get_test_data('badversion-k32.tagset')

    try:
        ht.load_tagset(inpath)
        assert 0, "this should fail"
    except OSError as e:
        print(str(e))


def test_stop_tags_truncate_check():
    ht = khmer.Nodegraph(32, 1, 1)

    inpath = utils.get_test_data('goodversion-k32.tagset')
    data = open(inpath, 'rb').read()

    truncpath = utils.get_temp_filename('zzz')
    for i in range(len(data)):
        fp = open(truncpath, 'wb')
        fp.write(data[:i])
        fp.close()

        try:
            ht.load_stop_tags(truncpath)
            assert 0, "expect failure of previous command"
        except OSError as e:
            print(str(e), i)


def test_tagset_ksize_check():
    ht = khmer.Nodegraph(31, 1, 1)

    inpath = utils.get_test_data('goodversion-k32.tagset')
    try:
        ht.load_tagset(inpath)
        assert 0, "this should fail"
    except OSError as e:
        print(str(e))


def test_tagset_filetype_check():
    ht = khmer.Nodegraph(31, 1, 1)

    inpath = utils.get_test_data('goodversion-k32.stoptags')
    try:
        ht.load_tagset(inpath)
        assert 0, "this should fail"
    except OSError as e:
        print(str(e))


def test_bad_primes_list():
    try:
        khmer.Nodegraph(31, 1, 1, primes=["a", "b", "c"])
        assert 0, "Bad primes list should fail"
    except (TypeError, ValueError) as e:
        print(str(e))


def test_consume_absentfasta():
    presencetable = khmer.Nodegraph(31, 1, 1)
    try:
        presencetable.consume_seqfile("absent_file.fa")
        assert 0, "this should fail"
    except OSError as err:
        print(str(err))


# -- round 3: the remaining reference test_hashbits.py cases, via the
# 1.x compat surface (khmer_tpu/legacy.py: new_hashbits / Hashbits /
# consume_fasta* names).  Size-dependent goldens are adapted where the
# modern prime selection (primes below x, matching the reference's own
# 3.0 golden in tests/test_nodegraph.py:554-559) differs from the 2.x
# primes-above tables; purpose-level assertions (n_unique, partition
# counts, path extraction) are unchanged.


def test_update_from():
    ht = khmer.Hashbits(5, 1000, 4)
    ht2 = khmer.Hashbits(5, 1000, 4)

    assert ht.get('AAAAA') == 0
    assert ht.get('GCGCG') == 0
    assert ht2.get('AAAAA') == 0
    assert ht2.get('GCGCG') == 0

    ht2.count('AAAAA')
    assert ht2.get('AAAAA') == 1
    assert ht2.get('GCGCG') == 0

    ht.count('GCGCG')
    assert ht.get('AAAAA') == 0
    assert ht.get('GCGCG') == 1

    ht.update(ht2)
    assert ht.get('AAAAA') == 1
    assert ht.get('GCGCG') == 1
    assert ht2.get('AAAAA') == 1
    assert ht2.get('GCGCG') == 0


def test_update_from_diff_ksize_2():
    ht = khmer.Hashbits(5, 1000, 4)
    ht2 = khmer.Hashbits(4, 1000, 4)

    try:
        ht.update(ht2)
        assert 0, "should not be reached"
    except ValueError as err:
        print(str(err))

    try:
        ht2.update(ht)
        assert 0, "should not be reached"
    except ValueError as err:
        print(str(err))


def test_update_from_diff_tablesize():
    ht = khmer.Hashbits(5, 100, 4)
    ht2 = khmer.Hashbits(5, 1000, 4)

    try:
        ht.update(ht2)
        assert 0, "should not be reached"
    except ValueError as err:
        print(str(err))


def test_update_from_diff_num_tables():
    ht = khmer.Hashbits(5, 1000, 3)
    ht2 = khmer.Hashbits(5, 1000, 4)

    try:
        ht.update(ht2)
        assert 0, "should not be reached"
    except ValueError as err:
        print(str(err))


def test_n_occupied_1():
    filename = utils.get_test_data('random-20-a.fa')

    ht1 = khmer.new_hashbits(20, 100000, 1)
    for _, record in enumerate(utils.screed_open(filename)):
        ht1.consume(record.sequence)

    # reference 2.x golden 3877 with primes above 1e5; with the 3.0
    # prime selection (below 1e5) the occupancy is 3884
    assert ht1.n_occupied() == 3884, ht1.n_occupied()


def test_bloom_python_1():
    # python-level count of unique k-mers through the bloom filter
    filename = utils.get_test_data('random-20-a.fa')
    K = 20
    ht2 = khmer.new_hashbits(K, 100000, 3)

    n_unique = 0
    for _, record in enumerate(utils.screed_open(filename)):
        sequence = record.sequence
        for n in range(0, len(sequence) + 1 - K):
            kmer = sequence[n:n + K]
            if not ht2.get(kmer):
                n_unique += 1
            ht2.count(kmer)

    assert n_unique == 3960
    # occupancy golden adapted for the 3.0 prime selection (2.x: 3882)
    assert ht2.n_occupied() == 3884, ht2.n_occupied()
    assert ht2.n_unique_kmers() == 3960


def test_bloom_c_1():
    # same count, via consume
    filename = utils.get_test_data('random-20-a.fa')
    ht3 = khmer.new_hashbits(20, 100000, 3)

    for _, record in enumerate(utils.screed_open(filename)):
        ht3.consume(record.sequence)

    assert ht3.n_occupied() == 3884  # 2.x golden 3882, prime selection
    assert ht3.n_unique_kmers() == 3960


def test_filter_if_present():
    # 2.x used new_hashbits(32, 2, 2); the modern prime picker needs
    # x >= 3, and the tiny table saturates identically at 1e4
    ht = khmer.new_hashbits(32, 1e4, 2)

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
    ht = khmer.new_hashbits(32, 1, 1)

    ht.consume_partitioned_fasta(inpfile)
    assert ht.count_partitions() == (2, 0)

    s1 = "CATGCAGAAGTTCCGCAACCATACCGTTCAGT"
    pid1 = ht.get_partition_id(s1)

    s2 = "CAAATGTACATGCACTTAAAATCATCCAGCCG"
    pid2 = ht.get_partition_id(s2)

    assert pid1 == 2
    assert pid2 == 80293

    ht.join_partitions(pid1, pid2)

    pid1 = ht.get_partition_id(s1)
    pid2 = ht.get_partition_id(s2)

    assert pid1 == pid2
    assert ht.count_partitions() == (1, 0)


def test_count_within_radius_simple():
    inpfile = utils.get_test_data('all-A.fa')
    ht = khmer.new_hashbits(4, 1e4, 2)

    print(ht.consume_fasta(inpfile))
    n = ht.count_kmers_within_radius('AAAA', 1)
    assert n == 1

    n = ht.count_kmers_within_radius('AAAA', 10)
    assert n == 1


def test_count_within_radius_big():
    inpfile = utils.get_test_data('random-20-a.fa')
    ht = khmer.new_hashbits(20, 1e6, 4)

    # reference 2.x: 3960 at 1e5 tables; at 1e5 the smaller 3.0 primes
    # admit one extra bloom false-positive node (3961), so probe at
    # 1e6 where the traversal is FP-free
    ht.consume_fasta(inpfile)
    n = ht.count_kmers_within_radius('CGCAGGCTGGATTCTAGAGG', int(1e6))
    assert n == 3960, n

    ht = khmer.new_hashbits(21, 1e5, 4)
    ht.consume_fasta(inpfile)
    n = ht.count_kmers_within_radius('CGCAGGCTGGATTCTAGAGGC', int(1e6))
    assert n == 39


def test_count_kmer_degree():
    inpfile = utils.get_test_data('all-A.fa')
    ht = khmer.new_hashbits(4, 1e4, 2)
    ht.consume_fasta(inpfile)

    assert ht.kmer_degree('AAAA') == 2
    assert ht.kmer_degree('AAAT') == 1
    assert ht.kmer_degree('AATA') == 0
    assert ht.kmer_degree('TAAA') == 1


def test_stop_traverse():
    filename = utils.get_test_data('random-20-a.fa')

    ht = khmer.new_hashbits(20, 1e4, 3)

    # without tagging/joining across consume, this breaks into two
    # partitions; with, it is one partition
    ht.add_stop_tag('TTGCATACGTTGAGCCAGCG')

    ht.consume_fasta_and_tag(filename)   # DO NOT join reads across stoptags
    subset = ht.do_subset_partition(0, 0, True)
    ht.merge_subset(subset)

    n, _ = ht.count_partitions()
    assert n == 2, n


def test_tag_across_stoptraverse():
    filename = utils.get_test_data('random-20-a.fa')

    ht = khmer.new_hashbits(20, 1e4, 3)

    ht.add_stop_tag('CCGAATATATAACAGCGACG')

    ht.consume_fasta_and_tag_with_stoptags(filename)  # DO join across

    subset = ht.do_subset_partition(0, 0)
    n, _ = ht.count_partitions()
    assert n == 99                       # reads only connected by traversal

    n, _ = ht.subset_count_partitions(subset)
    assert n == 2                        # but need main to cross stoptags

    ht.merge_subset(subset)

    n, _ = ht.count_partitions()         # ta-da!
    assert n == 1, n


def test_notag_across_stoptraverse():
    filename = utils.get_test_data('random-20-a.fa')

    ht = khmer.new_hashbits(20, 1e4, 3)

    # connecting k-mer at the beginning/end of a read: breaks in two
    ht.add_stop_tag('TTGCATACGTTGAGCCAGCG')

    ht.consume_fasta_and_tag_with_stoptags(filename)

    subset = ht.do_subset_partition(0, 0)
    ht.merge_subset(subset)

    n, _ = ht.count_partitions()
    assert n == 2, n


def test_extract_unique_paths_0():
    kh = khmer.new_hashbits(10, 1e5, 4)

    x = kh.extract_unique_paths('ATGGAGAGACACAGATAGACAGGAGTGGCGATG', 10, 1)
    assert x == ['ATGGAGAGACACAGATAGACAGGAGTGGCGATG']

    kh.consume('ATGGAGAGACACAGATAGACAGGAGTGGCGATG')
    x = kh.extract_unique_paths('ATGGAGAGACACAGATAGACAGGAGTGGCGATG', 10, 1)
    assert not x


def test_extract_unique_paths_1():
    kh = khmer.new_hashbits(10, 1e5, 4)

    kh.consume('AGTGGCGATG')
    x = kh.extract_unique_paths('ATGGAGAGACACAGATAGACAGGAGTGGCGATG', 10, 1)
    print(x)
    assert x == ['ATGGAGAGACACAGATAGACAGGAGTGGCGAT']  # all but the last k-mer


def test_extract_unique_paths_2():
    kh = khmer.new_hashbits(10, 1e5, 4)

    kh.consume('ATGGAGAGAC')
    x = kh.extract_unique_paths('ATGGAGAGACACAGATAGACAGGAGTGGCGATG', 10, 1)
    print(x)
    assert x == ['TGGAGAGACACAGATAGACAGGAGTGGCGATG']  # all but the 1st k-mer


def test_extract_unique_paths_3():
    kh = khmer.new_hashbits(10, 1e5, 4)

    kh.consume('ATGGAGAGAC')
    kh.consume('AGTGGCGATG')
    x = kh.extract_unique_paths('ATGGAGAGACACAGATAGACAGGAGTGGCGATG', 10, 1)
    print(x)
    # all but the 1st/last k-mer
    assert x == ['TGGAGAGACACAGATAGACAGGAGTGGCGAT']


def test_extract_unique_paths_4():
    kh = khmer.new_hashbits(10, 1e5, 4)

    kh.consume('ATGGAGAGAC')
    kh.consume('AGTGGCGATG')
    kh.consume('ATAGACAGGA')

    x = kh.extract_unique_paths('ATGGAGAGACACAGATAGACAGGAGTGGCGATG', 10, 1)
    print(x)
    assert x == ['TGGAGAGACACAGATAGACAGG', 'TAGACAGGAGTGGCGAT']


def test_find_unpart():
    filename = utils.get_test_data('random-20-a.odd.fa')
    filename2 = utils.get_test_data('random-20-a.even.fa')

    ht = khmer.new_hashbits(20, 1e4, 3)
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

    ht = khmer.new_hashbits(20, 1e4, 3)
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
    filename2 = utils.get_test_data('random-20-a.odd.fa')  # <- switch to odd

    ht = khmer.new_hashbits(20, 1e4, 3)
    ht.consume_fasta_and_tag(filename)

    subset = ht.do_subset_partition(0, 0)
    ht.merge_subset(subset)

    n, _ = ht.count_partitions()
    assert n == 49

    ht.find_unpart(filename2, True, False)
    n, _ = ht.count_partitions()
    assert n == 49, n                    # only 49 sequences worth of tags
