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
