"""Common counting semantics across every table type — ported from the
reference tests/test_tabletype.py + tests/table_fixtures.py (its Layer-1
strategy: one parametrized suite over all sketch classes)."""

import pytest

from khmer_tpu import (Countgraph, Counttable, CyclicCounttable, Nodegraph,
                       Nodetable, QFCounttable, SmallCountgraph,
                       SmallCounttable)
from khmer_tpu.io.fastx import FastxReader

PRIMES_1m = [100003, 1000007]

GRAPH_CLASSES = [Countgraph, SmallCountgraph, Nodegraph]
TABLE_CLASSES = [Counttable, CyclicCounttable, SmallCounttable, Nodetable]
ALL_CLASSES = GRAPH_CLASSES + TABLE_CLASSES + [QFCounttable]


def _build(cls):
    def build(k, *args):
        if cls is QFCounttable:
            return cls(k, 1 << 17)
        if args:
            starting_size, n_tables = args
            return cls(k, starting_size, n_tables)
        return cls(k, primes=PRIMES_1m)

    build.cls = cls
    return build


@pytest.fixture(params=ALL_CLASSES, ids=lambda c: c.__name__)
def AnyTabletype(request):
    return _build(request.param)


@pytest.fixture(params=GRAPH_CLASSES + [Counttable, SmallCounttable,
                                        Nodetable],
                ids=lambda c: c.__name__)
def Tabletype(request):
    return _build(request.param)


def test_presence(AnyTabletype):
    tt = AnyTabletype(12)

    kmer = 'G' * 12
    hashval = tt.hash('G' * 12)

    assert tt.get(kmer) == 0
    assert tt.get(hashval) == 0

    tt.add(kmer)
    assert tt.get(kmer) == 1
    assert tt.get(hashval) == 1

    tt.add(kmer)
    if 'Node' in tt.__class__.__name__:
        assert tt.get(kmer) == 1
        assert tt.get(hashval) == 1
    else:
        assert tt.get(kmer) == 2
        assert tt.get(hashval) == 2


def test_n_occupied(AnyTabletype):
    tt = AnyTabletype(12)

    kmer = 'G' * 12

    assert tt.n_occupied() == 0
    assert tt.n_unique_kmers() == 0

    tt.add(kmer)
    assert tt.n_occupied() == 1
    assert tt.n_unique_kmers() == 1

    tt.add(kmer)
    assert tt.n_occupied() == 1
    assert tt.n_unique_kmers() == 1


def test_get_ksize(AnyTabletype):
    kh = AnyTabletype(22)
    assert kh.ksize() == 22


def test_hash(AnyTabletype):
    kh = AnyTabletype(5)
    x = kh.hash("ATGGC")
    assert isinstance(x, int)


def test_hash_bad_dna(AnyTabletype):
    # hashing of bad dna -> succeeds w/o complaint
    kh = AnyTabletype(5)
    kh.hash("ATGYC")


def test_hash_bad_length(AnyTabletype):
    kh = AnyTabletype(5)

    with pytest.raises(ValueError):
        kh.hash("ATGGGC")

    with pytest.raises(ValueError):
        kh.hash("ATGG")


def test_reverse_hash(AnyTabletype):
    kh = AnyTabletype(5)

    try:
        x = kh.reverse_hash(15)
    except ValueError:
        pytest.skip("reverse_hash not implemented on this table type")

    assert isinstance(x, str)


def test_add_hashval(AnyTabletype):
    kh = AnyTabletype(5)
    x = kh.hash("ATGGC")
    y = kh.add(x)
    assert y

    z = kh.get(x)
    assert z == 1


def test_add_dna_kmer(AnyTabletype):
    kh = AnyTabletype(5)
    x = kh.add("ATGGC")
    assert x

    z = kh.get("ATGGC")
    assert z == 1


def test_get_hashval(AnyTabletype):
    kh = AnyTabletype(5)
    hashval = kh.hash("ATGGC")
    kh.add(hashval)

    z = kh.get(hashval)
    assert z == 1


def test_get_hashval_rc(AnyTabletype):
    kh = AnyTabletype(4)
    hashval = kh.hash("ATGC")
    rc = kh.hash("GCAT")

    assert hashval == rc


def test_consume_and_count(AnyTabletype):
    tt = AnyTabletype(6)

    x = "ATGCCGATGCA"
    num_kmers = tt.consume(x)
    assert num_kmers == len(x) - tt.ksize() + 1

    for start in range(len(x) - 6 + 1):
        assert tt.get(x[start:start + 6]) == 1


def test_consume_short(AnyTabletype):
    tt = AnyTabletype(6)

    with pytest.raises(ValueError):
        tt.consume("AGCTA")


def test_get_kmer_counts(AnyTabletype):
    hi = AnyTabletype(6)

    hi.consume("AAAAAA")
    counts = hi.get_kmer_counts("AAAAAA")
    assert len(counts) == 1
    assert counts[0] == 1

    hi.consume("AAAAAA")
    counts = hi.get_kmer_counts("AAAAAA")
    assert len(counts) == 1
    assert counts[0] >= 1

    hi.consume("AAAAAT")
    counts = hi.get_kmer_counts("AAAAAAT")
    assert len(counts) == 2
    assert counts[0] >= 1
    assert counts[1] == 1


def test_get_kmer_hashes(AnyTabletype):
    hi = AnyTabletype(6)

    hashes = hi.get_kmer_hashes("ACGTGCGT")
    assert len(hashes) == 3
    assert hashes[0] == hi.hash("ACGTGC")
    assert hashes[1] == hi.hash("CGTGCG")
    assert hashes[2] == hi.hash("GTGCGT")


def test_get_min_count(AnyTabletype):
    hi = AnyTabletype(6)

    x = "ATGGCAGTAGCAGTGAGC"

    hi.consume(x[:10])

    count = hi.get_min_count(x)
    assert count == 0

    hi.consume(x)
    count = hi.get_min_count(x)
    assert count == 1


def test_get_kmers(AnyTabletype):
    hi = AnyTabletype(6)

    kmers = hi.get_kmers("AAAAAA")
    assert kmers == ["AAAAAA"]

    kmers = hi.get_kmers("AAAAAAT")
    assert kmers == ["AAAAAA", "AAAAAT"]

    kmers = hi.get_kmers("AGCTTTTC")
    assert kmers == ['AGCTTT', 'GCTTTT', 'CTTTTC']


def test_trim_on_abundance(AnyTabletype):
    hi = AnyTabletype(6)

    x = "ATGGCAGTAGCAGTGAGC"
    hi.consume(x[:10])

    (y, pos) = hi.trim_on_abundance(x, 1)
    assert pos == 10
    assert x[:pos] == y


def test_trim_below_abundance(AnyTabletype):
    hi = AnyTabletype(6)

    x = "ATGGCAGTAGCAGTGAGC"
    x_rc = x[::-1].translate(str.maketrans("ACGT", "TGCA"))
    hi.consume(x_rc[:10])

    (y, pos) = hi.trim_below_abundance(x, 0)
    assert pos == len(x) - hi.ksize() + 1
    assert x[:pos] == y


DNA = ("AGCTTTTCATTCTGACTGCAACGGGCAATATGTCTCTGTGTGGATTAAAAAAAGAGTGTCTGATAG"
       "CAGC")


def test_find_spectral_error_positions(AnyTabletype):
    kh = AnyTabletype(8)
    kh.consume(DNA[:30])
    posns = kh.find_spectral_error_positions(DNA, 0)
    assert posns == [30], posns


def test_find_spectral_error_positions_6(AnyTabletype):
    kh = AnyTabletype(8)
    kh.consume(DNA[1:])
    posns = kh.find_spectral_error_positions(DNA, 0)
    assert posns == [0], posns


def test_find_spectral_error_positions_5(AnyTabletype):
    kh = AnyTabletype(8)
    kh.consume(DNA[:10])
    kh.consume(DNA[11:])
    posns = kh.find_spectral_error_positions(DNA, 0)
    assert posns == [10], posns


def test_consume_seqfile(AnyTabletype, ref_test_data):
    kh = AnyTabletype(5)
    kh.consume_seqfile(ref_test_data + '/test-fastq-reads.fq')

    kh2 = AnyTabletype(5)
    for record in FastxReader(ref_test_data + '/test-fastq-reads.fq'):
        kh2.consume(record.cleaned_seq)

    assert kh.get('CCGGC') == kh2.get('CCGGC')


def test_save_load(Tabletype, tmp_path):
    kh = Tabletype(5)
    kh.consume('ATGGCAGTAGCAGTGAGC')
    path = str(tmp_path / 'table')
    kh.save(path)

    loaded = Tabletype.cls.load(path)
    assert loaded.ksize() == 5
    for kmer in kh.get_kmers('ATGGCAGTAGCAGTGAGC'):
        assert loaded.get(kmer) == kh.get(kmer)


# -- round 3: remaining reference test_tabletype.py cases.

from khmer_tpu import ReadParser  # noqa: E402

from . import khmer_tst_utils as utils  # noqa: E402

QF_SIZE = 1 << 17


def test_add_bad_dna_kmer(AnyTabletype):
    # even with 'bad' dna, should succeed (cleaned to A)
    kh = AnyTabletype(5)

    kh.add("ATYGC")


def test_get_bad_dna_kmer(AnyTabletype):
    # hash(dna) with bad dna; should be fine
    kh = AnyTabletype(5)

    kh.hash("ATYGC")


def test_get_dna_kmer(AnyTabletype):
    kh = AnyTabletype(5)
    hashval = kh.hash("ATGGC")
    kh.add(hashval)

    z = kh.get("ATGGC")
    assert z == 1


def test_bad_create(Tabletype):
    # creation should fail w/bad parameters
    try:
        Tabletype.cls(5, primes=[])
    except ValueError as err:
        assert 'tablesizes needs to be one or more numbers' in str(err)


def test_consume_and_count_bad_dna(AnyTabletype):
    # bad DNA is cleaned consistently on consume and on get
    tt = AnyTabletype(6)

    x = "ATGCCGNTGCA"
    tt.consume(x)

    for start in range(len(x) - 6 + 1):
        assert tt.get(x[start:start + 6]) == 1


def test_consume_seqfile_reads_parser(AnyTabletype):
    kh = AnyTabletype(5)
    rparser = ReadParser(utils.get_test_data('test-fastq-reads.fq'))

    kh.consume_seqfile(rparser)

    kh2 = AnyTabletype(5)
    for record in utils.screed_open(
            utils.get_test_data('test-fastq-reads.fq')):
        kh2.consume(record.sequence)

    assert kh.get('CCGGC') == kh2.get('CCGGC')


def test_get_bigcount(Tabletype):
    # get_use_bigcount should return false by default
    tt = Tabletype(12)

    assert not tt.get_use_bigcount()


def test_set_bigcount(Tabletype):
    supports_bigcount = [Countgraph, Counttable, CyclicCounttable]
    tt = Tabletype(12)

    if type(tt) in supports_bigcount:
        tt.set_use_bigcount(True)

        for _ in range(300):
            tt.add('G' * 12)
        assert tt.get('G' * 12) == 300

    else:
        with pytest.raises(ValueError):
            tt.set_use_bigcount(True)


def test_hashsizes(AnyTabletype):
    kh = AnyTabletype(5)
    assert (kh.hashsizes() == PRIMES_1m or
            # QF allocates slots beyond what you request; exactly how
            # many is an implementation detail
            kh.hashsizes()[0] >= QF_SIZE)


def test_abund_dist_A(AnyTabletype):
    A_filename = utils.get_test_data('all-A.fa')

    kh = AnyTabletype(4)
    tracking = Nodegraph(4, 1, 1, primes=PRIMES_1m)

    kh.consume_seqfile(A_filename)
    dist = kh.abundance_distribution(A_filename, tracking)

    assert sum(dist) == 1
    assert dist[0] == 0


def test_abund_dist_A_readparser(AnyTabletype):
    A_filename = utils.get_test_data('all-A.fa')
    rparser = ReadParser(A_filename)

    kh = AnyTabletype(4)
    tracking = Nodegraph(4, 1, 1, primes=PRIMES_1m)

    kh.consume_seqfile(A_filename)
    dist = kh.abundance_distribution(rparser, tracking)

    assert sum(dist) == 1
    assert dist[0] == 0
