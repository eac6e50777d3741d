"""Sequence-validation semantics, ported from the reference
tests/test_sequence_validation.py: cleaned_seq vs raw consume, trim
functions over lowercase/N/bad DNA, partition output with dirty
reads."""

import pytest

import khmer_tpu as khmer
from khmer_tpu import ReadParser

from .conftest import REF_TEST_DATA

COUNTING_TYPES = [khmer.Countgraph, khmer.Counttable,
                  khmer.SmallCountgraph, khmer.SmallCounttable]
ALL_TYPES = COUNTING_TYPES + [khmer.Nodegraph, khmer.Nodetable]
GRAPH_TYPES = [khmer.Countgraph, khmer.Nodegraph]


@pytest.fixture(params=COUNTING_TYPES)
def countingtype(request):
    return request.param


@pytest.fixture(params=ALL_TYPES)
def anytabletype(request):
    return request.param


@pytest.fixture(params=GRAPH_TYPES)
def graphtype(request):
    return request.param


def _infile():
    import os
    return os.path.join(REF_TEST_DATA, 'valid-read-testing.fq')


def test_read_cleaning_consume_seqfile(countingtype):
    x = countingtype(15, 1e6, 2)
    x.consume_seqfile(_infile())

    # the relevant read will automatically get uppercased
    assert x.get("caggcgcccaccacc".upper()) == 2
    # the 2nd read with this k-mer in it has an N in it.
    assert x.get("CCTCATCGGCACCAG") == 2
    # the 2nd read with this k-mer in it has a Z in it
    assert x.get("ACTGAGCTTCATGTC") == 2


def test_read_cleaning_consume_read_by_read(countingtype):
    x = countingtype(15, 1e6, 2)
    for read in ReadParser(_infile()):
        x.consume(read.sequence)          # consume raw sequence

    # raw consume does not uppercase: lowercase read ignored
    assert x.get("caggcgcccaccacc".upper()) == 1
    # the k-mers themselves contain no invalid bases -> counted twice
    assert x.get("CCTCATCGGCACCAG") == 2
    assert x.get("ACTGAGCTTCATGTC") == 2


def test_read_cleaning_consume_read_by_read_cleaned_seq(countingtype):
    x = countingtype(15, 1e6, 2)
    for read in ReadParser(_infile()):
        x.consume(read.cleaned_seq)       # consume cleaned_seq

    assert x.get("caggcgcccaccacc".upper()) == 2
    assert x.get("CCTCATCGGCACCAG") == 2
    assert x.get("ACTGAGCTTCATGTC") == 2


def test_read_cleaning_abundance_distribution(countingtype):
    x = countingtype(15, 1e6, 2)
    y = khmer.Nodegraph(15, 1e6, 2)

    x.consume_seqfile(_infile())

    dist = x.abundance_distribution(_infile(), y)
    assert dist[1] == 35                  # k-mers with non-ACGTN => ignored.
    assert dist[2] == 69


def test_read_cleaning_trim_functions_lowercase(countingtype):
    x = countingtype(8, 1e6, 2)
    for read in ReadParser(_infile()):
        x.consume(read.cleaned_seq)

    # these will do nothing, b/c lowercase != valid; but no exception
    s = "caggcgcccaccaccgtgccctccaacctgatggt"
    _, where = x.trim_on_abundance(s, 1)
    assert where == 0

    _, where = x.trim_below_abundance(s, 0)
    assert where == 35                    # stays at 35 (abunds all == 0)

    posns = x.find_spectral_error_positions(s, 1)
    assert posns == []


def test_read_cleaning_trim_functions_N(countingtype):
    x = countingtype(8, 1e6, 2)
    for read in ReadParser(_infile()):
        x.consume(read.cleaned_seq)

    s = "ACTGGGCGTAGNCGGTGTCCTCATCGGCACCAGC"
    _, where = x.trim_on_abundance(s, 1)
    assert where == 11

    _, where = x.trim_below_abundance(s, 2)
    assert where == 34

    posns = x.find_spectral_error_positions(s, 1)
    assert posns == [11]


def test_read_cleaning_trim_functions_bad_dna(countingtype):
    x = countingtype(8, 1e6, 2)
    for read in ReadParser(_infile()):
        x.consume(read.cleaned_seq)

    # behavior with non-ACGT is hash-function-specific; only require
    # that nothing before the bad DNA is flagged
    s = "CCGGCGTGGTTZZYAGGTCACTGAGCTTCATGTC"
    _, where = x.trim_on_abundance(s, 1)
    assert where >= 11

    _, where = x.trim_below_abundance(s, 2)
    assert where >= 11

    posns = x.find_spectral_error_positions(s, 1)
    for p in posns:
        assert p >= 11


def test_read_cleaning_output_partitions(tmp_path):
    infile = _infile()
    savepath = str(tmp_path / 'foo')

    x = khmer.Nodegraph(8, 1e6, 2)
    for read in ReadParser(infile):
        x.consume(read.cleaned_seq)

    kmer = 'caggcgcc'.upper()
    x.add_tag(kmer)
    x.set_partition_id(kmer, 1)

    kmer = 'ACTGGGCG'
    x.add_tag(kmer)
    x.set_partition_id(kmer, 2)

    kmer = 'CCGGCGTG'
    x.add_tag(kmer)
    x.set_partition_id(kmer, 3)

    x.output_partitions(infile, savepath)

    read_names = [read.name for read in ReadParser(savepath)]
    assert len(read_names) == 6

    assert '895:1:1:1246:14654 1:N:0:NNNNN\t1\t1' in read_names
    assert '895:1:1:1248:9583 1:N:0:NNNNN\t2\t2' in read_names
    assert '895:1:1:1252:19493 1:N:0:NNNNN\t3\t3' in read_names

    assert 'lowercase_to_uppercase\t5\t1' in read_names
    assert 'n_in_read\t6\t2' in read_names
    assert 'zy_in_read\t7\t3' in read_names


def test_read_cleaning_trim_on_stoptags(graphtype):
    x = graphtype(8, 1e6, 2)
    for read in ReadParser(_infile()):
        x.consume(read.cleaned_seq)

    x.add_stop_tag('caggcgcc'.upper())
    x.add_stop_tag('ACTGGGCG')
    x.add_stop_tag('CCGGCGTG')

    _, pos = x.trim_on_stoptags('caggcgcccaccaccgtgccctccaacctgatggt')
    assert pos == 35                      # no stoptag b/c lowercase

    _, pos = x.trim_on_stoptags('ACTGGGCGTAGNCGGTGTCCTCATCGGCACCAGC')
    assert pos == 6                       # N ignored

    _, pos = x.trim_on_stoptags('CCGGCGTGGTTZZYAGGTCACTGAGCTTCATGTC')
    assert pos == 6                       # ZZY ignored


def test_consume_seqfile_and_tag(graphtype):
    x = graphtype(8, 1e6, 2)
    x.consume_seqfile_and_tag(_infile())
    _, n_tags = x.count_partitions()
    assert n_tags == 5                    # total # of tags


def test_consume_partitioned_seqfile(graphtype):
    x = graphtype(15, 1e6, 2)
    x.consume_partitioned_fasta(_infile())
    n_partitions, n_tags = x.count_partitions()
    assert n_partitions == 6
    assert n_tags == 0


def test_output_partitioned_file(graphtype, tmp_path):
    infile = _infile()
    savepath = str(tmp_path / 'foo')

    x = graphtype(15, 1e6, 2)
    x.consume_partitioned_fasta(infile)
    x.output_partitions(infile, savepath)

    read_names = set(read.name for read in ReadParser(savepath))

    good_names = {'895:1:1:1246:14654 1:N:0:NNNNN\t1\t5',
                  '895:1:1:1248:9583 1:N:0:NNNNN\t2\t6',
                  '895:1:1:1252:19493 1:N:0:NNNNN\t3\t3',
                  '895:1:1:1255:18861 1:N:0:NNNNN\t4\t8',
                  'lowercase_to_uppercase\t5\t5',
                  '895:1:1:1255:18861 1:N:0:NNNNN\t8\t8',
                  'n_in_read\t6\t6',
                  'zy_in_read\t7\t7',
                  'bad_dna_in_beginning\t9\t9'}

    assert good_names == read_names
