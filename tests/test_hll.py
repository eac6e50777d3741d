"""HyperLogLog tests — ported from the reference tests/test_hll.py."""

import pytest

import khmer_tpu as khmer
from khmer_tpu.io.fastx import FastxReader

K = 20
ERR_RATE = 0.01
N_UNIQUE = 3960


def test_hll_add_python(ref_test_data):
    # count unique canonical k-mers with the low-level add() and compare
    # to an exact set count
    filename = ref_test_data + "/random-20-a.fa"
    hllcpp = khmer.HLLCounter(ERR_RATE, K)
    counter = set()
    tt = str.maketrans("ACGT", "TGCA")

    for record in FastxReader(filename):
        sequence = record.sequence
        for n in range(0, len(sequence) + 1 - K):
            kmer = sequence[n: n + K]
            rc = kmer[::-1].translate(tt)
            hllcpp.add(kmer)
            if rc in counter:
                kmer = rc
            counter.add(kmer)

    assert len(counter) == N_UNIQUE
    assert abs(1 - float(hllcpp.estimate_cardinality()) / N_UNIQUE) < \
        ERR_RATE


def test_hll_consume_string(ref_test_data):
    filename = ref_test_data + "/random-20-a.fa"
    hllcpp = khmer.HLLCounter(ERR_RATE, K)
    for record in FastxReader(filename):
        hllcpp.consume_string(record.sequence)
    assert abs(1 - float(hllcpp.estimate_cardinality()) / N_UNIQUE) < \
        ERR_RATE


def test_hll_consume_seqfile(ref_test_data):
    filename = ref_test_data + "/random-20-a.fa"
    hllcpp = khmer.HLLCounter(ERR_RATE, K)
    hllcpp.consume_seqfile(filename)
    assert abs(1 - float(hllcpp.estimate_cardinality()) / N_UNIQUE) < \
        ERR_RATE


def test_hll_len(ref_test_data):
    filename = ref_test_data + "/random-20-a.fa"
    hllcpp = khmer.HLLCounter(ERR_RATE, K)
    hllcpp.consume_seqfile(filename)
    assert hllcpp.estimate_cardinality() == len(hllcpp)


def test_hll_merge(ref_test_data):
    hll_total = khmer.HLLCounter(ERR_RATE, K)
    hll_merged = khmer.HLLCounter(ERR_RATE, K)

    filename = ref_test_data + "/test-abund-read-2.fa"
    hll_partial_1 = khmer.HLLCounter(ERR_RATE, K)
    hll_partial_1.consume_seqfile(filename)
    hll_total.consume_seqfile(filename)

    filename = ref_test_data + "/test-abund-read-3.fa"
    hll_partial_2 = khmer.HLLCounter(ERR_RATE, K)
    hll_partial_2.consume_seqfile(filename)
    hll_total.consume_seqfile(filename)

    hll_merged.merge(hll_partial_1)
    hll_merged.merge(hll_partial_2)

    assert len(hll_total) == len(hll_merged)


def test_hll_merge_mismatch():
    with pytest.raises(ValueError):
        khmer.HLLCounter(0.01, 20).merge(khmer.HLLCounter(0.3, 20))


def test_hll_invalid_error_rate():
    with pytest.raises(ValueError):
        khmer.HLLCounter(-0.01, K)


def test_hll_invalid_error_rate_max():
    with pytest.raises(ValueError):
        khmer.HLLCounter(0.51, K)


def test_hll_invalid_error_rate_min():
    with pytest.raises(ValueError):
        khmer.HLLCounter(0.0040624, K)


def test_hll_change_error_rate_after_use():
    hll = khmer.HLLCounter(0.01, K)
    hll.consume_string("A" * 30)
    with pytest.raises(AttributeError):
        hll.error_rate = 0.05


def test_hll_consume_fasta():
    # the 1.x-named consume path counts unique k-mers via HyperLogLog
    from . import khmer_tst_utils as utils
    filename = utils.get_test_data('random-20-a.fa')
    hllcpp = khmer.HLLCounter(ERR_RATE, K)
    hllcpp.consume_seqfile(filename)

    assert abs(1 - float(hllcpp.estimate_cardinality()) / N_UNIQUE) < ERR_RATE


def test_hll_invalid_base():
    # invalid bases are cleaned, not fatal, on consume_string
    hllcpp = khmer.HLLCounter(ERR_RATE, 5)
    hllcpp.consume_string("ACGTTTCGNAATNNNNN")
