"""Ported from the reference tests/test_filter.py — the 1.x
single-table counting hash (khmer.new_hashtable,
src/khmer/_cpy_khmer.cc:3242-3265) and its per-read position/frequency
dump (CountingHash::output_fasta_kmer_pos_freq, lib/counting.cc)."""

import khmer_tpu as khmer

from . import khmer_tst_utils as utils


def load_fa_seq_names(filename):
    return [r.name for r in utils.screed_open(filename)]


class Test_Filter(object):

    def test_abund(self):
        ht = khmer.new_hashtable(10, 4 ** 10)

        filename = utils.get_test_data('test-abund-read.fa')
        outname = utils.get_temp_filename('test_abund.out')

        ht.consume_fasta(filename)
        try:
            ht.consume_fasta()
            assert 0, "should fail"
        except TypeError as err:
            print(str(err))
        try:
            ht.consume_fasta("nonexistent")
            assert 0, "should fail"
        except OSError as err:
            print(str(err))
        ht.output_fasta_kmer_pos_freq(filename, outname)
        try:
            ht.output_fasta_kmer_pos_freq()
            assert 0, "should fail"
        except TypeError as err:
            print(str(err))

        fd = open(outname, "r")

        output = fd.readlines()
        assert len(output) == 1

        output = output[0]
        output = output.strip().split()

        assert ['1'] * (114 - 10 + 1) == output

        fd.close()
