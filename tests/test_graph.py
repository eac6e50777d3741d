"""Graph traversal tests ported from the reference tests/test_graph.py
(exact connected-component sizes on test-graph.fa + single-link cases)."""

import pytest

import khmer_tpu as khmer


class Test_ExactGraphFu:

    def setup_method(self):
        self.ht = khmer.Nodegraph(12, 1e4, 2)

    def test_counts(self, ref_test_data):
        ht = self.ht
        ht.consume_seqfile(ref_test_data + '/test-graph.fa')

        kmer = "TTAGGACTGCAC"
        x = ht.calc_connected_graph_size(kmer)
        assert x == 69, x

        kmer = "TGCGTTTCAATC"
        x = ht.calc_connected_graph_size(kmer)
        assert x == 68, x

        kmer = "ATACTGTAAATA"
        x = ht.calc_connected_graph_size(kmer)
        assert x == 36, x

    @pytest.mark.parametrize("base", "ACGT")
    def test_graph_links_next(self, base):
        ht = self.ht
        word = "TGCGTTTCAATC"
        ht.consume(word)
        ht.consume(word[1:] + base)

        x = ht.calc_connected_graph_size(word)
        assert x == 2

    @pytest.mark.parametrize("base", "ACGT")
    def test_graph_links_prev(self, base):
        ht = self.ht
        word = "TGCGTTTCAATC"
        ht.consume(word)
        ht.consume(base + word[:-1])

        x = ht.calc_connected_graph_size(word)
        assert x == 2
