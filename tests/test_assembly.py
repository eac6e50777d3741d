"""Assembler tests — ported from the reference tests/test_assembly.py
(TestNonBranching + right/left branching classes)."""

import pytest

import khmer_tpu as khmer
from khmer_tpu.assembly import LinearAssembler

from .graph_features import (K, Kmer, graph, hdn_counts,  # noqa: F401
                             left_tip_structure, linear_structure,
                             mutate_position, random_sequence, revcomp,
                             right_tip_structure)


def _equals_rc(query, match):
    return (query == match) or (revcomp(query) == match)


class TestNonBranching:

    def test_all_start_positions(self, linear_structure):
        graph, contig = linear_structure
        asm = LinearAssembler(graph)

        for start in range(0, len(contig), 150):
            path = asm.assemble(contig[start:start + K])
            assert _equals_rc(path, contig), start

    def test_all_left_to_beginning(self, linear_structure):
        graph, contig = linear_structure
        asm = LinearAssembler(graph)

        for start in range(0, len(contig), 150):
            path = asm.assemble_left(contig[start:start + K])
            assert _equals_rc(path, contig[:start + K]), start

    def test_all_right_to_end(self, linear_structure):
        graph, contig = linear_structure
        asm = LinearAssembler(graph)

        for start in range(0, len(contig), 150):
            path = asm.assemble_right(contig[start:start + K])
            assert _equals_rc(path, contig[start:]), start

    def test_hash_as_seed(self, linear_structure):
        graph, contig = linear_structure
        asm = LinearAssembler(graph)

        left = graph.hash(contig[:K])
        assert _equals_rc(asm.assemble(left), contig)


class TestLinearAssembler_RightBranching:

    def test_branch_point(self, right_tip_structure):
        graph, contig, L, HDN, R, tip = right_tip_structure
        assert graph.kmer_degree(HDN) == 3

    def test_beginning_to_branch(self, right_tip_structure):
        graph, contig, L, HDN, R, tip = right_tip_structure
        asm = LinearAssembler(graph)
        path = asm.assemble(contig[0:K])

        assert len(path) == HDN.pos + K
        assert _equals_rc(path, contig[:len(path)])

    def test_assemble_takes_hash(self, right_tip_structure):
        graph, contig, L, HDN, R, tip = right_tip_structure
        asm = LinearAssembler(graph)
        path = asm.assemble(graph.hash(contig[0:K]))

        assert len(path) == HDN.pos + K
        assert _equals_rc(path, contig[:len(path)])

    def test_beginning_to_branch_revcomp(self, right_tip_structure):
        graph, contig, L, HDN, R, tip = right_tip_structure
        asm = LinearAssembler(graph)
        path = asm.assemble(revcomp(contig[0:K]))

        assert len(path) == HDN.pos + K
        assert _equals_rc(path, contig[:len(path)])

    def test_left_of_branch_to_beginning(self, right_tip_structure):
        graph, contig, L, HDN, R, tip = right_tip_structure
        asm = LinearAssembler(graph)
        path = asm.assemble(L)

        assert len(path) == HDN.pos + K
        assert _equals_rc(path, contig[:len(path)])

    def test_left_of_branch_to_beginning_revcomp(self, right_tip_structure):
        graph, contig, L, HDN, R, tip = right_tip_structure
        asm = LinearAssembler(graph)
        path = asm.assemble(revcomp(L))

        assert len(path) == HDN.pos + K
        assert _equals_rc(path, contig[:len(path)])

    def test_right_of_branch_outwards_to_ends(self, right_tip_structure):
        # assembling from right of the branch should reach both ends:
        # moving left, the HDN is just another node
        graph, contig, L, HDN, R, tip = right_tip_structure
        asm = LinearAssembler(graph)
        path = asm.assemble(R)

        assert len(path) == len(contig)
        assert _equals_rc(path, contig)

    def test_end_to_beginning(self, right_tip_structure):
        graph, contig, L, HDN, R, tip = right_tip_structure
        asm = LinearAssembler(graph)
        path = asm.assemble(contig[-K:])

        assert len(path) == len(contig)
        assert _equals_rc(path, contig)


class TestLinearAssembler_LeftBranching:

    def test_branch_point(self, left_tip_structure):
        graph, contig, L, HDN, R, tip = left_tip_structure
        assert graph.kmer_degree(HDN) == 3

    def test_end_to_branch(self, left_tip_structure):
        graph, contig, L, HDN, R, tip = left_tip_structure
        asm = LinearAssembler(graph)
        path = asm.assemble(contig[-K:])

        assert len(path) == len(contig) - HDN.pos
        assert _equals_rc(path, contig[HDN.pos:])

    def test_branch_to_end(self, left_tip_structure):
        graph, contig, L, HDN, R, tip = left_tip_structure
        asm = LinearAssembler(graph)
        path = asm.assemble(HDN)

        assert len(path) == len(contig) - HDN.pos
        assert _equals_rc(path, contig[HDN.pos:])

    def test_from_branch_to_ends_with_stopbf(self, left_tip_structure):
        # block the tip with the stop filter: full-length contig
        graph, contig, L, HDN, R, tip = left_tip_structure

        stop_filter = khmer.Nodegraph(K, 1e5, 4)
        stop_filter.count(tip)

        asm = LinearAssembler(graph, stop_filter=stop_filter)
        path = asm.assemble(HDN)

        assert len(path) == len(contig)
        assert _equals_rc(path, contig)

    def test_from_branch_to_ends_with_stopbf_revcomp(
            self, left_tip_structure):
        graph, contig, L, HDN, R, tip = left_tip_structure

        stop_filter = khmer.Nodegraph(K, 1e5, 4)
        stop_filter.count(tip)
        asm = LinearAssembler(graph, stop_filter=stop_filter)
        path = asm.assemble(revcomp(HDN))

        assert len(path) == len(contig)
        assert _equals_rc(path, contig)

    def test_end_thru_tip_with_stopbf(self, left_tip_structure):
        # block the original path: assembles through the tip instead
        graph, contig, L, HDN, R, tip = left_tip_structure

        stop_filter = khmer.Nodegraph(K, 1e5, 4)
        stop_filter.count(L)

        asm = LinearAssembler(graph, stop_filter=stop_filter)
        path = asm.assemble(contig[-K:])
        assert len(path) == len(contig) - HDN.pos + 1

        # the tip k-mer, plus the last base of the HDN through the end
        assert _equals_rc(path, tip + contig[HDN.pos + K - 1:])


# -- round 3: remaining reference test_assembly.py cases (circular
# contig, HDN-flanked node, the labeled assembler, junction counts).

import random  # noqa: E402

from .graph_features import (circular_linear_structure,  # noqa: F401,E402
                             left_double_fork_structure,
                             right_double_fork_structure,
                             right_triple_fork_structure,
                             snp_bubble_structure,
                             tandem_repeat_structure)
from . import khmer_tst_utils as utils  # noqa: E402


class TestNonBranchingMore:

    def test_circular(self, circular_linear_structure):
        graph, contig = circular_linear_structure
        asm = LinearAssembler(graph)

        path = asm.assemble_right(contig[:K])
        # the reference's fixture for this test is absent from its own
        # tree, so its exact assertion never ran; what the non-looping
        # traversal guarantees is termination after at most one lap
        # (first revisited node stops the walk) reproducing the contig
        assert len(path) <= len(contig) + K - 1
        assert utils._equals_rc(path[:len(contig)], contig)


class TestLinearAssembler_LeftBranchingMore:

    def test_single_node_flanked_by_hdns(self, left_tip_structure):
        # assemble single node flanked by high-degree nodes
        graph, contig, L, HDN, R, tip = left_tip_structure
        asm = LinearAssembler(graph)

        graph.consume(mutate_position(contig, HDN.pos + K))

        path = asm.assemble(HDN)

        assert len(path) == K
        assert utils._equals_rc(path, HDN)


class TestLabeledAssembler:

    def test_hash_as_seed(self, linear_structure):
        graph, contig = linear_structure
        lh = khmer.GraphLabels(graph)
        asm = khmer.SimpleLabeledAssembler(lh)

        left = graph.hash(contig[:K])
        assert utils._equals_rc(asm.assemble(left).pop(), contig)

    def test_beginning_to_end_across_tip(self, right_tip_structure):
        # assemble entire contig, ignoring branch point b/c of labels
        graph, contig, L, HDN, R, tip = right_tip_structure
        lh = khmer.GraphLabels(graph)
        asm = khmer.SimpleLabeledAssembler(lh)
        hdn = graph.find_high_degree_nodes(contig)
        # L, HDN, and R will be labeled with 1
        lh.label_across_high_degree_nodes(contig, hdn, 1)

        path = asm.assemble(contig[:K])

        assert len(path) == 1, "there should only be one path"
        path = path[0]

        assert len(path) == len(contig)
        assert utils._equals_rc(path, contig)

    def test_assemble_right_double_fork(self, right_double_fork_structure):
        # assemble two contigs from a double forked structure
        graph, contig, L, HDN, R, branch = right_double_fork_structure
        lh = khmer.GraphLabels(graph)
        asm = khmer.SimpleLabeledAssembler(lh)

        hdn = graph.find_high_degree_nodes(contig)
        hdn += graph.find_high_degree_nodes(branch)
        lh.label_across_high_degree_nodes(contig, hdn, 1)
        lh.label_across_high_degree_nodes(branch, hdn, 2)

        paths = asm.assemble(contig[:K])

        assert len(paths) == 2

        assert any(utils._equals_rc(path, contig) for path in paths)
        assert any(utils._equals_rc(path, branch) for path in paths)

    def test_assemble_right_triple_fork(self, right_triple_fork_structure):
        # assemble three contigs from a triple fork
        (graph, contig, L, HDN, R,
         top_sequence, bottom_sequence) = right_triple_fork_structure
        lh = khmer.GraphLabels(graph)
        asm = khmer.SimpleLabeledAssembler(lh)

        hdn = graph.find_high_degree_nodes(contig)
        hdn += graph.find_high_degree_nodes(top_sequence)
        hdn += graph.find_high_degree_nodes(bottom_sequence)
        lh.label_across_high_degree_nodes(contig, hdn, 1)
        lh.label_across_high_degree_nodes(top_sequence, hdn, 2)
        lh.label_across_high_degree_nodes(bottom_sequence, hdn, 3)

        paths = asm.assemble(contig[:K])

        assert len(paths) == 3

        assert any(utils._equals_rc(path, contig) for path in paths)
        assert any(utils._equals_rc(path, top_sequence) for path in paths)
        assert any(utils._equals_rc(path, bottom_sequence)
                   for path in paths)

    def test_assemble_left_double_fork(self, left_double_fork_structure):
        # assemble entire contig + branch points b/c of labels;
        # start from end
        graph, contig, L, HDN, R, branch = left_double_fork_structure
        lh = khmer.GraphLabels(graph)
        asm = khmer.SimpleLabeledAssembler(lh)

        # first try without the labels
        paths = asm.assemble(contig[-K:])

        assert len(paths) == 1
        # without labels, should get the beginning of the HDN thru the end
        assert paths[0] == contig[HDN.pos:]

        # now add labels and check that we get two full length paths
        hdn = graph.find_high_degree_nodes(contig)
        hdn += graph.find_high_degree_nodes(branch)
        lh.label_across_high_degree_nodes(contig, hdn, 1)
        lh.label_across_high_degree_nodes(branch, hdn, 2)

        paths = asm.assemble(contig[-K:])

        assert len(paths) == 2

        assert any(utils._equals_rc(path, contig) for path in paths)
        assert any(utils._equals_rc(path, branch) for path in paths)

    def test_assemble_snp_bubble_single(self, snp_bubble_structure):
        # assemble entire contig + one of two paths through a bubble
        graph, wildtype, mutant, HDN_L, HDN_R = snp_bubble_structure
        lh = khmer.GraphLabels(graph)
        asm = khmer.SimpleLabeledAssembler(lh)

        hdn = graph.find_high_degree_nodes(wildtype)
        assert len(hdn) == 2
        lh.label_across_high_degree_nodes(wildtype, hdn, 1)

        paths = asm.assemble(wildtype[:K])

        assert len(paths) == 1
        assert utils._equals_rc(paths[0], wildtype)

    def test_assemble_snp_bubble_both(self, snp_bubble_structure):
        # assemble entire contig + both paths
        graph, wildtype, mutant, HDN_L, HDN_R = snp_bubble_structure
        lh = khmer.GraphLabels(graph)
        asm = khmer.SimpleLabeledAssembler(lh)

        hdn = graph.find_high_degree_nodes(wildtype)
        hdn += graph.find_high_degree_nodes(mutant)
        assert len(hdn) == 2
        lh.label_across_high_degree_nodes(wildtype, hdn, 1)
        lh.label_across_high_degree_nodes(mutant, hdn, 2)

        paths = asm.assemble(wildtype[:K])

        assert len(paths) == 2

        assert any(utils._contains_rc(wildtype, path) for path in paths)
        assert any(utils._contains_rc(mutant, path) for path in paths)

    def test_assemble_snp_bubble_stopbf(self, snp_bubble_structure):
        # assemble one side of bubble, blocked with stop_filter,
        # when labels on both branches
        graph, wildtype, mutant, HDN_L, HDN_R = snp_bubble_structure
        stop_filter = khmer.Nodegraph(K, 1e5, 4)
        lh = khmer.GraphLabels(graph)
        asm = khmer.SimpleLabeledAssembler(lh, stop_filter=stop_filter)

        hdn = graph.find_high_degree_nodes(wildtype)
        hdn += graph.find_high_degree_nodes(mutant)
        assert len(hdn) == 2
        lh.label_across_high_degree_nodes(wildtype, hdn, 1)
        lh.label_across_high_degree_nodes(mutant, hdn, 2)

        # do the labeling, but block the mutant with stop_filter
        stop_filter.count(mutant[HDN_L.pos + 1:HDN_L.pos + K + 1])
        paths = asm.assemble(wildtype[:K])

        assert len(paths) == 1
        assert any(utils._equals_rc(path, wildtype) for path in paths)

    def test_assemble_tandem_repeats(self, tandem_repeat_structure):
        # assemble one copy of a tandem repeat
        graph, repeat, tandem_repeats = tandem_repeat_structure
        lh = khmer.GraphLabels(graph)
        asm = khmer.SimpleLabeledAssembler(lh)
        paths = asm.assemble(repeat[:K])

        assert len(paths) == 1
        # K-1 k-mers span the junction between the beginning and end
        # of the repeat
        assert len(paths[0]) == len(repeat) + K - 1


class TestJunctionCountAssembler:

    def test_beginning_to_end_across_tip(self, right_tip_structure):
        # assemble entire contig, ignoring branch point b/c of labels
        graph, contig, L, HDN, R, tip = right_tip_structure
        asm = khmer.JunctionCountAssembler(graph)
        asm.consume(contig)
        asm.consume(contig)
        asm.consume(contig)

        path = asm.assemble(contig[:K])
        assert len(path) == 1, "there should only be one path"
        path = path[0]
        assert len(path) == len(contig)
        assert utils._equals_rc(path, contig)
