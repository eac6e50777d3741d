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
