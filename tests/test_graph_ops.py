"""Graph-layer tests: traversal, assembly, partitioning, labeling.

Mirrors the reference's synthetic-graph strategy (tests/graph_features.py):
random sequences consumed into a Nodegraph/Countgraph, then structural
queries asserted against ground truth computed in plain python.
"""

import random

import pytest

from khmer_tpu import Countgraph, Nodegraph
from khmer_tpu.assembly import LinearAssembler
from khmer_tpu.labeling import GraphLabels
from khmer_tpu.partitioning import SubsetPartition

K = 21


def random_sequence(n, seed):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGT") for _ in range(n))


@pytest.fixture
def linear_graph():
    seq = random_sequence(200, 1)
    g = Countgraph(K, 1e5, 4)
    g.consume(seq)
    return g, seq


def test_kmer_degree_and_neighbors(linear_graph):
    g, seq = linear_graph
    # middle k-mer has 2 neighbors, end k-mers have 1
    mid = seq[50: 50 + K]
    assert g.kmer_degree(mid) == 2
    assert len(g.neighbors(mid)) == 2
    first = seq[:K]
    assert g.kmer_degree(first) == 1
    last = seq[-K:]
    assert g.kmer_degree(last) == 1


def test_neighbors_are_adjacent_kmers(linear_graph):
    g, seq = linear_graph
    mid = seq[50: 50 + K]
    expect = {g.hash(seq[49: 49 + K]), g.hash(seq[51: 51 + K])}
    assert {n.kmer_u for n in g.neighbors(mid)} == expect


def test_traverse_from_kmer_radius(linear_graph):
    g, seq = linear_graph
    mid = seq[50: 50 + K]
    seen = g.traverse_from_kmer(mid, 5)
    # radius 5 both directions + self = 11 k-mers on a linear path
    assert len(seen) == 11
    all_seen = g.traverse_from_kmer(mid, 1000)
    assert len(all_seen) == len(seq) - K + 1


def test_calc_connected_graph_size(linear_graph):
    g, seq = linear_graph
    n = g.calc_connected_graph_size(seq[:K])
    assert n == len(seq) - K + 1
    # max_size truncation
    n2 = g.calc_connected_graph_size(seq[:K], max_size=10)
    assert 10 <= n2 < 20


def test_linear_assembler_full_sequence(linear_graph):
    g, seq = linear_graph
    asm = LinearAssembler(g)
    # from the left end, middle, and right end
    for kmer in (seq[:K], seq[80: 80 + K], seq[-K:]):
        contig = asm.assemble(kmer)
        assert contig in (seq, revcomp(seq))
        assert len(contig) == len(seq)


def test_linear_assembler_right_branch():
    # a branch point stops naive linear assembly
    seq = random_sequence(100, 3)
    branch = seq[:40] + random_sequence(60, 4)
    g = Countgraph(K, 1e5, 4)
    g.consume(seq)
    g.consume(branch)
    asm = LinearAssembler(g)
    contig = asm.assemble(seq[:K])
    # stops at the branch HDN: 40 + K - 1 possible positions
    assert len(contig) < len(seq)
    assert contig in seq or revcomp(contig) in seq


def revcomp(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def test_find_high_degree_nodes():
    seq = random_sequence(100, 5)
    branch = seq[:40] + random_sequence(60, 6)
    g = Nodegraph(K, 1e5, 4)
    g.consume(seq)
    g.consume(branch)
    hdns = g.find_high_degree_nodes(seq)
    assert len(hdns) >= 1


def test_stop_tags_halt_traversal(linear_graph):
    g, seq = linear_graph
    g.add_stop_tag(seq[60: 60 + K])
    seen = g.traverse_from_kmer(seq[50: 50 + K], 1000)
    # traversal to the right stops at position 60
    assert len(seen) < len(seq) - K + 1


# ---------------------------------------------------------------------------
# partitioning
# ---------------------------------------------------------------------------


def _tagged_graph(*seqs):
    g = Nodegraph(K, 1e5, 4)
    for s in seqs:
        g.consume_and_tag(s)
    return g


def test_two_components_two_partitions():
    a = random_sequence(150, 10)
    b = random_sequence(150, 11)
    g = _tagged_graph(a, b)
    subset = g.do_subset_partition(0, 0)
    n_partitions, n_unassigned = subset.count_partitions()
    assert n_partitions == 2


def test_connected_component_single_partition():
    a = random_sequence(150, 12)
    b = a[100:] + random_sequence(60, 13)  # overlaps a
    g = _tagged_graph(a, b)
    subset = g.do_subset_partition(0, 0)
    n_partitions, _ = subset.count_partitions()
    assert n_partitions == 1


def test_partition_output_and_pmap_roundtrip(tmp_path):
    a = random_sequence(150, 14)
    b = random_sequence(150, 15)
    fa = tmp_path / "reads.fa"
    fa.write_text(">a\n%s\n>b\n%s\n" % (a, b))
    g = _tagged_graph(a, b)
    subset = g.do_subset_partition(0, 0)

    pmap = str(tmp_path / "x.pmap")
    subset.save_partitionmap(pmap)
    subset2 = SubsetPartition.load(pmap, g)
    assert subset2.count_partitions()[0] == 2

    out = str(tmp_path / "reads.part")
    n = subset.output_partitioned_file(str(fa), out)
    assert n == 2
    lines = open(out).read().splitlines()
    assert len(lines) == 4
    pids = {line.rsplit("\t", 1)[1] for line in lines if line[0] == ">"}
    assert len(pids) == 2


def test_merge_subsets():
    a = random_sequence(150, 16)
    b = random_sequence(150, 17)
    g = _tagged_graph(a, b)
    tags = sorted(g.all_tags)
    half = tags[len(tags) // 2]
    s1 = g.do_subset_partition(tags[0], half)
    s2 = g.do_subset_partition(half, 0)
    s1.merge(s2)
    assert s1.count_partitions()[0] == 2


def test_sweep_for_tags():
    a = random_sequence(150, 18)
    g = _tagged_graph(a)
    subset = SubsetPartition(g)
    tags = subset.sweep_for_tags(a)
    assert set(tags) == g.all_tags


# ---------------------------------------------------------------------------
# labeling
# ---------------------------------------------------------------------------


def test_labels_roundtrip(tmp_path):
    a = random_sequence(150, 20)
    b = random_sequence(150, 21)
    fa = tmp_path / "reads.fa"
    fa.write_text(">a\n%s\n>b\n%s\n" % (a, b))
    g = Nodegraph(K, 1e5, 4)
    lh = GraphLabels(g)
    n_reads, _ = lh.consume_seqfile_and_tag_with_labels(str(fa))
    assert n_reads == 2
    assert lh.n_labels == 2

    # sweep: read a sees only label 0, read b only label 1
    assert lh.sweep_label_neighborhood(a) == [0]
    assert lh.sweep_label_neighborhood(b) == [1]

    path = str(tmp_path / "x.labels")
    lh.save_labels_and_tags(path)
    g2 = Nodegraph(K, 1e5, 4)
    g2.consume(a)
    g2.consume(b)
    lh2 = GraphLabels.load(path, g2)
    assert lh2.n_labels == 2
    assert lh2.sweep_label_neighborhood(a) == [0]


def test_labeled_assembler_spans_branch():
    from khmer_tpu.assembly import SimpleLabeledAssembler

    trunk = random_sequence(120, 22)
    g = Nodegraph(K, 1e5, 4)
    lh = GraphLabels(g)
    lh.consume_sequence_and_tag_with_labels(trunk, 0)
    asm = SimpleLabeledAssembler(lh)
    paths = asm.assemble(trunk[40: 40 + K])
    assert any(p in (trunk, revcomp(trunk)) for p in paths)
