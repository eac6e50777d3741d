#!/usr/bin/env python
"""Extract the compact de Bruijn graph with label links across HDNs.

% python sandbox/link-compact-dbg.py -o out.gml <seqfile> [ ... ]

TPU port of the reference sandbox/link-compact-dbg.py
(extract-compact-dbg plus GraphLabels labeling of reads across
high-degree nodes; the labels of each linear path are collected during
traversal).
"""

import argparse
import sys

from khmer_tpu import GraphLabels, HashSet, Nodegraph, \
    calc_expected_collisions
from khmer_tpu.io.fastx import FastxReader

# graph settings
DEFAULT_KSIZE = 31
NODEGRAPH_SIZE = 8e8  # small, big is 2e8


class Pathfinder(object):
    "Track segment IDs & adjacency lists."

    def __init__(self, ksize):
        self.ksize = ksize

        self.segment_counter = 1
        self.segments = {}
        self.segments_r = {}
        self.adjacencies = {}

    def new_segment(self, kmer):
        if kmer in self.segments_r:
            return self.segments_r[kmer]

        this_id = self.segment_counter
        self.segment_counter += 1

        self.segments[this_id] = self.ksize
        self.segments_r[kmer] = this_id

        return this_id

    def new_linear_segment(self, size):
        this_id = self.segment_counter
        self.segment_counter += 1
        self.segments[this_id] = size
        return this_id

    def add_adjacency(self, node_id, adj):
        node_id, adj = min(node_id, adj), max(node_id, adj)

        x = self.adjacencies.get(node_id, set())
        x.add(adj)
        self.adjacencies[node_id] = x


def traverse_and_mark_linear_paths(graph, nk, stop_bf, pathy, degree_nodes,
                                   lh):
    size, conns, visited = graph.traverse_linear_path(nk, degree_nodes,
                                                      stop_bf)
    if not size:
        return

    linear_path_labels = set()
    for node in visited:
        linear_path_labels.update(lh.get_tag_labels(node))

    # give it a segment ID
    path_id = pathy.new_linear_segment(size)

    # for all adjacencies, add.
    for conn in conns:
        conn_id = pathy.segments_r.get(conn)
        if conn_id is not None:
            pathy.add_adjacency(path_id, conn_id)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('seqfiles', nargs='+')
    parser.add_argument('-o', '--output', default=None)
    parser.add_argument('-k', '--ksize', default=DEFAULT_KSIZE, type=int)
    parser.add_argument('-x', '--tablesize', default=NODEGRAPH_SIZE,
                        type=float)
    parser.add_argument('--force', action='store_true')
    args = parser.parse_args()

    assert args.ksize % 2, "ksize must be odd"
    assert args.output, "you probably want an output file"

    print('building graphs and loading files')

    graph = Nodegraph(args.ksize, args.tablesize, 2)
    stop_bf = Nodegraph(args.ksize, args.tablesize, 2)
    stop_bf2 = Nodegraph(args.ksize, args.tablesize, 2)
    n = 0

    for seqfile in args.seqfiles:
        for record in FastxReader(seqfile):
            n += 1
            if n % 10000 == 0:
                print('...', seqfile, n)
            graph.consume(record.sequence)

    calc_expected_collisions(graph, args.force, max_false_pos=.05)

    pathy = Pathfinder(args.ksize)

    print('finding high degree nodes')
    degree_nodes = HashSet(args.ksize)
    n = 0
    for seqfile in args.seqfiles:
        for record in FastxReader(seqfile):
            n += 1
            if n % 10000 == 0:
                print('...2', seqfile, n)
            if min(stop_bf2.get_kmer_counts(record.sequence)) == 0:
                stop_bf2.consume(record.sequence)
                degree_nodes += graph.find_high_degree_nodes(
                    record.sequence)
    del stop_bf2

    if not len(degree_nodes):
        print('no high degree nodes; exiting.')
        sys.exit(0)

    lh = GraphLabels(graph)
    n = 0
    for seqfile in args.seqfiles:
        for record in FastxReader(seqfile):
            n += 1
            if n % 10000 == 0:
                print('...2', seqfile, n)
            lh.label_across_high_degree_nodes(record.sequence,
                                              degree_nodes, n)

    print('num labels:', lh.n_labels)

    for node in degree_nodes:
        pathy.new_segment(node)

    print('traversing linear segments from', len(degree_nodes), 'nodes')

    for n, k in enumerate(degree_nodes):
        if n % 10000 == 0:
            print('...', n, 'of', len(degree_nodes))

        k_id = pathy.segments_r[k]

        nbh = graph.neighbors(k)
        for nk in nbh:
            if nk.kmer_u in degree_nodes:
                nk_id = pathy.segments_r[nk.kmer_u]
                pathy.add_adjacency(k_id, nk_id)
            else:
                traverse_and_mark_linear_paths(graph, nk, stop_bf, pathy,
                                               degree_nodes, lh)

    print(len(pathy.segments), 'segments, containing',
          sum(pathy.segments.values()), 'nodes')

    # save to GML
    if args.output:
        print('saving to', args.output)
        fp = open(args.output, 'w')
        w = GmlWriter(fp, [], [])

        for k, v in pathy.segments.items():
            w.add_vertex(k, v, [])

        for k, v in pathy.adjacencies.items():
            for edge in v:
                w.add_edge(k, edge, [])
        w.done()


class GmlWriter:
    """Minimal GML graph writer (same output as the reference's)."""

    def __init__(self, file, vertex_attributes=None, edge_attributes=None,
                 directed=False):
        self.file = file

        self.vertex_attributes = vertex_attributes or []
        self.edge_attributes = edge_attributes or []

        if directed:
            self._write('graph [\n   directed 1\n')
        else:
            self._write('graph [\n   directed 0\n')

    def _write(self, string):
        self.file.write(string)

    def _quote(self, value):
        if isinstance(value, str):
            return '"{}"'.format(value)
        return value

    def add_vertex(self, id, size, attribute_values=()):
        self._write('  node [\n')
        self._write('    id {}\n'.format(id))
        self._write('    size {}\n'.format(size))
        for k, v in zip(self.vertex_attributes, attribute_values):
            self._write('    {} {}\n'.format(k, self._quote(v)))
        self._write('  ]\n')

    def add_edge(self, src, dest, attribute_values=()):
        self._write('  edge [\n')
        self._write('    source {}\n'.format(src))
        self._write('    target {}\n'.format(dest))
        for k, v in zip(self.edge_attributes, attribute_values):
            self._write('    {} {}\n'.format(k, self._quote(v)))
        self._write('  ]\n')

    def done(self):
        self._write(']\n')


if __name__ == '__main__':
    main()
