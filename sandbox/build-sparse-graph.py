#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Build a sparse tag graph with graph-tool and draw it.

% python sandbox/build-sparse-graph.py <K> <tablesize> <input_fasta>

TPU port of the reference sandbox/build-sparse-graph.py; requires the
optional graph-tool package for layout/drawing.
"""

import sys

from khmer_tpu import GraphLabels, Nodegraph
from khmer_tpu.io.fastx import FastxReader

try:
    import graph_tool.all as gt
except ImportError:
    gt = None


def main():
    if gt is None:
        sys.exit("build-sparse-graph.py requires the graph-tool package")

    input_fasta = sys.argv[3]
    ksize = int(sys.argv[1])
    x = float(sys.argv[2])

    ng = Nodegraph(ksize, x, 4)
    lh = GraphLabels(ng)

    sparse_graph = gt.Graph()
    hashes = sparse_graph.new_vertex_property("long long")

    for n, record in enumerate(FastxReader(input_fasta)):
        if n % 1000 == 0:
            print('...loaded and tagged {} sequences'.format(n),
                  file=sys.stderr)
        sequence = record.sequence

        lh.consume_sequence_and_tag_with_labels(sequence, n)
        tags = lh.sweep_tag_neighborhood(sequence, 0)
        for i in range(len(tags) - 1):
            src = tags[i]
            dst = tags[i + 1]

            new = False

            srcv = gt.find_vertex(sparse_graph, hashes, src)
            if not srcv:
                srcv = sparse_graph.add_vertex()
                hashes[srcv] = src
                new = True
            else:
                srcv = srcv[0]

            dstv = gt.find_vertex(sparse_graph, hashes, dst)
            if not dstv:
                dstv = sparse_graph.add_vertex()
                hashes[dstv] = dst
                new = True
            else:
                dstv = dstv[0]

            if new:
                sparse_graph.add_edge(srcv, dstv)

    print('Sparse graph has {} nodes, {} edges'.format(
        sparse_graph.num_vertices(), sparse_graph.num_edges()))
    comp = gt.label_largest_component(sparse_graph, directed=False)
    gt.graph_draw(sparse_graph, output_size=(5000, 5000),
                  output=input_fasta + '_sparse.png')
    sparse_graph.set_vertex_filter(comp)
    gt.graph_draw(sparse_graph, output_size=(5000, 5000),
                  output=input_fasta + '_sparse_comp.png')


if __name__ == '__main__':
    main()
