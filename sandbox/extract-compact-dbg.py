#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Emit the compact de Bruijn graph (unitigs + adjacencies) as GML.

Usage: python sandbox/extract-compact-dbg.py -o out.gml <seqfile> ...

Equivalent of the reference sandbox/extract-compact-dbg.py: high-degree
nodes become single-k-mer segments, the linear paths between them
become unitig segments, and segment adjacencies form the output graph.
"""

import argparse
import sys

from khmer_tpu import HashSet, Nodegraph, calc_expected_collisions
from khmer_tpu.io.fastx import FastxReader

DEFAULT_KSIZE = 31
NODEGRAPH_SIZE = 8e8


class SegmentTracker:
    """Segment id assignment + adjacency sets, keyed however the
    caller likes (HDN hash or fresh unitig id)."""

    def __init__(self, ksize):
        self.ksize = ksize
        self._next_id = 1
        self.sizes = {}          # segment id -> node count
        self.id_of_hdn = {}      # hdn hash -> segment id
        self.edges = {}          # min(id) -> set of max(id)

    def segment_for_hdn(self, node):
        sid = self.id_of_hdn.get(node)
        if sid is None:
            sid = self._next_id
            self._next_id += 1
            self.id_of_hdn[node] = sid
            self.sizes[sid] = self.ksize
        return sid

    def new_unitig(self, size):
        sid = self._next_id
        self._next_id += 1
        self.sizes[sid] = size
        return sid

    def connect(self, a, b):
        a, b = min(a, b), max(a, b)
        self.edges.setdefault(a, set()).add(b)

    def write_gml(self, fp):
        fp.write('graph [\n   directed 0\n')
        for sid, size in self.sizes.items():
            fp.write('  node [\n    id %s\n    size %s\n  ]\n'
                     % (sid, size))
        for src, dsts in self.edges.items():
            for dst in dsts:
                fp.write('  edge [\n    source %s\n    target %s\n  ]\n'
                         % (src, dst))
        fp.write(']\n')


def walk_unitig(graph, seed, stop_bf, tracker, hdns):
    """Trace the linear path from one HDN neighbor; register it as a
    segment and connect it to the HDNs it reaches.  The walked nodes
    are marked in the shared stop bloom so each unitig is counted
    exactly once (a path between two HDNs is reachable from both)."""
    size, conns, visited = graph.traverse_linear_path(seed, hdns,
                                                      stop_filter=stop_bf)
    if not size:
        return
    for node in visited:
        stop_bf.add(node)
    sid = tracker.new_unitig(size)
    for hdn in conns:
        other = tracker.id_of_hdn.get(hdn)
        if other is not None:
            tracker.connect(sid, other)


def iterate_records(seqfiles, tag):
    n = 0
    for seqfile in seqfiles:
        for record in FastxReader(seqfile):
            n += 1
            if n % 10000 == 0:
                print(tag, seqfile, n)
            yield record


def main():
    cli = argparse.ArgumentParser(
        description='extract the compact de Bruijn graph as GML')
    cli.add_argument('seqfiles', nargs='+')
    cli.add_argument('-o', '--output', default=None)
    cli.add_argument('-k', '--ksize', default=DEFAULT_KSIZE, type=int)
    cli.add_argument('-x', '--tablesize', default=NODEGRAPH_SIZE,
                     type=float)
    cli.add_argument('--force', action='store_true')
    opts = cli.parse_args()

    assert opts.ksize % 2, "ksize must be odd"
    assert opts.output, "you probably want an output file"

    print('building graphs and loading files')

    # the graph plus two stop blooms (one guards duplicate sequences
    # during HDN discovery, one guards the unitig walks); allocate all
    # up front so a memory problem fails fast
    graph = Nodegraph(opts.ksize, opts.tablesize, 2)
    print(graph.ksize(), graph.hashsizes())
    stop_bf = Nodegraph(opts.ksize, opts.tablesize, 2)
    dedup_bf = Nodegraph(opts.ksize, opts.tablesize, 2)

    for record in iterate_records(opts.seqfiles, '...'):
        graph.consume(record.sequence)

    calc_expected_collisions(graph, opts.force, max_false_pos=.05)

    print('finding high degree nodes')
    hdns = HashSet(opts.ksize)
    for record in iterate_records(opts.seqfiles, '...2'):
        # skip exact duplicate sequences
        if min(dedup_bf.get_kmer_counts(record.sequence)) == 0:
            dedup_bf.consume(record.sequence)
            hdns += graph.find_high_degree_nodes(record.sequence)
    del dedup_bf

    if not len(hdns):
        print('no high degree nodes; exiting.')
        sys.exit(0)

    tracker = SegmentTracker(opts.ksize)
    for node in hdns:
        tracker.segment_for_hdn(node)

    print('traversing linear segments from', len(hdns), 'nodes')

    for n, node in enumerate(hdns):
        if n % 10000 == 0:
            print('...', n, 'of', len(hdns))
        sid = tracker.id_of_hdn[node]
        for nbr in graph.neighbors(node):
            if nbr.kmer_u in hdns:
                tracker.connect(sid, tracker.id_of_hdn[nbr.kmer_u])
            else:
                walk_unitig(graph, nbr, stop_bf, tracker, hdns)

    print(len(tracker.sizes), 'segments, containing',
          sum(tracker.sizes.values()), 'nodes')

    if opts.output:
        print('saving to', opts.output)
        with open(opts.output, 'w') as fp:
            tracker.write_gml(fp)


if __name__ == '__main__':
    main()
