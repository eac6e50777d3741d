#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Stitch contigs back together across high-degree nodes.

Usage: python sandbox/reassemble-contigs.py <contigs1> [ <contigs2> ... ]

Equivalent of the reference sandbox/reassemble-contigs.py: build a
Bloom graph of the contigs, label each contig across the high-degree
nodes it touches, then emit the labeled-path assembly seeded at every
contig's first k-mer.
"""

import argparse

from khmer_tpu import GraphLabels, HashSet, Nodegraph
from khmer_tpu.io.fastx import FastxReader

K = 31


def _each_record(filenames, tick='...'):
    count = 0
    for filename in filenames:
        for record in FastxReader(filename):
            count += 1
            if count % 10000 == 0:
                print(tick, count)
            yield record


def main():
    cli = argparse.ArgumentParser(
        description='re-assemble contigs across high-degree nodes')
    cli.add_argument('contig_files', nargs='+')
    opts = cli.parse_args()

    graph = Nodegraph(K, 1e8, 4)

    # pass 1: load the graph, remembering each contig's seed k-mer
    starts = []
    for record in _each_record(opts.contig_files):
        graph.consume(record.sequence)
        starts.append(record.sequence[:K])

    # pass 2: collect every high-degree node
    hdn = HashSet(K)
    for record in _each_record(opts.contig_files):
        hdn += graph.find_high_degree_nodes(record.sequence)

    # pass 3: label contigs across those nodes
    labels = GraphLabels(graph)
    for n, record in enumerate(_each_record(opts.contig_files)):
        labels.label_across_high_degree_nodes(record.sequence, hdn, n)

    # emit the labeled-path assembly from every seed
    counter = 0
    for seed in starts:
        contigs = labels.assemble_labeled_path(seed)
        if not contigs:
            print('nada...')
        for contig in contigs:
            print('>%d\n%s' % (counter, contig))
            counter += 1


if __name__ == '__main__':
    main()
