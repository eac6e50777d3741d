#!/usr/bin/env python
"""Re-assemble contigs across high-degree nodes with labeled paths.

% python sandbox/reassemble-contigs.py <contigs1> [ <contigs2> ... ]

TPU port of the reference sandbox/reassemble-contigs.py.
"""

import argparse

from khmer_tpu import GraphLabels, HashSet, Nodegraph
from khmer_tpu.io.fastx import FastxReader

K = 31


def main():
    p = argparse.ArgumentParser()
    p.add_argument('contig_files', nargs='+')
    args = p.parse_args()

    ng = Nodegraph(K, 1e8, 4)
    starts = []

    for filename in args.contig_files:
        for n, record in enumerate(FastxReader(filename)):
            if n and n % 10000 == 0:
                print('...', n)
            ng.consume(record.sequence)
            starts.append(record.sequence[:K])

    hdn = HashSet(K)
    for filename in args.contig_files:
        for n, record in enumerate(FastxReader(filename)):
            if n and n % 10000 == 0:
                print('...', n)
            hdn += ng.find_high_degree_nodes(record.sequence)

    lh = GraphLabels(ng)
    for filename in args.contig_files:
        for n, record in enumerate(FastxReader(filename)):
            if n and n % 10000 == 0:
                print('...', n)
            lh.label_across_high_degree_nodes(record.sequence, hdn, n)

    counter = 0
    for k in starts:
        contigs = lh.assemble_labeled_path(k)
        if not contigs:
            print('nada...')
        for c in contigs:
            print('>%d\n%s' % (counter, c))
            counter += 1


if __name__ == '__main__':
    main()
