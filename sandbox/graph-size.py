#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Filter reads by the connected-graph size around their first k-mer.

% python sandbox/graph-size.py <infile> [ <outfile> ]

TPU port of the reference sandbox/graph-size.py (fixed K/size/threshold
constants; reads whose component is smaller than THRESHOLD are dropped).
"""

import os.path
import sys

from khmer_tpu import Nodegraph
from khmer_tpu.thread_utils import ThreadedSequenceProcessor, verbose_loader

K = 32
HASHTABLE_SIZE = int(4e6)
THRESHOLD = 500
N_HT = 4
GROUPSIZE = 100


def main():
    infile = sys.argv[1]
    outfile = os.path.basename(infile) + '.graphsize'
    if len(sys.argv) == 3:
        outfile = sys.argv[2]

    print('input file to graphsize filter: %s' % infile)
    print('filtering to output:', outfile)
    print('-- settings:')
    print('K', K)
    print('HASHTABLE SIZE %g' % HASHTABLE_SIZE)
    print('N HASHTABLES %d' % N_HT)
    print('THRESHOLD', THRESHOLD)
    print('--')

    print('creating ht')
    ht = Nodegraph(K, HASHTABLE_SIZE, N_HT)
    print('eating fa', infile)
    total_reads, n_consumed = ht.consume_seqfile(infile)
    outfp = open(outfile, 'w')

    def process_fn(record, ht=ht):
        kmer = record.sequence[:K]
        size = ht.calc_connected_graph_size(kmer, THRESHOLD)
        if size >= THRESHOLD:
            return record.name, record.sequence
        return None, None

    tsp = ThreadedSequenceProcessor(process_fn, group_size=GROUPSIZE)
    tsp.start(verbose_loader(infile), outfp)


if __name__ == '__main__':
    main()
