#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Probabilistically downsample reads to a target median coverage.

% python sandbox/filter-median.py <counting.ct> <data1> [ <data2> ... ]

Output goes to 'infile.medfilt'.  TPU port of the reference
sandbox/filter-median.py (keep a read with probability ~C/med).
"""

import os
import random

from khmer_tpu import Countgraph
from khmer_tpu.khmer_args import build_counting_args
from khmer_tpu.thread_utils import ThreadedSequenceProcessor, verbose_loader

DEFAULT_COVERAGE = 20


def main():
    parser = build_counting_args()
    parser.add_argument('--coverage', '-C', dest='coverage',
                        default=DEFAULT_COVERAGE, type=int)
    parser.add_argument('input_table')
    parser.add_argument('input_filenames', nargs='+')
    args = parser.parse_args()

    counting_ht = args.input_table
    infiles = args.input_filenames

    print('file with ht: %s' % counting_ht)

    print('loading hashtable')
    ht = Countgraph.load(counting_ht)
    ksize = ht.ksize()

    print("K:", ksize)

    def process_fn(record):
        name = record.name
        seq = record.sequence

        med, avg, dev = ht.get_median_count(seq)

        if random.randint(1, max(med, 1)) > args.coverage:
            return None, None

        return name, seq

    for infile in infiles:
        print('filtering', infile)
        outfile = os.path.basename(infile) + '.medfilt'
        outfp = open(outfile, 'w')

        tsp = ThreadedSequenceProcessor(process_fn)
        tsp.start(verbose_loader(infile), outfp)

        print('output in', outfile)


if __name__ == '__main__':
    main()
