#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Downsample reads by median coverage AND drop high-variance reads.

% python sandbox/filter-median-and-pct.py <counting.ct> <data1> [ ... ]

Output in 'infile.medpctfilt' (+ a '.stats' sidecar of med/avg/dev/pct
per read).  TPU port of the reference sandbox/filter-median-and-pct.py.
"""

import os
import random

from khmer_tpu import Countgraph
from khmer_tpu.io.fastx import FastxReader
from khmer_tpu.khmer_args import build_counting_args

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

    for infile in infiles:
        print('filtering', infile)
        xxxfp = open(os.path.basename(infile) + '.medpctfilt.stats', 'w')
        outfile = os.path.basename(infile) + '.medpctfilt'
        outfp = open(outfile, 'w')

        for n, record in enumerate(FastxReader(infile)):
            if n % 100000 == 0:
                print('...', n)

            name = record.name
            seq = record.sequence

            med, avg, dev = ht.get_median_count(seq)
            pct = dev / avg * 100 if avg else 0

            xxxfp.write('%s %s %s %s %s\n' % (med, avg, dev, pct, name))

            if random.randint(1, max(med, 1)) > args.coverage or pct > 100:
                continue

            print('>%s\n%s' % (name, seq), file=outfp)

        print('output in', outfile)


if __name__ == '__main__':
    main()
