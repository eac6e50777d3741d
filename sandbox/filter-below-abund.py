#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Trim sequences at k-mers ABOVE the given abundance (the inverse of
filter-abund): use to eliminate highly repetitive sequence.

% python sandbox/filter-below-abund.py <countgraph> <data1> [ <data2> ... ]

TPU port of the reference sandbox/filter-below-abund.py.
"""

import os
import sys

from khmer_tpu import Countgraph
from khmer_tpu.thread_utils import ThreadedSequenceProcessor, verbose_loader

CUTOFF = 50


def main():
    counting_ht = sys.argv[1]
    infiles = sys.argv[2:]

    print('file with ht: %s' % counting_ht, file=sys.stderr)

    print('making hashtable', file=sys.stderr)
    ht = Countgraph.load(counting_ht)
    ksize = ht.ksize()

    for infile in infiles:
        print('filtering', infile, file=sys.stderr)
        outfile = os.path.basename(infile) + '.below'
        outfp = open(outfile, 'w')

        def process_fn(record, ht=ht):
            name = record.name
            seq = record.sequence
            if 'N' in seq:
                return None, None

            trim_seq, trim_at = ht.trim_below_abundance(seq, CUTOFF)

            if trim_at >= ksize:
                return name, trim_seq

            return None, None

        tsp = ThreadedSequenceProcessor(process_fn)
        tsp.start(verbose_loader(infile), outfp)


if __name__ == '__main__':
    main()
