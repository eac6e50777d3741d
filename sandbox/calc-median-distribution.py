#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Output the distribution of median k-mer abundances per read.

% sandbox/calc-median-distribution.py <countgraph> <seqfile> <histout>

TPU port of the reference sandbox/calc-median-distribution.py; the
per-read medians come from batched device queries.
"""

import argparse
import sys

from khmer_tpu import Countgraph
from khmer_tpu.io.fastx import FastxReader


def main():
    parser = argparse.ArgumentParser(
        description="Output k-mer abundance distribution.")
    parser.add_argument('hashname')
    parser.add_argument('seqfile')
    parser.add_argument('histout')

    args = parser.parse_args()

    outfp = open(args.histout, 'w')

    print('hashtable from', args.hashname, file=sys.stderr)
    ht = Countgraph.load(args.hashname)

    hist = {i: 0 for i in range(65536)}

    for n, record in enumerate(FastxReader(args.seqfile)):
        if n > 0 and n % 100000 == 0:
            print('...', n, file=sys.stderr)

        seq = record.sequence.replace('N', 'A')

        try:
            med, _, _ = ht.get_median_count(seq)
        except ValueError:
            continue

        hist[med] += 1

    histlist = sorted(hist.items())
    sumk = sum(hist.values())

    sofar = 0
    for n, m in histlist:
        sofar += m
        percent = float(sofar) / sumk
        outfp.write('%d %d %d %.3f\n' % (n, m, sofar, percent))
    outfp.close()


if __name__ == '__main__':
    main()
