#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Estimate the k-mer overlap of two datasets with HyperLogLog.

% python sandbox/kmer-intersection.py [-k K] [-e ERR] <file1> <file2>

TPU port of the reference sandbox/kmer-intersection.py: cardinality of
each file plus inclusion-exclusion overlap, and a saturation 'curve'
file sampled on a log schedule over the second input.
"""

import argparse
import math

from khmer_tpu import HLLCounter
from khmer_tpu.io.fastx import FastxReader
from khmer_tpu.khmer_args import DEFAULT_K


def get_parser():
    parser = argparse.ArgumentParser(
        description='Estimate k-mer overlap of two sequence files.')
    parser.add_argument('-q', '--quiet', dest='quiet', default=False,
                        action='store_true')
    parser.add_argument('--ksize', '-k', type=int, default=DEFAULT_K,
                        help='k-mer size to use')
    parser.add_argument('--error-rate', '-e', type=float, default=0.01,
                        help='Acceptable error rate')
    parser.add_argument('-R', '--report',
                        metavar='filename', type=argparse.FileType('w'))
    parser.add_argument('input_filenames', metavar='input_sequence_filename',
                        help='Input FAST[AQ] sequence filename.', nargs='+')
    return parser


def main():
    args = get_parser().parse_args()

    total_hll = HLLCounter(args.error_rate, args.ksize)
    curve = []

    first = HLLCounter(args.error_rate, args.ksize)
    first.consume_seqfile(args.input_filenames[0])
    total_hll.merge(first)

    second = HLLCounter(args.error_rate, args.ksize)
    n = 0
    for n, record in enumerate(FastxReader(args.input_filenames[1])):
        second.consume_string(record.sequence)
        interval = int(math.log(n + 1, 1.1)) or 1
        if n < 100 or n % interval == 0:
            # HLL merge is a register max -> idempotent, safe to repeat
            total_hll.merge(second)
            curve.append((n, len(first) + len(second) - len(total_hll)))

    total_hll.merge(second)
    overlap = len(first) + len(second) - len(total_hll)
    print('# of unique k-mers in dataset 1:', len(first))
    print('# of unique k-mers in dataset 2:', len(second))
    print('# of overlap unique k-mers:', overlap)
    if args.report:
        print(len(first), len(second), overlap, file=args.report)

    total_reads = curve[-1][0] if curve else 0
    interval = max(total_reads // 100, 1)
    with open('curve', 'w') as f:
        for c in curve:
            if c[0] % interval == 0:
                f.write("%d %d\n" % (c[0], c[1]))


if __name__ == "__main__":
    main()
