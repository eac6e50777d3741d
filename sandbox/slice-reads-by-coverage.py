#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Slice reads into a coverage band using a pre-built countgraph.

% python sandbox/slice-reads-by-coverage.py [-m MIN] [-M MAX] <ct> <reads> <out>

TPU port of the reference sandbox/slice-reads-by-coverage.py; per-read
medians come from batched device queries.
"""

import argparse
import sys

from khmer_tpu import Countgraph
from khmer_tpu.io.fastx import FastxReader


def output_single(read):
    if getattr(read, 'quality', None) is not None:
        return "@%s\n%s\n+\n%s\n" % (read.name, read.sequence, read.quality)
    return ">%s\n%s\n" % (read.name, read.sequence)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-m', '--min-coverage', type=int, default=None)
    parser.add_argument('-M', '--max-coverage', type=int, default=None)
    parser.add_argument('input_count_graph')
    parser.add_argument('input_readfile')
    parser.add_argument('output_readfile')
    args = parser.parse_args()

    print('min_coverage: %s' % args.min_coverage, file=sys.stderr)
    print('max_coverage: %s' % args.max_coverage, file=sys.stderr)

    if not (args.min_coverage or args.max_coverage):
        print("neither min nor max coverage specified!? exiting!",
              file=sys.stderr)
        sys.exit(1)

    if args.min_coverage and args.max_coverage and \
       args.max_coverage < args.min_coverage:
        print("min_coverage > max_coverage!? exiting!", file=sys.stderr)
        sys.exit(1)

    htable = Countgraph.load(args.input_count_graph)
    output_fp = open(args.output_readfile, 'w')

    n_kept = 0
    n = 0
    batch = []

    def flush(batch):
        nonlocal n_kept
        rows = htable.count_rows([r.cleaned_seq for r in batch])
        import numpy as np

        for read, counts in zip(batch, rows):
            if counts.size == 0:
                continue
            med = int(np.sort(counts)[counts.size // 2])
            keep = True
            if args.min_coverage and med < args.min_coverage:
                keep = False
            if args.max_coverage and med > args.max_coverage:
                keep = False
            if keep:
                n_kept += 1
                output_fp.write(output_single(read))

    for n, record in enumerate(FastxReader(args.input_readfile)):
        if n % 100000 == 0:
            print('...', n, n_kept, file=sys.stderr)
        if len(record.cleaned_seq) < htable.ksize():
            continue
        batch.append(record)
        if len(batch) >= 8192:
            flush(batch)
            batch = []
    if batch:
        flush(batch)

    print('consumed %d reads; kept %d' % (n, n_kept), file=sys.stderr)


if __name__ == '__main__':
    main()
