#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Produce k-mer counts for all the k-mers in the given sequence file,
building the countgraph on the fly.

% python sandbox/count-kmers-single.py <fasta/fastq>

TPU port of the reference sandbox/count-kmers-single.py.
"""

import argparse
import csv
import sys

import khmer_tpu as khmer
from khmer_tpu.io.fastx import FastxReader
from khmer_tpu.khmer_args import (add_threading_args, build_counting_args,
                                  info, report_on_config)
from khmer_tpu.kfile import check_input_files


def get_parser():
    parser = build_counting_args(
        descr="Output abundances of the k-mers in the sequence file.")
    add_threading_args(parser)
    parser.add_argument('input_sequence_filename', help='The input'
                        ' FAST[AQ] sequence file.')
    parser.add_argument('-o', '--out', metavar="output_file",
                        dest='output_file',
                        type=argparse.FileType('w'),
                        default=None, help='output counts to this file')
    return parser


def main():
    info('count-kmers-single.py', ['counting'])
    args = get_parser().parse_args()

    check_input_files(args.input_sequence_filename, False)

    print('making k-mer countgraph', file=sys.stderr)
    countgraph = khmer.Countgraph(args.ksize, args.max_tablesize,
                                  args.n_tables)

    kmer_size = countgraph.ksize()
    hashsizes = countgraph.hashsizes()
    tracking = khmer.Nodegraph(kmer_size, 1, 1, primes=hashsizes)

    print('kmer_size: %s' % countgraph.ksize(), file=sys.stderr)
    print('k-mer countgraph sizes: %s' % countgraph.hashsizes(),
          file=sys.stderr)

    if args.output_file is None:
        args.output_file = sys.stdout
    writer = csv.writer(args.output_file)

    countgraph.consume_seqfile(args.input_sequence_filename)

    for record in FastxReader(args.input_sequence_filename):
        seq = record.sequence.replace('N', 'A')
        hashes, counts = countgraph._hash_count_rows([seq])[0]
        for i, (h, c) in enumerate(zip(hashes, counts)):
            if not tracking.get(int(h)):
                tracking.add(int(h))
                writer.writerow([seq[i:i + kmer_size], str(int(c))])

    print('Total number of unique k-mers: {0}'.format(
        countgraph.n_unique_kmers()), file=sys.stderr)


if __name__ == '__main__':
    main()
