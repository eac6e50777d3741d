#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Output abundances of the k-mers in the sequence files using a
pre-made k-mer countgraph.

% python sandbox/count-kmers.py <ct> <fasta/fastq> [ <fasta/fastq> ... ]

TPU port of the reference sandbox/count-kmers.py.
"""

import argparse
import csv
import sys

import khmer_tpu as khmer
from khmer_tpu import Countgraph
from khmer_tpu.io.fastx import FastxReader
from khmer_tpu.khmer_args import info


def get_parser():
    parser = argparse.ArgumentParser(
        description="Output abundances of the k-mers in "
        "the sequence files using a pre-made k-mer countgraph.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument('input_count_graph_filename', help='The name of the'
                        ' input k-mer countgraph file.')
    parser.add_argument('input_sequence_filenames', help='The input'
                        ' FAST[AQ] sequence file(s).', nargs='+')
    parser.add_argument('-o', '--out', metavar="output_file",
                        dest='output_file',
                        type=argparse.FileType('w'),
                        default=None, help='output counts to this file')
    return parser


def main():
    info('count-kmers.py', ['counting'])
    args = get_parser().parse_args()

    print('hashtable from', args.input_count_graph_filename,
          file=sys.stderr)
    countgraph = Countgraph.load(args.input_count_graph_filename)

    kmer_size = countgraph.ksize()
    hashsizes = countgraph.hashsizes()
    tracking = khmer.Nodegraph(kmer_size, 1, 1, primes=hashsizes)

    if args.output_file is None:
        args.output_file = sys.stdout
    writer = csv.writer(args.output_file)

    import numpy as np

    BATCH = 4096
    for filename in args.input_sequence_filenames:
        batch = []
        reader = FastxReader(filename)

        def flush(batch):
            seqs = [r.sequence.replace('N', 'A') for r in batch]
            pairs = countgraph._hash_count_rows(seqs)
            flat = np.concatenate([h for h, _ in pairs]) if pairs \
                else np.zeros(0, np.uint64)
            if flat.size == 0:
                return
            # batched tracking: ONE membership query + ONE add per
            # batch; duplicates resolve to their first stream position
            # on the host (sequential first-print semantics)
            seen = np.asarray(tracking.storage.get_batch(flat)) > 0
            _, first = np.unique(flat, return_index=True)
            new = np.zeros(flat.shape[0], bool)
            new[np.sort(first)] = True
            new &= ~seen
            if new.any():
                tracking.storage.add_batch(flat[new])
            off = 0
            for seq, (h, c) in zip(seqs, pairs):
                for i in np.flatnonzero(new[off: off + h.size]):
                    writer.writerow(
                        [seq[i:i + kmer_size], str(int(c[i]))])
                off += h.size

        for record in reader:
            batch.append(record)
            if len(batch) >= BATCH:
                flush(batch)
                batch = []
        if batch:
            flush(batch)

    print('Total number of unique k-mers: {0}'.format(
        countgraph.n_unique_kmers()), file=sys.stderr)


if __name__ == '__main__':
    main()
