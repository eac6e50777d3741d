#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Streaming assembly with a per-read action log written as CSV.

Usage: python sandbox/assemble-and-track.py -o stats.csv <reads.fq> ...

Equivalent of the reference sandbox/assemble-and-track.py: the
assemble-on-the-go flow, logging one CSV row per consume ('c'),
label ('l'), or assemble ('a') action.
"""

import argparse
import csv
import sys

from khmer_tpu import GraphLabels
from khmer_tpu.io.fastx import FastxReader
from khmer_tpu.khmer_args import build_counting_args, create_countgraph

COV_LOW = 20
COV_ASSEMBLE = 30
MIN_ORF_LEN = 99

# standard genetic code, TCAG-nested codon order
_CODE = 'FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG'
_BASES = 'TCAG'
DNA_TO_AA = {
    a + b + c: _CODE[16 * i + 4 * j + k]
    for i, a in enumerate(_BASES)
    for j, b in enumerate(_BASES)
    for k, c in enumerate(_BASES)
}
_RC = str.maketrans('ACGTN', 'TGCAN')


def six_frame_peptides(seq):
    rc = seq.translate(_RC)[::-1]
    for frame_src in (seq, rc):
        for start in (0, 1, 2):
            yield ''.join(
                DNA_TO_AA.get(frame_src[i:i + 3], 'X')
                for i in range(start, len(frame_src), 3))


def orfs_of(seq, min_length=MIN_ORF_LEN):
    for pep in six_frame_peptides(seq):
        for orf in pep.split('*'):
            if len(orf) >= min_length:
                yield orf


def main():
    cli = build_counting_args(descr='Streaming assembly with tracking '
                              'info')
    cli.add_argument('fastq_files', nargs='+')
    cli.add_argument('-o', type=argparse.FileType('w'),
                     default='assembly-stats.csv')
    opts = cli.parse_args()

    graph = create_countgraph(opts)
    labels = GraphLabels(graph)
    next_label = 1
    next_orf = 1
    emitted = set()

    log = csv.DictWriter(
        opts.o, delimiter=',',
        fieldnames=['read_n', 'action', 'cov', 'n_hdn', 'contig_n',
                    'orf_n', 'new'])

    def row(read_n, action, cov, **extra):
        entry = {'read_n': read_n, 'action': action, 'cov': cov,
                 'n_hdn': None, 'contig_n': None, 'orf_n': None,
                 'new': None}
        entry.update(extra)
        log.writerow(entry)

    n = 0
    for filename in opts.fastq_files:
        for record in FastxReader(filename):
            n += 1
            if n % 10000 == 0:
                print('...', n, file=sys.stderr)

            seq = record.sequence
            if len(seq) < opts.ksize:
                continue

            cov, _, _ = graph.get_median_count(seq)

            if cov < COV_LOW:
                graph.consume(seq)
                row(n, 'c', cov)
            elif cov < COV_ASSEMBLE:
                trimmed, _ = graph.trim_on_abundance(seq, 3)
                if len(trimmed) < opts.ksize:
                    continue
                graph.consume(trimmed)
                hdn = graph.find_high_degree_nodes(trimmed)
                labels.label_across_high_degree_nodes(trimmed, hdn,
                                                      next_label)
                next_label += 1
                row(n, 'l', cov, n_hdn=len(hdn))
            elif cov == COV_ASSEMBLE:
                contigs = labels.assemble_labeled_path(
                    seq[:opts.ksize])
                for contig_n, contig in enumerate(contigs):
                    row(n, 'a', cov, contig_n=contig_n)
                    for orf_n, orf in enumerate(orfs_of(contig)):
                        new = hash(orf) not in emitted
                        if new:
                            emitted.add(hash(orf))
                            print('>orf%d\n%s' % (next_orf, orf))
                            next_orf += 1
                        row(n, 'a', cov, contig_n=contig_n,
                            orf_n=orf_n, new=new)


if __name__ == '__main__':
    main()
