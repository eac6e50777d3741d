#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Per-file and aggregate read statistics (bp, sequences, average
length) for FASTA/FASTQ inputs.

Usage: readstats.py [ -o output.txt ] <file1> <file2> ...
Same CLI and output text as the reference scripts/readstats.py.
"""

import argparse
import csv
import sys
import textwrap

from khmer_tpu.io.fastx import FastxReader, screed_open
from khmer_tpu.khmer_args import KhmerArgumentParser, sanitize_help


def get_parser():
    descr = "Report bp/sequence/average-length statistics per file."
    epilog = """\
    Prints bases, sequence count and mean length per input file, with
    an aggregate line at the end.  Example::

        readstats.py reads-1.fa reads-2.fq
    """
    parser = KhmerArgumentParser(
        description=descr, epilog=textwrap.dedent(epilog))
    parser.add_argument('filenames', nargs='+')
    parser.add_argument('-o', '--output', dest='outfp', metavar="filename",
                        help="write statistics here instead of "
                        "stdout", type=argparse.FileType('w'),
                        default=sys.stdout)
    parser.add_argument('--csv', default=False, action='store_true',
                        help='emit CSV (with a header row) instead of '
                        'plain text')
    return parser


def _report(statistics, outfp, as_csv):
    """Write the per-file stats plus an aggregate line.  Output text
    is the reference's user contract; the formatter plumbing is not."""
    if as_csv:
        writer = csv.writer(outfp)
        writer.writerow(['bp', 'seqs', 'avg_len', 'filename'])
        for bps, seqs, filename in statistics:
            writer.writerow([bps, seqs, "%.1f" % (bps / float(seqs)),
                             filename])
        return
    outfp.write('---------------\n')
    bp_total = 0
    seqs_total = 0
    for bps, seqs, filename in statistics:
        bp_total += bps
        seqs_total += seqs
        outfp.write('%d bp / %d seqs; %.1f average length -- %s\n' %
                    (bps, seqs, bps / float(seqs), filename))
    outfp.write('---------------\n')
    outfp.write('%d bp / %d seqs; %.1f average length -- total\n' %
                (bp_total, seqs_total, bp_total / float(seqs_total)))


def analyze_file(filename):
    """Run over the given file and count base pairs and sequences."""
    bps = 0
    seqs = 0
    for record in screed_open(filename):
        if seqs % 100000 == 0:
            print('...', filename, seqs, file=sys.stderr)
        bps += len(record.sequence)
        seqs += 1
    return bps, seqs


def main():
    args = sanitize_help(get_parser()).parse_args()

    statistics = []

    for filename in args.filenames:
        try:
            bps, seqs = analyze_file(filename)
        except (IOError, OSError, EOFError, ValueError) as exc:
            print('ERROR in opening %s:' % filename, file=sys.stderr)
            print('     ', str(exc), file=sys.stderr)
            continue

        if seqs:
            statistics.append((bps, seqs, filename))
            avg = bps / float(seqs)
            msg = '%d bps / %d seqs; %.1f average length -- %s' % (
                bps, seqs, avg, filename)
            print('... found', msg, file=sys.stderr)
        else:
            print('No sequences found in %s' % filename, file=sys.stderr)

    if statistics:
        _report(statistics, args.outfp, args.csv)
    else:
        print('No sequences found in %d files' %
              len(args.filenames), file=args.outfp)


if __name__ == '__main__':
    main()
