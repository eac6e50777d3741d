#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Pick the assembly with the most bp in contigs above a size cutoff.

% python sandbox/calc-best-assembly.py [ -C cutoff ] <asm1> [ <asm2> ... ]

TPU port of the reference sandbox/calc-best-assembly.py.
"""

import argparse
import sys

from khmer_tpu.io.fastx import FastxReader

DEFAULT_SIZE_CUTOFF = 500


def calculate_bp_above_cutoff(filename, cutoff):
    total = 0
    for record in FastxReader(filename):
        if len(record.sequence) >= cutoff:
            total += len(record.sequence)
    return total


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-C', '--cutoff', type=int, dest='cutoff',
                        default=DEFAULT_SIZE_CUTOFF)
    parser.add_argument('-o', '--output-file', dest='output_file',
                        type=argparse.FileType('w'))
    parser.add_argument('-q', '--quiet', dest='quiet',
                        action='store_true')
    parser.add_argument('assembly_files', nargs='+')

    args = parser.parse_args()

    stats = []
    for filename in args.assembly_files:
        try:
            total = calculate_bp_above_cutoff(filename, args.cutoff)
        except IOError:
            print("** WARNING: %s does not exist, skipping" % filename,
                  file=sys.stderr)
            continue

        stats.append((total, filename))

        if not args.quiet:
            print("assembly %s has %d bp > %d" % (filename, total,
                                                  args.cutoff),
                  file=sys.stderr)

    stats.sort(reverse=True)

    best_total, winner_file = stats[0]
    print('----', file=sys.stderr)
    print("assembly %s wins: %d total bp > %d" % (winner_file,
                                                  best_total,
                                                  args.cutoff),
          file=sys.stderr)

    if args.output_file:
        for record in FastxReader(winner_file):
            print('>%s\n%s' % (record.name, record.sequence),
                  file=args.output_file)

    print(winner_file)


if __name__ == '__main__':
    main()
