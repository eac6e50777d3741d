#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Estimate optimal table arguments from a nodegraph's unique-k-mer
count.

% python sandbox/optimal_args_hashbits.py <data1> [ <data2> ... ]

Writes '<data1>.optimal_args'.  TPU port of the reference
sandbox/optimal_args_hashbits.py.
"""

import sys

from khmer_tpu import Nodegraph, ReadParser, calc_expected_collisions
from khmer_tpu.kfile import check_input_files, check_space
from khmer_tpu.khmer_args import (add_threading_args, build_nodegraph_args,
                                  graphsize_args_report, info,
                                  report_on_config)


def get_parser():
    parser = build_nodegraph_args(descr="Load sequences into the "
                                  "compressible graph format plus optional "
                                  "tagset.")
    add_threading_args(parser)
    parser.add_argument('input_filenames', metavar='input_sequence_filename',
                        nargs='+', help='input FAST[AQ] sequence filename')
    return parser


def main():
    info('optimal_args_hashbits.py', ['graph', 'SeqAn'])
    args = get_parser().parse_args()
    report_on_config(args, graphtype='nodegraph')

    filenames = args.input_filenames
    base = filenames[0]
    for _ in args.input_filenames:
        check_input_files(_, False)

    check_space(args.input_filenames, False)

    print('Counting kmers from sequences in %s' % repr(filenames),
          file=sys.stderr)

    htable = Nodegraph(args.ksize, args.max_tablesize, args.n_tables)

    for filename in filenames:
        print('consuming input', filename, file=sys.stderr)
        htable.consume_seqfile(filename)
    unique_kmers = htable.n_unique_kmers()
    print('Total number of unique k-mers: {0}'.format(unique_kmers),
          file=sys.stderr)

    info_optimal = open(base + '.optimal_args', 'w')

    fp_rate = calc_expected_collisions(htable)
    print('fp rate estimated to be %1.3f' % fp_rate, file=sys.stderr)

    if fp_rate > 0.15:          # 0.18 is ACTUAL MAX. Do not change.
        print("**", file=sys.stderr)
        print("** ERROR: the graph structure is too small for this data "
              "set. Increase table size/# tables.", file=sys.stderr)
        print("**", file=sys.stderr)
        sys.exit(1)

    to_print = graphsize_args_report(unique_kmers, fp_rate)

    print(to_print, file=info_optimal)

    print('optimal arguments were written to', base + '.optimal_args',
          file=sys.stderr)


if __name__ == '__main__':
    main()
