#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Error correct reads based on a counting hash from a diginorm step.

% python sandbox/error-correct-pass2.py <counting.ct> <data1> [ <data2> ... ]

Use '-h' for parameter help.

TPU port of the reference sandbox/error-correct-pass2.py (ReadAligner-
based pass-2 correction used by the stamps example pipeline).
"""

import os
import sys

import khmer_tpu as khmer
from khmer_tpu import Countgraph, khmer_args
from khmer_tpu.io.fastx import FastxReader
from khmer_tpu.khmer_args import FileType as khFileType

DEFAULT_CUTOFF = 2


def output_single(read, new_sequence):
    name = read.name
    sequence = new_sequence

    quality = None
    if getattr(read, 'quality', None) is not None:
        quality = read.quality[:len(sequence)]
        sequence = sequence[:len(quality)]  # sequence is _lengthened_

    if quality:
        assert len(sequence) == len(quality), (sequence, quality)
        return "@%s\n%s\n+\n%s\n" % (name, sequence, quality)
    return ">%s\n%s\n" % (name, sequence)


def main():
    parser = khmer_args.build_counting_args(
        "Correct reads against an already-computed table",
        citations=['counting', 'SeqAn'])

    parser.add_argument("--trusted-cov", dest="trusted_cov", type=int,
                        default=DEFAULT_CUTOFF)
    parser.add_argument("--theta", dest="bits_theta", type=float,
                        default=1.0)
    parser.add_argument('-o', '--output', dest='output_file',
                        help="output file for histogram; defaults to "
                             "<first filename>.corr in cwd.",
                        type=khFileType('w'), default=None)
    parser.add_argument('counts_table')
    parser.add_argument('readfile')

    args = parser.parse_args()

    print('loading counts')
    ht = Countgraph.load(args.counts_table)

    aligner = khmer.ReadAligner(ht, args.trusted_cov, args.bits_theta)

    print("trusted:", args.trusted_cov)

    corrfp = args.output_file
    if not corrfp:
        outfile = os.path.basename(args.readfile) + '.corr'
        corrfp = open(outfile, 'w')

    n_corrected = 0
    for n, read in enumerate(FastxReader(args.readfile)):
        if n % 10000 == 0:
            print('...', n, n_corrected, file=sys.stderr)
        seq = read.sequence.replace('N', 'A')

        # build the alignment...
        score, graph_alignment, read_alignment, truncated = \
            aligner.align(seq)

        if not truncated:
            graph_seq = graph_alignment.replace("-", "")
            if graph_seq != seq:
                n_corrected += 1

            seq = graph_seq

        corrfp.write(output_single(read, seq))


if __name__ == '__main__':
    main()
