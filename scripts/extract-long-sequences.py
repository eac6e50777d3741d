#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Extract FASTQ or FASTA sequences longer than specified length
(default: 200 bp).

% scripts/extract-long-sequences.py [ -o <outfile> ] <input FAST[AQ]> ...

TPU port of the reference scripts/extract-long-sequences.py (same
CLI/outputs).
"""

import sys
import textwrap

from khmer_tpu.io.fastx import FastxReader, screed_open
from khmer_tpu.khmer_args import (FileType as khFileType,
                                  KhmerArgumentParser, sanitize_help)
from khmer_tpu.kfile import add_output_compression_type, get_file_writer
from khmer_tpu.utils import write_record


def get_parser():
    epilog = """\
    Example::

        extract-long-sequences.py --length 10 tests/test-data/paired-mixed.fa
    """
    parser = KhmerArgumentParser(
        description='Extract FASTQ or FASTA sequences longer than'
        ' specified length (default: 200 bp).',
        epilog=textwrap.dedent(epilog))
    parser.add_argument('input_filenames', help='Input FAST[AQ]'
                        ' sequence filename.', nargs='+')
    parser.add_argument('-o', '--output', help='The name of the output'
                        ' sequence file.', default=getattr(sys.stdout, 'buffer', sys.stdout),
                        metavar='output', type=khFileType('wb'))
    parser.add_argument('-l', '--length', help='The minimum length of'
                        ' the sequence file.',
                        type=int, default=200)
    add_output_compression_type(parser)
    return parser


def main():
    args = sanitize_help(get_parser()).parse_args()
    outfp = get_file_writer(args.output, args.gzip, args.bzip)
    for filename in args.input_filenames:
        for record in screed_open(filename):
            if len(record.sequence) >= args.length:
                write_record(record, outfp)
    print('wrote to: ' + str(getattr(args.output, 'name', 'stdout')),
          file=sys.stderr)


if __name__ == '__main__':
    main()
