#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Convert FASTQ files to FASTA format.

% python scripts/fastq-to-fasta.py [ -n -o ] <fastq_name>

TPU port of the reference scripts/fastq-to-fasta.py (same CLI/outputs).
"""

import sys
import textwrap

from khmer_tpu.io.fastx import FastxReader, Read, screed_open
from khmer_tpu.khmer_args import (FileType as khFileType,
                                  KhmerArgumentParser, sanitize_help)
from khmer_tpu.kfile import (add_output_compression_type,
                             describe_file_handle, get_file_writer)
from khmer_tpu.utils import write_record


def get_parser():
    epilog = """\
    Example::

        fastq-to-fasta.py -o outputfile.fa inputfile.fq
    """
    parser = KhmerArgumentParser(
        description='Converts FASTQ format (.fq) files to FASTA format '
        '(.fa).', epilog=textwrap.dedent(epilog))
    parser.add_argument('input_sequence', help='The name of the input'
                        ' FASTQ sequence file.')
    parser.add_argument('-o', '--output', metavar="filename",
                        type=khFileType('wb'),
                        help='The name of the output'
                        ' FASTA sequence file.',
                        default=getattr(sys.stdout, 'buffer', sys.stdout))
    parser.add_argument('-n', '--n_keep', default=False, action='store_true',
                        help='Option to keep reads containing \'N\'s in '
                        'input_sequence file. Default is to drop reads')
    add_output_compression_type(parser)
    return parser


def main():
    args = sanitize_help(get_parser()).parse_args()

    print('fastq from ', args.input_sequence, file=sys.stderr)
    outfp = get_file_writer(args.output, args.gzip, args.bzip)
    n_count = 0
    for n, record in enumerate(screed_open(args.input_sequence)):
        if n % 10000 == 0:
            print('...', n, file=sys.stderr)

        sequence = record.sequence

        if 'N' in sequence:
            if not args.n_keep:
                n_count += 1
                continue

        # drop the quality to emit FASTA
        write_record(Read(name=record.name, sequence=sequence), outfp)

    print('\n' + 'lines from ' + args.input_sequence, file=sys.stderr)

    if not args.n_keep:
        print(str(n_count) + ' lines dropped.', file=sys.stderr)
    else:
        print('No lines dropped from file.', file=sys.stderr)

    print('Wrote output to', describe_file_handle(args.output),
          file=sys.stderr)


if __name__ == '__main__':
    main()
