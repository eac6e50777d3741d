#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Use a set of query reads to sweep out overlapping reads from
another file.

% python sandbox/sweep-reads2.py <query reads> <search reads>

Results end up in '<search reads>.sweep2'.  TPU port of the reference
sandbox/sweep-reads2.py (a read is kept when its median k-mer count in
the query countgraph is nonzero).
"""

import os.path

from khmer_tpu import khmer_args
from khmer_tpu.io.fastx import FastxReader
from khmer_tpu.khmer_args import build_nodegraph_args
from khmer_tpu.utils import (broken_paired_reader, write_record,
                             write_record_pair)


def main():
    parser = build_nodegraph_args()
    parser.add_argument('-o', '--outfile',
                        help='output file; default is "infile".sweep2')
    parser.add_argument('-q', '--quiet', action='store_true')
    parser.add_argument('input_filename')
    parser.add_argument('read_filename')

    args = parser.parse_args()

    inp = args.input_filename
    readsfile = args.read_filename

    outfile = os.path.basename(readsfile) + '.sweep2'
    if args.outfile:
        outfile = args.outfile
    outfp = open(outfile, 'w')

    ht = khmer_args.create_countgraph(args)

    print('loading input reads from', inp)
    ht.consume_seqfile(inp)

    print('starting sweep.')

    m = 0
    instream = FastxReader(readsfile)
    for n, is_pair, read1, read2 in broken_paired_reader(instream):
        if n % 10000 == 0:
            print('...', n, m)

        if is_pair:
            count1 = ht.get_median_count(read1.sequence)[0]
            count2 = ht.get_median_count(read2.sequence)[0]
            if count1 or count2:
                m += 1
                write_record_pair(read1, read2, outfp)
        else:
            count = ht.get_median_count(read1.sequence)[0]
            if count:
                m += 1
                write_record(read1, outfp)


if __name__ == '__main__':
    main()
