#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Sweep reads that overlap each of several input contig/read files.

% python sandbox/sweep-reads3.py -x 1e8 <file1> [<file2> ...] <search reads>

Results end up in <search reads>.sweep3.

TPU port of the reference sandbox/sweep-reads3.py (one Nodegraph per
query file; reads whose median membership is nonzero are swept into
that file's output).
"""

import os.path
import sys

import khmer_tpu as khmer
from khmer_tpu.io.fastx import FastxReader
from khmer_tpu.khmer_args import build_nodegraph_args


def output_single(r):
    if getattr(r, 'quality', None) is not None:
        return "@%s\n%s\n+\n%s\n" % (r.name, r.sequence, r.quality)
    return ">%s\n%s\n" % (r.name, r.sequence)


def main():
    parser = build_nodegraph_args(
        "Sweep reads that overlap the input files.")
    parser.add_argument('input_filenames', nargs='+')
    parser.add_argument('read_filename')

    args = parser.parse_args()

    K = args.ksize

    inputlist = args.input_filenames
    readsfile = args.read_filename

    query_list = []
    for inp_name in inputlist:
        ht = khmer.Nodegraph(K, args.max_tablesize, args.n_tables)
        outfile = os.path.basename(inp_name) + '.sweep3'
        outfp = open(outfile, 'w')
        query_list.append((ht, outfp))

    for n, inp_name in enumerate(inputlist):
        ht = query_list[n][0]
        print('loading input reads from', inp_name, file=sys.stderr)
        ht.consume_seqfile(inp_name)

    print('starting sweep.', file=sys.stderr)

    m = 0
    for n, record in enumerate(FastxReader(readsfile)):
        if len(record.sequence) < K:
            continue

        if n % 10000 == 0:
            print('...', n, m, file=sys.stderr)

        for ht, outfp in query_list:
            count = ht.get_median_count(record.cleaned_seq)[0]
            if count:
                m += 1
                outfp.write(output_single(record))


if __name__ == '__main__':
    main()
