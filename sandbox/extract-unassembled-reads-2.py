#!/usr/bin/env python
"""Extract reads carrying none of an assembly's tags.

% python sandbox/extract-unassembled-reads-2.py <assembly> <reads> [ ... ]

Output in '<reads>.leftover' (or -o).  TPU port of the reference
sandbox/extract-unassembled-reads-2.py: tag the assembly densely
(density 20) and extract reads that touch no tag.
"""

import argparse
import os.path
import sys

from khmer_tpu import Nodegraph
from khmer_tpu.io.fastx import FastxReader
from khmer_tpu.utils import write_record

DEFAULT_KSIZE = 31
NODEGRAPH_SIZE = 1e8


def main():
    p = argparse.ArgumentParser()
    p.add_argument('assembly')
    p.add_argument('readfiles', nargs='+')
    p.add_argument('-o', '--output', default=None)
    p.add_argument('-k', '--ksize', default=DEFAULT_KSIZE, type=int)
    p.add_argument('-x', '--tablesize', default=NODEGRAPH_SIZE,
                   type=float)
    args = p.parse_args()

    ng = Nodegraph(args.ksize, args.tablesize, 4)
    ng._set_tag_density(20)

    print('loading & tagging assembly from:', args.assembly)
    ng.consume_seqfile_and_tag(args.assembly)

    outfp = None
    if args.output:
        outfp = open(args.output, 'w')

    n = 0
    m = 0
    for readfile in args.readfiles:
        print('loading reads from:', readfile)
        if not args.output:
            outfile = os.path.basename(readfile) + '.leftover'
            outfp = open(outfile, 'w')
            print('writing to:', outfile, file=sys.stderr)

        for record in FastxReader(readfile):
            if n % 100000 == 0 and n:
                print('...', readfile, n, m, file=sys.stderr)
            x = ng.get_tags_and_positions(record.sequence)
            if not x:
                write_record(record, outfp)
                m += 1
            n += 1

        if not args.output:
            outfp.close()

    print('%d left out of assembly, of %d reads' % (m, n), file=sys.stderr)


if __name__ == '__main__':
    main()
