#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Extract reads whose tags carry no assembly label (i.e. reads not
represented in an assembly).

% python sandbox/extract-unassembled-reads.py <assembly> <reads> [ ... ]

Output in '<reads>.leftover2' (or -o).  TPU port of the reference
sandbox/extract-unassembled-reads.py: tag the reads, label the
assembly's tags, extract reads owning an unlabeled tag.
"""

import argparse
import os.path
import sys

from khmer_tpu import GraphLabels, Nodegraph
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

    # first, tag every read's k-mers
    for readfile in args.readfiles:
        print('loading & tagging reads from:', readfile)
        ng.consume_seqfile_and_tag(readfile)

    # next, consume & label the assembly
    print('loading & tagging assembly from:', args.assembly)
    lh = GraphLabels(ng)
    lh.consume_seqfile_and_tag_with_labels(args.assembly)

    outfp = None
    if args.output:
        outfp = open(args.output, 'w')

    # finally, walk across the reads & find those with no labels
    n = 0
    m = 0

    for readfile in args.readfiles:
        print('loading reads from:', readfile)
        if not args.output:
            outfile = os.path.basename(readfile) + '.leftover2'
            outfp = open(outfile, 'w')
            print('writing to:', outfile, file=sys.stderr)

        for record in FastxReader(readfile):
            if n % 100000 == 0 and n:
                print('...', readfile, n, m, file=sys.stderr)
            x = ng.get_tags_and_positions(record.sequence)

            do_extract = False
            for (pos, tag) in x:
                if not lh.get_tag_labels(tag):
                    do_extract = True
                    break

            if do_extract:
                write_record(record, outfp)
                m += 1

            n += 1

        if not args.output:
            outfp.close()

    print('%d left out of assembly, of %d reads' % (m, n), file=sys.stderr)


if __name__ == '__main__':
    main()
