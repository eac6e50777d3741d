#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Pull out reads that touch none of an assembly's tag k-mers.

Usage: extract-unassembled-reads-2.py <assembly> <reads> [ <reads2> .. ]

Output lands in '<reads>.leftover' (or the -o file).  Equivalent of
the reference sandbox/extract-unassembled-reads-2.py: the assembly is
tagged densely (every 20 k-mers) and any read owning zero tags is
considered unassembled.
"""

import argparse
import os.path
import sys

from khmer_tpu import Nodegraph
from khmer_tpu.io.fastx import FastxReader
from khmer_tpu.utils import write_record

DEFAULT_KSIZE = 31
NODEGRAPH_SIZE = 1e8
ASSEMBLY_TAG_DENSITY = 20


def build_cli():
    cli = argparse.ArgumentParser(
        description='extract reads not represented in an assembly')
    cli.add_argument('assembly')
    cli.add_argument('readfiles', nargs='+')
    cli.add_argument('-o', '--output', default=None)
    cli.add_argument('-k', '--ksize', default=DEFAULT_KSIZE, type=int)
    cli.add_argument('-x', '--tablesize', default=NODEGRAPH_SIZE,
                     type=float)
    return cli


def main():
    opts = build_cli().parse_args()

    graph = Nodegraph(opts.ksize, opts.tablesize, 4)
    graph._set_tag_density(ASSEMBLY_TAG_DENSITY)

    print('loading & tagging assembly from:', opts.assembly)
    graph.consume_seqfile_and_tag(opts.assembly)

    shared_out = open(opts.output, 'w') if opts.output else None

    n_seen = 0
    n_kept = 0
    for readfile in opts.readfiles:
        print('loading reads from:', readfile)
        if shared_out is not None:
            out = shared_out
        else:
            name = os.path.basename(readfile) + '.leftover'
            out = open(name, 'w')
            print('writing to:', name, file=sys.stderr)

        for record in FastxReader(readfile):
            if n_seen % 100000 == 0 and n_seen:
                print('...', readfile, n_seen, n_kept, file=sys.stderr)
            n_seen += 1
            if not graph.get_tags_and_positions(record.sequence):
                write_record(record, out)
                n_kept += 1

        if shared_out is None:
            out.close()

    print('%d left out of assembly, of %d reads' % (n_kept, n_seen),
          file=sys.stderr)


if __name__ == '__main__':
    main()
