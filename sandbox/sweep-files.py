#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Route query reads to the database files they connect to in the
de Bruijn graph.

Usage: sweep-files.py -r <range> --db <fasta/q ...> --query <fasta/q ...>

Each --db file gets its own label; every --query read is appended to
the '.sweep' output of each database file whose label neighborhood it
touches.  Equivalent of the reference sandbox/sweep-files.py.
"""

import os
import sys
from collections import deque

from khmer_tpu import GraphLabels, Nodegraph
from khmer_tpu.io.fastx import FastxReader
from khmer_tpu.khmer_args import (build_nodegraph_args, report_on_config,
                                  sanitize_help)

DEFAULT_OUT_PREF = 'reads'
DEFAULT_RANGE = -1
MIN_HSIZE = 4e7
MIN_KSIZE = 21


def build_cli():
    cli = build_nodegraph_args('Takes a partitioned reference file '
                               'and a list of reads, and sorts reads '
                               'by which partition they connect to')
    cli.epilog = (
        'Each database file gets one .sweep output holding the query '
        'sequences connected to it in the graph; --range bounds the '
        'traversal breadth (default: unbounded).')
    cli.add_argument('-r', '--traversal_range', type=int,
                     dest='traversal_range', default=DEFAULT_RANGE,
                     help='depth of breadth-first search to perform '
                     'from each read')
    cli.add_argument('--max_queue_size', type=int, default=1000)
    cli.add_argument('--prefix', dest='output_prefix',
                     default=DEFAULT_OUT_PREF,
                     help='Prefix for sorted read files')
    cli.add_argument('--outdir', dest='outdir', default='',
                     help='output directory; default is location of '
                     'fastp file')
    cli.add_argument('--query', dest='query', nargs='+',
                     help='Reads to be swept and sorted')
    cli.add_argument('--db', dest='db', nargs='+',
                     help='Database reads for sweep', required=True)
    return cli


def _as_fastx(record):
    if getattr(record, 'quality', None):
        return "@%s\n%s\n+\n%s\n" % (record.name, record.sequence,
                                     record.quality)
    return ">%s\n%s\n" % (record.name, record.sequence)


class BufferedOutput(deque):
    """Bounded record buffer that spills to its file when full."""

    def __init__(self, limit, outfp):
        deque.__init__(self)
        self.outfp = outfp
        self.limit = limit

    def append(self, record):
        deque.append(self, record)
        if len(self) >= self.limit:
            self.clear()

    def clear(self):
        while len(self):
            self.outfp.write(_as_fastx(self.popleft()))
        deque.clear(self)


def main():
    opts = sanitize_help(build_cli()).parse_args()

    opts.max_tablesize = max(opts.max_tablesize, MIN_HSIZE)
    opts.ksize = max(opts.ksize, MIN_KSIZE)

    report_on_config(opts, graphtype='nodegraph')

    labels = GraphLabels(
        Nodegraph(opts.ksize, opts.max_tablesize, opts.n_tables))

    # one label + one output buffer per database file
    outputs = {}
    print('consuming and labeling input sequences...', file=sys.stderr)
    for label, dbfile in enumerate(opts.db):
        name = opts.output_prefix + os.path.basename(dbfile)
        outfp = open(os.path.join(opts.outdir, name) + '.sweep', 'w')
        outputs[label] = BufferedOutput(opts.max_queue_size, outfp)

        for n, record in enumerate(FastxReader(dbfile)):
            if n % 50000 == 0:
                print('...consumed {n} sequences...'.format(n=n),
                      file=sys.stderr)
            labels.consume_sequence_and_tag_with_labels(record.sequence,
                                                        label)

    print('done consuming input sequence. '
          'added {t} tags and {l} labels...'.format(
              t=labels.graph.n_tags, l=labels.n_labels),
          file=sys.stderr)

    n_labeled = 0
    n_orphaned = 0
    n_multi = 0

    for read_file in opts.query or ():
        print('** sweeping {read_file} for labels...'.format(
            read_file=read_file), file=sys.stderr)
        for n, record in enumerate(FastxReader(read_file)):
            if n % 50000 == 0 and n > 0:
                print('\tswept {n} reads [{nc} labeled, {no} orphaned]'
                      .format(n=n, nc=n_labeled, no=n_orphaned),
                      file=sys.stderr)
            try:
                found = labels.sweep_label_neighborhood(
                    record.sequence, opts.traversal_range)
            except ValueError:
                continue                # read shorter than k
            if found:
                n_labeled += 1
                n_multi += len(found) > 1
                for label in found:
                    outputs[label].append(record)
            else:
                n_orphaned += 1
        print('** End of file {fn}...'.format(fn=read_file),
              file=sys.stderr)

    print('** End of run...', file=sys.stderr)
    for buffered in outputs.values():
        buffered.clear()

    print('swept {n_reads}...'.format(n_reads=n_labeled + n_orphaned),
          file=sys.stderr)
    print('...with {nc} labeled and {no} orphaned'.format(
        nc=n_labeled, no=n_orphaned), file=sys.stderr)
    print('...and {nmc} multilabeled'.format(nmc=n_multi),
          file=sys.stderr)


if __name__ == '__main__':
    main()
