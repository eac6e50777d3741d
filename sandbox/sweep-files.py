#!/usr/bin/env python
"""Find all reads connected to the given contigs on a per-file basis.

% sweep-files.py -r <range> --db <fasta/q files> --query <fasta/q files>

Each database file gets a label; query reads are written to the
'.sweep' output of every database file whose label neighborhood they
touch.  TPU port of the reference sandbox/sweep-files.py.
"""

import os
import sys
from collections import deque

from khmer_tpu import GraphLabels, Nodegraph
from khmer_tpu.io.fastx import FastxReader
from khmer_tpu.khmer_args import (build_nodegraph_args, report_on_config,
                                  sanitize_help)

EPILOG = """
Output will be a collection of fasta/q files, each corresponding to a
database file: the subset of query sequences connected to that
database file's sequences in the de Bruijn graph.  --range sets the
breadth of traversal (default: maximum).
"""

DEFAULT_OUT_PREF = 'reads'
DEFAULT_RANGE = -1

MIN_HSIZE = 4e7
MIN_KSIZE = 21


def get_parser():
    parser = build_nodegraph_args('Takes a partitioned reference file '
                                  'and a list of reads, and sorts reads '
                                  'by which partition they connect to')
    parser.epilog = EPILOG
    parser.add_argument(
        '-r', '--traversal_range', type=int, dest='traversal_range',
        default=DEFAULT_RANGE, help='depth of breadth-first search to '
        'perform from each read')
    parser.add_argument('--max_queue_size', type=int, default=1000)
    parser.add_argument('--prefix', dest='output_prefix',
                        default=DEFAULT_OUT_PREF,
                        help='Prefix for sorted read files')
    parser.add_argument('--outdir', dest='outdir', default='',
                        help='output directory; default is location of '
                             'fastp file')
    parser.add_argument('--query', dest='query', nargs='+',
                        help='Reads to be swept and sorted')
    parser.add_argument('--db', dest='db', nargs='+',
                        help='Database reads for sweep', required=True)

    return parser


def output_single(r):
    if getattr(r, 'quality', None):
        return "@%s\n%s\n+\n%s\n" % (r.name, r.sequence, r.quality)
    return ">%s\n%s\n" % (r.name, r.sequence)


class IODeque(deque):
    """Deque that flushes to a file when a maximum size is exceeded."""

    def __init__(self, limit, outfp):
        deque.__init__(self)
        self.outfp = outfp
        self.limit = limit

    def append(self, x):
        deque.append(self, x)
        if len(self) >= self.limit:
            self.clear()

    def clear(self):
        while len(self):
            self.outfp.write(output_single(self.popleft()))
        deque.clear(self)


def main():
    parser = sanitize_help(get_parser())
    args = parser.parse_args()

    if args.max_tablesize < MIN_HSIZE:
        args.max_tablesize = MIN_HSIZE
    if args.ksize < MIN_KSIZE:
        args.ksize = MIN_KSIZE

    report_on_config(args, graphtype='nodegraph')

    ksize = args.ksize
    ht_size = args.max_tablesize
    n_ht = args.n_tables

    traversal_range = args.traversal_range

    outputs = {}

    # Consume the database files and assign each a unique label in the
    # de Bruijn graph; open a file and output queue for each as well.
    ht = GraphLabels(Nodegraph(ksize, ht_size, n_ht))
    try:
        print('consuming and labeling input sequences...', file=sys.stderr)

        for i, dbfile in enumerate(args.db):

            name = args.output_prefix + os.path.basename(dbfile)
            outfp = open(os.path.join(args.outdir, name) + '.sweep', 'w')
            outq = IODeque(args.max_queue_size, outfp)
            outputs[i] = outq

            for n, record in enumerate(FastxReader(dbfile)):
                if n % 50000 == 0:
                    print('...consumed {n} sequences...'.format(n=n),
                          file=sys.stderr)
                ht.consume_sequence_and_tag_with_labels(record.sequence, i)

    except (IOError, OSError) as e:
        print('!! ERROR: !!', e, file=sys.stderr)
        print('...error setting up outputs. exiting...', file=sys.stderr)

    print('done consuming input sequence. '
          'added {t} tags and {l} labels...'.format(
              t=ht.graph.n_tags(), l=ht.n_labels), file=sys.stderr)

    n_orphaned = 0
    n_labeled = 0
    n_mlabeled = 0

    # Check every read for the labels it intersects; queue it to the
    # corresponding outputs.
    for read_file in args.query:
        print('** sweeping {read_file} for labels...'.format(
            read_file=read_file), file=sys.stderr)
        try:
            read_fp = FastxReader(read_file)
        except IOError as error:
            print('!! ERROR: !!', error, file=sys.stderr)
            print('*** Could not open {fn}, skipping...'.format(
                fn=read_file), file=sys.stderr)
        else:
            for n, record in enumerate(read_fp):
                if n % 50000 == 0 and n > 0:
                    print('\tswept {n} reads [{nc} labeled, {no} orphaned]'
                          .format(n=n, nc=n_labeled, no=n_orphaned),
                          file=sys.stderr)
                seq = record.sequence
                try:
                    labels = ht.sweep_label_neighborhood(seq,
                                                         traversal_range)
                except ValueError:
                    # len(seq) < K: skip
                    pass
                else:
                    if labels:
                        n_labeled += 1
                        if len(labels) > 1:
                            n_mlabeled += 1
                        for label in labels:
                            outputs[label].append(record)
                    else:
                        n_orphaned += 1

            print('** End of file {fn}...'.format(fn=read_file),
                  file=sys.stderr)

    print('** End of run...', file=sys.stderr)
    for q in list(outputs.values()):
        q.clear()

    print('swept {n_reads}...'.format(
        n_reads=n_labeled + n_orphaned), file=sys.stderr)
    print('...with {nc} labeled and {no} orphaned'.format(
        nc=n_labeled, no=n_orphaned), file=sys.stderr)
    print('...and {nmc} multilabeled'.format(nmc=n_mlabeled),
          file=sys.stderr)


if __name__ == '__main__':
    main()
