#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Count the digital-normalization saturation curve: consume EVERY
read, but count how many would have been kept at coverage C.

% python sandbox/saturate-by-median.py -k 17 <data1> [ <data2> ... ]

TPU port of the reference sandbox/saturate-by-median.py.  Reads are
processed in device batches with the same exactness argument as
scripts/normalize-by-median.py: counts only grow, so a pre-batch
median >= C verdict is final; below-C candidates that overlap k-mers
consumed earlier in the batch trigger a flush + live re-query.  Unlike
diginorm every read is consumed regardless of its verdict.
"""

import argparse
import sys
import textwrap

import numpy as np

from khmer_tpu import Countgraph, calc_expected_collisions
from khmer_tpu.io.fastx import FastxReader
from khmer_tpu.kfile import (check_space, check_space_for_graph,
                             check_valid_file_exists)
from khmer_tpu.khmer_args import (add_loadgraph_args, build_counting_args,
                                  calculate_graphsize, create_countgraph,
                                  info, report_on_config, sanitize_help)

DEFAULT_DESIRED_COVERAGE = 1
BATCH = 512


def batchwise(coll, size):
    iter_coll = iter(coll)
    return zip(*[iter_coll] * size)


def validpair(read0, read1):
    return read0.name[-1] == "1" and \
        read1.name[-1] == "2" and \
        read0.name[0:-1] == read1.name[0:-1]


class _BatchedSaturator:
    """Exact batched version of the reference's sequential loop."""

    def __init__(self, graph, cutoff):
        self.graph = graph
        self.cutoff = cutoff

    def _flush(self, pending_seqs):
        if pending_seqs:
            rows = self.graph._hash_rows(pending_seqs)
            self.graph.storage.add_batch(np.concatenate(rows))
            pending_seqs.clear()

    def drain(self, batches, ksize):
        """batches: list of read tuples.  Returns (n_passed, n_short)
        tuple counts: a tuple passes when any long-enough read's median
        was < cutoff at its sequential decision point; n_short counts
        tuples with any too-short read."""
        graph = self.graph
        C = self.cutoff
        seqs = []
        spans = []
        shorts = []
        for batch in batches:
            longs = [r.sequence.replace('N', 'A') for r in batch
                     if len(r.sequence) >= ksize]
            shorts.append(len(longs) != len(batch))
            spans.append((len(seqs), len(seqs) + len(longs)))
            seqs.extend(longs)

        n_passed = 0
        if seqs:
            hash_rows = graph._hash_rows(seqs)
            at_cov = np.array(graph.median_at_least_batch(seqs, C))
        seen = set()
        pending = []
        for i, batch in enumerate(batches):
            lo, hi = spans[i]
            passed = False
            for j in range(lo, hi):
                below = not at_cov[j]
                if below and seen and \
                        any(int(h) in seen for h in hash_rows[j]):
                    self._flush(pending)
                    below = not graph.median_at_least(seqs[j], C)
                if below:
                    passed = True
                # consume the read either way (reference behavior)
                pending.append(seqs[j])
                seen.update(int(h) for h in hash_rows[j])
            if passed and not shorts[i]:
                n_passed += 1
        self._flush(pending)
        return n_passed, sum(shorts)


def normalize_by_median(input_filename, htable, args, report_fp=None,
                        report_frequency=100000):
    desired_coverage = args.cutoff
    ksize = htable.ksize()

    batch_size = 2 if args.paired else 1

    total = 0
    discarded = 0
    sat = _BatchedSaturator(htable, desired_coverage)
    pending_batches = []

    def _drain():
        nonlocal total, discarded
        if not pending_batches:
            return
        n_passed, _ = sat.drain(pending_batches, ksize)
        discarded += (len(pending_batches) - n_passed) * batch_size
        pending_batches.clear()

    for index, batch in enumerate(batchwise(
            FastxReader(input_filename), batch_size)):
        if index > 0 and index % report_frequency == 0:
            _drain()
            print('... kept {kept} of {total} or {perc:2}%'.format(
                kept=total - discarded, total=total,
                perc=int(100. - discarded / float(total) * 100.)))
            print('... in file', input_filename)
            if report_fp:
                print(total, total - discarded,
                      1. - (discarded / float(total)), file=report_fp)
                report_fp.flush()

        total += batch_size

        if args.paired and not validpair(batch[0], batch[1]):
            raise IOError('Error: Improperly interleaved pairs '
                          '{b0} {b1}'.format(b0=batch[0].name,
                                             b1=batch[1].name))

        pending_batches.append(batch)
        if len(pending_batches) >= BATCH:
            _drain()

    _drain()
    return total, discarded


def handle_error(error, input_name):
    print('** ERROR:', error, file=sys.stderr)
    print('** Failed on {name}: '.format(name=input_name), file=sys.stderr)


def get_parser():
    epilog = """\
    Count the saturation curve of a (low-coverage) data set: every read
    is consumed, and a read is 'kept' when its median k-mer abundance
    was below the cutoff when it arrived.
    """
    parser = build_counting_args(
        descr="Count normalization saturation (consume all reads)",
        epilog=textwrap.dedent(epilog))
    parser.add_argument('-C', '--cutoff', type=int,
                        default=DEFAULT_DESIRED_COVERAGE)
    parser.add_argument('-p', '--paired', action='store_true')
    parser.add_argument('-s', '--savegraph', metavar="filename", default='')
    parser.add_argument('-R', '--report',
                        metavar='filename', type=argparse.FileType('w'))
    parser.add_argument('--report-frequency',
                        metavar='report_frequency', default=100000, type=int)
    parser.add_argument('-f', '--fault-tolerant', dest='force',
                        help='continue on next file if read errors are '
                             'encountered', action='store_true')
    parser.add_argument('-o', '--out', metavar="filename",
                        dest='single_output_filename',
                        default='', help='only output a single'
                        ' file with the specified filename')
    parser.add_argument('input_filenames', metavar='input_sequence_filename',
                        help='Input FAST[AQ] sequence filename.', nargs='+')
    add_loadgraph_args(parser)
    return parser


def main():
    info('saturate-by-median.py', ['diginorm'])
    parser = sanitize_help(get_parser())
    args = parser.parse_args()

    report_on_config(args)

    report_fp = args.report
    report_frequency = args.report_frequency

    check_valid_file_exists(args.input_filenames)
    check_space(args.input_filenames, False)
    if args.savegraph:
        check_space_for_graph(args.savegraph,
                              calculate_graphsize(args, 'countgraph'), False)

    corrupt_files = []

    if args.loadgraph:
        print('loading k-mer countgraph from', args.loadgraph)
        htable = Countgraph.load(args.loadgraph)
    else:
        print('making countgraph')
        htable = create_countgraph(args)

    total = 0
    discarded = 0

    input_filename = None
    for index, input_filename in enumerate(args.input_filenames):
        total_acc = 0
        discarded_acc = 0

        try:
            total_acc, discarded_acc = normalize_by_median(input_filename,
                                                           htable, args,
                                                           report_fp,
                                                           report_frequency)
        except IOError as err:
            handle_error(err, input_filename)
            if not args.force:
                print("NOTE: This can be overridden using the --force"
                      " argument", file=sys.stderr)
                print('** Exiting!', file=sys.stderr)
                sys.exit(1)
            else:
                print('*** Skipping error file, moving on...',
                      file=sys.stderr)
                corrupt_files.append(input_filename)
        else:
            if total_acc == 0 and discarded_acc == 0:
                print('SKIPPED empty file', input_filename)
            else:
                total += total_acc
                discarded += discarded_acc
                print('DONE with {inp}; kept {kept} of {total} or {perc:2}%'
                      .format(inp=input_filename, kept=total - discarded,
                              total=total,
                              perc=int(100. - discarded /
                                       float(total) * 100.)))

    if args.savegraph:
        print('Saving k-mer countgraph through', input_filename)
        print('...saving to', args.savegraph)
        htable.save(args.savegraph)

    fp_rate = calc_expected_collisions(htable, args.force, max_false_pos=.8)
    print('fp rate estimated to be {fpr:1.3f}'.format(fpr=fp_rate))

    if args.force and len(corrupt_files) > 0:
        print("** WARNING: Finished with errors!", file=sys.stderr)
        print("** I/O Errors occurred in the following files:",
              file=sys.stderr)
        print("\t", " ".join(corrupt_files), file=sys.stderr)


if __name__ == '__main__':
    main()
