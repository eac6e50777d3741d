#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Collect reads until a given average coverage, then exit.

% python sandbox/collect-reads.py <countgraph> <reads1> [<reads2> ...]

TPU port of the reference sandbox/collect-reads.py.
"""

import argparse
import sys
import textwrap

import khmer_tpu as khmer
from khmer_tpu import khmer_args
from khmer_tpu.io.fastx import FastxReader
from khmer_tpu.khmer_args import (build_counting_args, calculate_graphsize,
                                  info, report_on_config, sanitize_help)
from khmer_tpu.kfile import (check_input_files, check_space,
                             check_space_for_graph)


def output_single(read):
    if getattr(read, 'quality', None) is not None:
        return "@%s\n%s\n+\n%s\n" % (read.name, read.sequence, read.quality)
    return ">%s\n%s\n" % (read.name, read.sequence)


def get_parser():
    epilog = """
    Example::

        collect-reads.py -k 20 -x 5e7 out.ct data/100k-filtered.fa
    """
    parser = build_counting_args("Collect reads until a given avg coverage.",
                                 epilog=textwrap.dedent(epilog))
    parser.add_argument('output_countgraph_filename', help="The name of the"
                        " file to write the k-mer countgraph to.")
    parser.add_argument('input_sequence_filename', nargs='+',
                        help="The names of one or more FAST[AQ] input "
                        "sequence files.")
    parser.add_argument('--report-total-kmers', '-t', action='store_true',
                        help="Prints the total number of k-mers to stderr")
    parser.add_argument('-C', '--coverage', type=int, default=50,
                        help='Collect reads until this coverage, then exit.')
    parser.add_argument('-o', '--output', type=argparse.FileType('w'),
                        help='Write collect reads into this file.')
    return parser


def main():
    info('collect-reads.py', ['counting'])
    args = sanitize_help(get_parser()).parse_args()
    report_on_config(args)

    base = args.output_countgraph_filename
    filenames = args.input_sequence_filename

    for name in filenames:
        check_input_files(name, False)

    check_space(filenames, False)
    tablesize = calculate_graphsize(args, 'countgraph')
    check_space_for_graph(base, tablesize, False)

    print('Saving k-mer countgraph to %s' % base, file=sys.stderr)
    print('Loading sequences from %s' % repr(filenames), file=sys.stderr)
    if args.output:
        print('Outputting sequences to', args.output.name, file=sys.stderr)

    htable = khmer_args.create_countgraph(args)

    total_coverage = 0.
    n = 0
    BATCH = 256

    import numpy as np

    def process_batch(records):
        """Sequential-exact batched version of the reference's
        per-read loop: stale medians are exact unless the read
        overlaps k-mers consumed earlier in the batch (counts only
        grow), in which case pending consumes flush and the median is
        re-queried live.  Returns True when coverage target is hit."""
        nonlocal total_coverage, n
        seqs = [r.cleaned_seq for r in records]
        hash_rows = htable._hash_rows(seqs)
        meds = htable.get_median_count_batch(seqs)
        seen = set()
        pending = []

        def flush():
            if pending:
                rows = htable._hash_rows(pending)
                htable.storage.add_batch(np.concatenate(rows))
                pending.clear()

        for record, seq, row, (med, _, _) in zip(records, seqs,
                                                 hash_rows, meds):
            if seen and any(int(h) in seen for h in row):
                flush()
                med, _, _ = htable.get_median_count(seq)

            total_coverage += med
            n += 1

            if total_coverage / float(n) > args.coverage:
                print('reached target average coverage:',
                      total_coverage / float(n), file=sys.stderr)
                flush()
                return True

            pending.append(seq)
            seen.update(int(h) for h in row)
            if args.output:
                args.output.write(output_single(record))

            if n % 100000 == 0:
                print('...', n, total_coverage / float(n),
                      file=sys.stderr)
        flush()
        return False

    done = False
    for index, filename in enumerate(filenames):
        batch = []
        for record in FastxReader(filename):
            seq = record.cleaned_seq
            if len(seq) < args.ksize:
                continue
            batch.append(record)
            if len(batch) >= BATCH:
                done = process_batch(batch)
                batch = []
                if done:
                    break
        if not done and batch:
            done = process_batch(batch)
        if done:
            break

    print('Collected %d reads' % (n,), file=sys.stderr)

    if args.report_total_kmers:
        print('Total number of k-mers: {0}'.format(
            htable.n_occupied()), file=sys.stderr)

    print('saving', base, file=sys.stderr)
    htable.save(base)

    info_fp = open(base + '.info', 'w')
    info_fp.write('through end: %s\n' % filenames[-1])

    # Change max_false_pos=0.2 only if you really grok it. HINT: You don't.
    fp_rate = khmer.calc_expected_collisions(htable, False, max_false_pos=.2)
    print('fp rate estimated to be %1.3f' % fp_rate, file=sys.stderr)
    print('fp rate estimated to be %1.3f' % fp_rate, file=info_fp)

    print('DONE.', file=sys.stderr)


if __name__ == '__main__':
    main()
