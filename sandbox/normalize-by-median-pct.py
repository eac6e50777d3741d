#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Digital normalization with a coverage-variance cutoff: keep (and
consume) a read only when its median k-mer abundance is below C AND
its count stddev is under 100% of the mean.

% python sandbox/normalize-by-median-pct.py [ -C <cutoff> ] <data1> ...

Output in 'infile.keepmedpct'.  TPU port of the reference
sandbox/normalize-by-median-pct.py.  Reads are screened in device
batches; a batch verdict is re-resolved with a live query whenever the
read shares k-mers with reads kept earlier in the same batch (the pct
condition is not monotone, so overlap always forces re-resolution).
"""

import argparse
import os
import sys

import numpy as np

from khmer_tpu import Countgraph, calc_expected_collisions
from khmer_tpu.io.fastx import FastxReader
from khmer_tpu.khmer_args import build_counting_args

DEFAULT_DESIRED_COVERAGE = 5
BATCH = 512


def batchwise(t, size):
    it = iter(t)
    return zip(*[it] * size)


def validpair(r0, r1):
    return r0.name[-1] == "1" and \
        r1.name[-1] == "2" and \
        r0.name[0:-1] == r1.name[0:-1]


def _keep_verdict(med, avg, dev, cutoff):
    pct = dev / avg * 100 if avg else 0.
    return med < cutoff and pct < 100


def process_batches(ht, batches, ksize, cutoff, outfp):
    """Decide+consume a list of record tuples, exactly reproducing the
    sequential reference loop.  Returns # of discarded tuples."""
    seqs = []
    spans = []
    lengths_ok = []
    for batch in batches:
        longs = [r.sequence.replace('N', 'A') for r in batch
                 if len(r.sequence) >= ksize]
        lengths_ok.append(len(longs) == len(batch))
        spans.append((len(seqs), len(seqs) + len(longs)))
        seqs.extend(longs)

    stats = ht.get_median_count_batch(seqs) if seqs else []
    hash_rows = ht._hash_rows(seqs) if seqs else []

    seen = set()
    pending = []

    def flush():
        if pending:
            rows = ht._hash_rows(pending)
            ht.storage.add_batch(np.concatenate(rows))
            pending.clear()

    discarded = 0
    for i, batch in enumerate(batches):
        lo, hi = spans[i]
        passed_filter = False
        for j in range(lo, hi):
            med, avg, dev = stats[j]
            if seen and any(int(h) in seen for h in hash_rows[j]):
                # overlap with this batch's consumes: the stale stats
                # are unsafe (pct is not monotone) -> resolve live
                flush()
                med, avg, dev = ht.get_median_count(seqs[j])
            if _keep_verdict(med, avg, dev, cutoff):
                pending.append(seqs[j])
                seen.update(int(h) for h in hash_rows[j])
                passed_filter = True
        if lengths_ok[i] and passed_filter:
            for record in batch:
                if getattr(record, 'quality', None):
                    outfp.write('@%s\n%s\n+\n%s\n' % (record.name,
                                                      record.sequence,
                                                      record.quality))
                else:
                    outfp.write('>%s\n%s\n' %
                                (record.name, record.sequence))
        else:
            discarded += 1
    flush()
    return discarded


def main():
    parser = build_counting_args()
    parser.add_argument('-C', '--cutoff', type=int, dest='cutoff',
                        default=DEFAULT_DESIRED_COVERAGE)
    parser.add_argument('-p', '--paired', action='store_true')
    parser.add_argument('-s', '--savehash', dest='savehash', default='')
    parser.add_argument('-l', '--loadhash', dest='loadhash', default='')
    parser.add_argument('-R', '--report-to-file', dest='report_file',
                        type=argparse.FileType('w'))
    parser.add_argument('input_filenames', nargs='+')

    args = parser.parse_args()

    ksize = args.ksize
    desired_coverage = args.cutoff
    report_fp = args.report_file
    filenames = args.input_filenames

    batch_size = 2 if args.paired else 1

    if args.loadhash:
        print('loading hashtable from', args.loadhash)
        ht = Countgraph.load(args.loadhash)
    else:
        print('making hashtable')
        from khmer_tpu.khmer_args import create_countgraph
        ht = create_countgraph(args)

    total = 0
    discarded = 0

    input_filename = None
    for input_filename in filenames:
        output_name = os.path.basename(input_filename) + '.keepmedpct'
        outfp = open(output_name, 'w')

        n = -1
        pending_batches = []

        def drain():
            nonlocal discarded
            if pending_batches:
                discarded += process_batches(
                    ht, pending_batches, ksize, desired_coverage,
                    outfp) * batch_size
                pending_batches.clear()

        for n, batch in enumerate(batchwise(FastxReader(input_filename),
                                            batch_size)):
            if n > 0 and n % 100000 == 0:
                drain()
                print('... kept', total - discarded, 'of', total, ', or',
                      int(100. - discarded / float(total) * 100.), '%')
                print('... in file', input_filename)

                if report_fp:
                    print(total, total - discarded,
                          1. - (discarded / float(total)), file=report_fp)
                    report_fp.flush()

            total += batch_size

            if args.paired and not validpair(batch[0], batch[1]):
                print('Error: Improperly interleaved pairs %s %s' % (
                    batch[0].name, batch[1].name), file=sys.stderr)
                sys.exit(-1)

            pending_batches.append(batch)
            if len(pending_batches) >= BATCH:
                drain()

        drain()

        if -1 < n:
            print('DONE with', input_filename, '; kept', total - discarded,
                  'of', total, 'or',
                  int(100. - discarded / float(total) * 100.), '%')
            print('output in', output_name)
        else:
            print('SKIPPED empty file', input_filename)

    if args.savehash:
        print('Saving hashfile through', input_filename)
        print('...saving to', args.savehash)
        ht.save(args.savehash)

    fp_rate = calc_expected_collisions(ht, force=True)
    print('fp rate estimated to be %1.3f' % fp_rate)

    if fp_rate > 0.20:
        print("**", file=sys.stderr)
        print("** ERROR: the counting hash is too small for",
              file=sys.stderr)
        print("** this data set.  Increase hashsize/num ht.",
              file=sys.stderr)
        print("**", file=sys.stderr)
        print("** Do not use these results!!", file=sys.stderr)
        sys.exit(-1)


if __name__ == '__main__':
    main()
