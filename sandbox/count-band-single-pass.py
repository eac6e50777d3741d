#!/usr/bin/env python
"""Single-pass banded counting with a disk-backed hash buffer.

% python sandbox/count-band-single-pass.py -n 4 -k 31 <reads> [ ... ]

Hash values are bucketed by band (top of hash space), spilled to
pickles, then each band is counted into its own Counttable.  TPU port
of the reference sandbox/count-band-single-pass.py; the per-band count
fill is one bulk device scatter instead of a per-hash loop.
"""

import argparse
import os
import pickle
import sys
from math import floor

import numpy as np

from khmer_tpu import Counttable, ReadParser, calc_expected_collisions


class BandedHashBuffer(object):
    """Store k-mers in separate bands, using disk to keep memory low.

    When the buffer accumulates `maxsize` hash values, each band list
    is pickled to a temp file and the buffer resets; get_counts then
    re-reads one band at a time into a fresh Counttable.
    """

    def __init__(self, numbands,
                 outfmt='tmp.band{band}.buffer{buffer}.pickle',
                 maxsize=int(1e8)):
        self.numbands = numbands
        self.outfmt = outfmt
        self.maxsize = maxsize
        self._num_flushes = 0
        self._hash_count = 0
        self.hashlists = dict()
        self.reset()

    def __len__(self):
        return self._hash_count

    def reset(self):
        del self.hashlists
        self._hash_count = 0
        self.hashlists = dict()
        for i in range(self.numbands):
            self.hashlists[i] = list()

    def flush(self):
        if len(self) == 0:
            return

        self._num_flushes += 1
        print('DEBUG flush', self._num_flushes, file=sys.stderr)

        for i in range(self.numbands):
            outfilename = self.outfmt.format(band=i + 1,
                                             buffer=self._num_flushes)
            with open(outfilename, 'wb') as outfile:
                pickle.dump(self.hashlists[i], outfile)
        self.reset()

    def add(self, hashval):
        band = floor(hashval / (2 ** 64) * self.numbands)
        self.hashlists[band].append(hashval)
        self._hash_count += 1
        if self._hash_count >= self.maxsize:
            self.flush()

    def get_counts(self, memory, ksize):
        if len(self) > 0:
            self.flush()

        for band in range(self.numbands):
            counts = Counttable(ksize, memory / 4, 4)
            for i in range(self._num_flushes):
                bufferfilename = self.outfmt.format(band=band + 1,
                                                    buffer=i + 1)
                with open(bufferfilename, 'rb') as bufferfile:
                    hashlist = pickle.load(bufferfile)
                    if hashlist:
                        # one device scatter for the whole band buffer
                        counts.storage.add_batch(
                            np.asarray(hashlist, np.uint64))
                os.remove(bufferfilename)
            yield band, counts


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-k', '--ksize', type=int, metavar='K', default=31,
                        help='k-mer size')
    parser.add_argument('-n', '--num-bands', type=int, metavar='N',
                        help='number of bands')
    parser.add_argument('-b', '--buffersize', type=float, metavar='B',
                        default=1e8,
                        help='number of k-mers to keep in memory before '
                        'writing the buffer to disk and flushing')
    parser.add_argument('-m', '--memory', type=float, metavar='M',
                        default=1e4,
                        help='memory (in bytes) to allocate to each '
                        'counttable in the output')
    parser.add_argument('-o', '--outfmt', metavar='FMT', default='band{}.ct',
                        help='a string template for output files; default '
                        'is "band{}.ct"; brackets will be replaced with '
                        'band numbers')
    parser.add_argument('infiles', nargs='+')
    args = parser.parse_args()

    kg = Counttable(args.ksize, 1, 1)
    kbuffer = BandedHashBuffer(args.num_bands, maxsize=int(args.buffersize))
    for infile in args.infiles:
        reads = ReadParser(infile)
        for read in reads:
            for kmer in kg.get_kmer_hashes(read.sequence):
                kbuffer.add(int(kmer))

    for band, counttable in kbuffer.get_counts(args.memory, args.ksize):
        fpr = calc_expected_collisions(counttable, max_false_pos=100.0)
        ctfilename = args.outfmt.format(band + 1)
        print('Band', band, 'FPR', fpr, ctfilename, file=sys.stderr)
        counttable.save(ctfilename)


if __name__ == '__main__':
    main()
