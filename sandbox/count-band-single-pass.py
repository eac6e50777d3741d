#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Single-pass banded counting with a disk-backed spill buffer.

Usage: count-band-single-pass.py -n 4 -k 31 <reads> [ ... ]

Hash values are split into bands by the top of hash space and spilled
to temporary pickles; each band is then re-read and counted into its
own Counttable (one bulk device scatter per spill file rather than a
per-hash loop).  Equivalent of the reference
sandbox/count-band-single-pass.py.
"""

import argparse
import os
import pickle
import sys
from math import floor

import numpy as np

from khmer_tpu import Counttable, ReadParser, calc_expected_collisions


class BandSpiller:
    """Accumulate hash values per band, spilling each band's list to
    its own pickle file whenever the in-memory total hits maxsize."""

    def __init__(self, numbands,
                 outfmt='tmp.band{band}.buffer{buffer}.pickle',
                 maxsize=int(1e8)):
        self.numbands = numbands
        self.outfmt = outfmt
        self.maxsize = maxsize
        self.n_spills = 0
        self._reset()

    def _reset(self):
        self.pending = {band: [] for band in range(self.numbands)}
        self.n_pending = 0

    def __len__(self):
        return self.n_pending

    def spill(self):
        if not self.n_pending:
            return
        self.n_spills += 1
        print('DEBUG flush', self.n_spills, file=sys.stderr)
        for band, values in self.pending.items():
            fname = self.outfmt.format(band=band + 1,
                                       buffer=self.n_spills)
            with open(fname, 'wb') as fp:
                pickle.dump(values, fp)
        self._reset()

    def add(self, hashval):
        band = floor(hashval / (2 ** 64) * self.numbands)
        self.pending[band].append(hashval)
        self.n_pending += 1
        if self.n_pending >= self.maxsize:
            self.spill()

    def band_tables(self, memory, ksize):
        """Yield (band, Counttable) pairs, re-reading each band's
        spill files and scattering them in bulk."""
        self.spill()
        for band in range(self.numbands):
            table = Counttable(ksize, memory / 4, 4)
            for i in range(self.n_spills):
                fname = self.outfmt.format(band=band + 1, buffer=i + 1)
                with open(fname, 'rb') as fp:
                    values = pickle.load(fp)
                if values:
                    table.storage.add_batch(
                        np.asarray(values, np.uint64))
                os.remove(fname)
            yield band, table


def build_cli():
    cli = argparse.ArgumentParser(
        description='single-pass banded k-mer counting')
    cli.add_argument('-k', '--ksize', type=int, metavar='K', default=31,
                     help='k-mer size')
    cli.add_argument('-n', '--num-bands', type=int, metavar='N',
                     help='number of bands')
    cli.add_argument('-b', '--buffersize', type=float, metavar='B',
                     default=1e8,
                     help='k-mers to hold in memory before spilling '
                     'buffers to disk')
    cli.add_argument('-m', '--memory', type=float, metavar='M',
                     default=1e4,
                     help='bytes to allocate to each output counttable')
    cli.add_argument('-o', '--outfmt', metavar='FMT', default='band{}.ct',
                     help='output filename template; {} is replaced '
                     'with the band number (default "band{}.ct")')
    cli.add_argument('infiles', nargs='+')
    return cli


def main():
    opts = build_cli().parse_args()

    hasher = Counttable(opts.ksize, 1, 1)
    spiller = BandSpiller(opts.num_bands, maxsize=int(opts.buffersize))
    for infile in opts.infiles:
        for read in ReadParser(infile):
            for kmer in hasher.get_kmer_hashes(read.sequence):
                spiller.add(int(kmer))

    for band, table in spiller.band_tables(opts.memory, opts.ksize):
        fpr = calc_expected_collisions(table, max_false_pos=100.0)
        ctfilename = opts.outfmt.format(band + 1)
        print('Band', band, 'FPR', fpr, ctfilename, file=sys.stderr)
        table.save(ctfilename)


if __name__ == '__main__':
    main()
