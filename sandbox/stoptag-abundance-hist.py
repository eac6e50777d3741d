#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Histogram the counts of a file of k-mers against a countgraph.

% python sandbox/stoptag-abundance-hist.py <graph.ct> <kmerfile> <figname>

Writes '<kmerfile>.counts' (k-mers with count > 1000) and
'<figname>.countshist' (count histogram + cumulatives).  TPU port of
the reference sandbox/stoptag-abundance-hist.py; the matplotlib figure
is only produced when matplotlib is importable.
"""

import os
import sys

from khmer_tpu import Countgraph

try:
    import matplotlib
    matplotlib.use('Agg')
    from pylab import hist, savefig
except ImportError:
    hist = None


def main():
    hashfile = sys.argv[1]
    filename = sys.argv[2]
    figure = sys.argv[3]

    ht = Countgraph.load(hashfile)

    outabund = open(os.path.basename(filename) + '.counts', 'w')

    counts = []
    d = {}
    for sequence in open(filename):
        sequence = sequence.strip()

        count = ht.get(sequence)
        counts.append(count)
        d[count] = d.get(count, 0) + 1

        if count > 1000:
            print(sequence, count, file=outabund)

    outfp = open(figure + '.countshist', 'w')
    sofar = 0
    sofar_cumu = 0
    for k in sorted(d.keys()):
        sofar += d[k]
        sofar_cumu += k * d[k]
        print(k, d[k], sofar, sofar_cumu, file=outfp)

    if hist is not None:
        hist(counts, density=True, cumulative=True, bins=100,
             range=(1, 1000))
        savefig(figure)


if __name__ == '__main__':
    main()
