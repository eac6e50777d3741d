#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Calculate assembly statistics (N50 etc.) for FASTA files.

% python sandbox/assemstats3.py <minLen> <fasta files...>

TPU port of the reference sandbox/assemstats3.py.
"""

import sys

from khmer_tpu.io.fastx import FastxReader


def trimLens(lens, minLen):
    index = 0
    for i in range(len(lens)):
        if lens[i] < minLen:
            index += 1
        else:
            break
    return lens[index:len(lens)]


def getLens(filename):
    return sorted(len(r.sequence) for r in FastxReader(filename))


def calcNXX(lens, percent):
    lenSum = sum(lens)
    threshold = (float(percent) / 100) * lenSum
    runningSum = 0
    nxx = 0
    nxxLen = 0
    for i in range(len(lens) - 1, -1, -1):
        runningSum += lens[i]
        nxx += 1
        if runningSum >= threshold:
            nxxLen = lens[i]
            break
    return nxx, nxxLen


def main():
    if len(sys.argv) < 3:
        print("usage: assemstats3.py <minLen> <fasta files>",
              file=sys.stderr)
        sys.exit(1)

    minLen = int(sys.argv[1])
    print('** cutoff:', minLen)
    print("N\tsum\tmax\tfilename")
    for filename in sys.argv[2:]:
        lens = trimLens(getLens(filename), minLen)
        if not lens:
            print("0\t0\t0\t" + filename)
            continue
        n50, n50Len = calcNXX(lens, 50)
        print("%d\t%d\t%d\t%s" % (len(lens), sum(lens), max(lens),
                                  filename))


if __name__ == '__main__':
    main()
