#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Histogram where stoptag-trimming cuts reads, by position and length.

% python sandbox/stoptags-by-position.py <stoptags> <reads>

TPU port of the reference sandbox/stoptags-by-position.py.
"""

import sys

from khmer_tpu import Nodegraph
from khmer_tpu.io.fastx import FastxReader

K = 32


def main():
    ht = Nodegraph(K, 1, 1)

    x = [0] * 255
    y = [0] * 255

    ht.load_stop_tags(sys.argv[1])
    for n, record in enumerate(FastxReader(sys.argv[2])):
        if n % 10000 == 0:
            sys.stderr.write('... %d\n' % n)

        s, p = ht.trim_on_stoptags(record.sequence)

        if len(s) == len(record.sequence):
            continue

        if p == 0:
            p = 31
        else:
            p += 1

        x[p] += 1
        y[len(record.sequence)] += 1

    for i, (n, m) in enumerate(zip(x, y)):
        if m:
            print('%d,%d,%d' % (i, n, m))


if __name__ == '__main__':
    main()
