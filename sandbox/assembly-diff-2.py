#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Extract long unique paths of assembly 2 relative to assembly 1.

% python sandbox/assembly-diff-2.py <assembly1> <assembly2>

Writes '<assembly2>.uniq'.  TPU port of the reference
sandbox/assembly-diff-2.py (extract_unique_paths + incremental
consume).
"""

import os
import sys

from khmer_tpu import Nodegraph
from khmer_tpu.io.fastx import FastxReader

K = 20
HASHTABLE_SIZE = int(4e9)
N_HT = 4

UNIQUE_LEN = 100
UNIQUE_F = 0.9


def main():
    filename1 = sys.argv[1]
    filename2 = sys.argv[2]
    uniq2 = open(os.path.basename(sys.argv[2]) + '.uniq', 'w')

    kh = Nodegraph(K, HASHTABLE_SIZE, N_HT)
    for n, record in enumerate(FastxReader(filename1)):
        if n % 10000 == 0:
            print('...', filename1, n)
        seq = record.sequence.upper().replace('N', 'A')
        kh.consume(seq)

    path_n = 0
    for n, record in enumerate(FastxReader(filename2)):
        if n % 10000 == 0:
            print('...', filename2, n)
        seq = record.sequence.upper().replace('N', 'A')
        paths = kh.extract_unique_paths(seq, UNIQUE_LEN, UNIQUE_F)
        kh.consume(seq)

        for path in paths:
            path_n += 1
            print('>%s from:%s\n%s' % (path_n, record.name, path),
                  file=uniq2)


if __name__ == '__main__':
    main()
