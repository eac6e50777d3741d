#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Partition paths by which of two assemblies they appear in.

% python sandbox/assembly-diff.py <assembly1> <assembly2> <paths>

Writes '<assembly1>.uniq' / '<assembly2>.uniq'.  TPU port of the
reference sandbox/assembly-diff.py; the per-k-mer presence loop is one
batched device query per path.
"""

import os
import sys

import numpy as np

from khmer_tpu import Nodegraph
from khmer_tpu.io.fastx import FastxReader

K = 20
HASHTABLE_SIZE = int(2.5e8)
N_HT = 4

THRESHOLD = 0.9


def frac_present(kh, path):
    counts = np.asarray(kh.get_kmer_counts(path))
    if counts.size == 0:
        return 0.0
    return float(np.count_nonzero(counts)) / counts.size


def main():
    filename1 = sys.argv[1]
    filename2 = sys.argv[2]
    uniq1 = open(os.path.basename(sys.argv[1]) + '.uniq', 'w')
    uniq2 = open(os.path.basename(sys.argv[2]) + '.uniq', 'w')
    paths = sys.argv[3]

    kh1 = Nodegraph(K, HASHTABLE_SIZE, N_HT)
    kh1.consume_seqfile(filename1)
    kh2 = Nodegraph(K, HASHTABLE_SIZE, N_HT)
    kh2.consume_seqfile(filename2)

    for record in FastxReader(paths):
        path = record.sequence
        present1 = frac_present(kh1, path) >= THRESHOLD
        present2 = frac_present(kh2, path) >= THRESHOLD

        if present1 and not present2:
            print('>%s\n%s' % (record.name, record.sequence), file=uniq1)
        elif present2 and not present1:
            print('>%s\n%s' % (record.name, record.sequence), file=uniq2)


if __name__ == '__main__':
    main()
