#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Split a FASTA file into pieces of the given number of records.

% python sandbox/split-fasta.py <filename> <prefix> <size>

TPU port of the reference sandbox/split-fasta.py.
"""

import sys

from khmer_tpu.io.fastx import FastxReader


def main():
    filename = sys.argv[1]
    prefix = sys.argv[2]
    size = int(float(sys.argv[3]))          # e.g. 1e9

    division = -1
    fp = None
    for n, record in enumerate(FastxReader(filename)):
        if n % 100000 == 0:
            print('...', n, file=sys.stderr)
        if n % size == 0:
            division += 1
            new_name = '%s.%04d.fa' % (prefix, division)
            print('opening', new_name, file=sys.stderr)
            fp = open(new_name, 'w')
        fp.write('>%s\n%s\n' % (record.name, record.sequence))


if __name__ == '__main__':
    main()
