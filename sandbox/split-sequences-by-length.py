#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Split sequences into files by sequence length.

% python sandbox/split-sequences-by-length.py <base> <data1> [<data2> ...]

TPU port of the reference sandbox/split-sequences-by-length.py.
"""

import sys

from khmer_tpu.io.fastx import FastxReader


class OutputByLength(object):

    def __init__(self, base):
        self.base = base
        self.fp_dict = {}

    def save(self, name, sequence):
        length = len(sequence)
        fp_dict = self.fp_dict
        if length not in fp_dict:
            fp_dict[length] = open('%s.%03d' % (self.base, 1000 - length),
                                   'w')
        fp_dict[length].write('>%s\n%s\n' % (name, sequence))


def main():
    base = sys.argv[1]
    filenames = sys.argv[2:]

    out = OutputByLength(base)

    n = 0
    for filename in filenames:
        print('opening', file=sys.stderr)
        for record in FastxReader(filename):
            out.save(record.name, record.sequence)
            n += 1
            if n % 10000 == 0:
                print('...', n, file=sys.stderr)


if __name__ == '__main__':
    main()
