#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Deal sequences round-robin (reverse rotary order) into 100 files.

% python sandbox/shuffle-reverse-rotary.py <file1> [ <file2> ... ]

TPU port of the reference sandbox/shuffle-reverse-rotary.py.
"""

import argparse
import os.path

from khmer_tpu.io.fastx import FastxReader

ROTARY_SIZE = 100


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('filenames', nargs='+')
    args = parser.parse_args()

    prefix = os.path.basename(args.filenames[0])

    fp_d = {}
    for n in range(0, ROTARY_SIZE):
        num = ROTARY_SIZE - n
        fp_d[n] = open(prefix + '.%03d' % num, 'w')

    total = 0
    for filename in args.filenames:
        for record in FastxReader(filename):
            total += 1
            if total % 10000 == 0:
                print('...', total)
            loc = total % ROTARY_SIZE
            fp_d[loc].write('>%s\n%s\n' % (record.name, record.sequence))

    print('reverse-rotary shuffled %d sequences into %d files (%s.NNN)' %
          (total, ROTARY_SIZE, prefix))


if __name__ == '__main__':
    main()
