#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Rename sequences (>= 200bp) with a common prefix.

% python sandbox/multi-rename.py <prefix> <file1> [<file2> ...]

TPU port of the reference sandbox/multi-rename.py.
"""

import sys
import textwrap

from khmer_tpu.io.fastx import FastxReader

CUTOFF = 200


def main():
    n = 0
    prefix = sys.argv[1]
    for filename in sys.argv[2:]:
        for record in FastxReader(filename):
            if len(record.sequence) >= CUTOFF:
                n += 1
                print('>%s.%s %s' % (prefix, n, record.name))
                print("\n".join(textwrap.wrap(record.sequence, 80)))


if __name__ == '__main__':
    main()
