#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Strip partition annotations from read names.

% python sandbox/strip-partition.py <file.part>

TPU port of the reference sandbox/strip-partition.py.
"""

import sys

from khmer_tpu.io.fastx import FastxReader


def main():
    for record in FastxReader(sys.argv[1]):
        name = record.name.split()[0]
        print('>%s\n%s' % (name, record.sequence))


if __name__ == '__main__':
    main()
