#!/usr/bin/env python
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
