#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Print out a tagset as DNA k-mers.

% python sandbox/print-tagset.py <graphbase>.tagset

TPU port of the reference sandbox/print-tagset.py.
"""

import sys

import khmer_tpu as khmer
from khmer_tpu.io.oxli_format import load_hashset, SAVED_TAGS


def main():
    filename = sys.argv[1]
    ksize, hashes, density = load_hashset(filename, ht_type=SAVED_TAGS)
    print('K:', ksize, file=sys.stderr)
    print('tag density:', density, file=sys.stderr)
    for h in hashes:
        print(khmer.reverse_hash(int(h), ksize))


if __name__ == '__main__':
    main()
