#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Print out a stoptags file as DNA k-mers.

% python sandbox/print-stoptags.py <graphbase>.stoptags

TPU port of the reference sandbox/print-stoptags.py.
"""

import sys

import khmer_tpu as khmer
from khmer_tpu.io.oxli_format import load_hashset, SAVED_STOPTAGS


def main():
    filename = sys.argv[1]
    ksize, hashes, _ = load_hashset(filename, ht_type=SAVED_STOPTAGS)
    print('K:', ksize, file=sys.stderr)
    for h in hashes:
        print(khmer.reverse_hash(int(h), ksize))


if __name__ == '__main__':
    main()
