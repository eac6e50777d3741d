#!/usr/bin/env python
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
