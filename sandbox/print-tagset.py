#!/usr/bin/env python
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
