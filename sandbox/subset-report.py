#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Report partition counts and size distributions for pmap files.

% python sandbox/subset-report.py <pmap1> [<pmap2> ...]

TPU port of the reference sandbox/subset-report.py.
"""

import sys

import khmer_tpu as khmer
from khmer_tpu.partitioning import SubsetPartition

K = 32


def main():
    subset_filenames = sys.argv[1:]

    ht = khmer.Nodegraph(K, 1, 1)
    for filename in subset_filenames:
        print('--')
        print('partition map:', filename)
        subset = SubsetPartition.load(filename, ht)
        # count over the subset's own tags
        parts = set(p for p in subset.partition_map.values()
                    if p is not None)
        n_orphan = sum(1 for p in subset.partition_map.values()
                       if p is None)
        print('num partitions:', len(parts))
        print('num orphans:', n_orphan)

        dist, n_unassigned = subset.partition_size_distribution()
        for (size, count) in dist:
            print(size, count)
        print('%d unassigned tags' % n_unassigned)
        print('--')


if __name__ == '__main__':
    main()
