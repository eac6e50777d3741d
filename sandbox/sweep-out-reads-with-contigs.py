#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Partition reads by the contigs they overlap (tag-density-0 sweep).

% python sandbox/sweep-out-reads-with-contigs.py <reads> <contigs> [out]

Output in '<reads>.sweep'.  TPU port of the reference
sandbox/sweep-out-reads-with-contigs.py.
"""

import os.path
import sys

from khmer_tpu import Nodegraph

K = 20


def main():
    readsfile = sys.argv[1]
    contigfile = sys.argv[2]
    outfile = os.path.basename(readsfile) + '.sweep'
    if len(sys.argv) == 4:
        outfile = sys.argv[3]

    # create a nodegraph data structure
    ht = Nodegraph(K, 1, 1)

    # tag every k-mer in the contigs
    ht._set_tag_density(0)

    # load contigs, connect into N partitions
    print('loading contigs from', contigfile)
    ht.consume_seqfile_and_tag(contigfile)
    subset = ht.do_subset_partition(0, 0)
    ht.merge_subset(subset)

    print('outputting contig-partitioned reads to', outfile)
    ht.output_partitions(readsfile, outfile, True)


if __name__ == '__main__':
    main()
