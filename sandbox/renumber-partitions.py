#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Renumber partitions in .part files into small sequential ids.

% python sandbox/renumber-partitions.py <file1.part> [<file2.part> ...]

TPU port of the reference sandbox/renumber-partitions.py.
"""

import gzip
import os.path
import sys

from khmer_tpu.io.fastx import FastxReader


def main():
    next_partition = 2
    filenum = 0
    for filename in sys.argv[1:]:
        filenum += 1
        outfp = gzip.open('group%03d.fa.gz' % filenum, 'wt')
        old_to_new = {}
        for n, record in enumerate(FastxReader(filename)):
            if n > 0 and n % 10000 == 0:
                print('...', os.path.basename(filename), n,
                      file=sys.stderr)
            partition = record.name.split()[-1].rsplit('\t')[-1]
            name = record.name.split()[0]
            new_part = old_to_new.get(partition)
            if new_part is None:
                new_part = next_partition
                next_partition += 1
                old_to_new[partition] = new_part
            outfp.write('>%s\t%d\n%s\n' % (name, new_part,
                                           record.sequence))
        outfp.close()
        print('renumbered %d partitions in %s' %
              (len(old_to_new), filename), file=sys.stderr)


if __name__ == '__main__':
    main()
