#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Extract the reads of a single partition from a .part file.

% python sandbox/extract-single-partition.py <file.part> <partition-id>

TPU port of the reference sandbox/extract-single-partition.py.
"""

import sys

from khmer_tpu.io.fastx import FastxReader


def main():
    select_pid = int(sys.argv[2])
    count = 0
    pid = 0
    for n, record in enumerate(FastxReader(sys.argv[1])):
        name, partition_id = record.name.rsplit('\t', 1)
        pid = int(partition_id)
        if pid == select_pid:
            print('>%s\t%d\n%s' % (name, pid, record.sequence))
            count += 1
        if n % 10000 == 0:
            sys.stderr.write('...%d\n' % (n,))
    sys.stderr.write('found %d total in partition %d\n' %
                     (count, select_pid))


if __name__ == '__main__':
    main()
