#!/usr/bin/env python
"""khmer-tpu's primary sequence loading function (reference
examples/python-api/consume.py): one bulk `consume_seqfile` call runs
the whole deferred TPU pipeline — parse, 2-bit encode, fused hash,
sort-dedup, one sketch flush."""

import sys

import khmer_tpu as khmer

ksize = 21
target_table_size = 5e8
num_tables = 4

counts = khmer.Counttable(ksize, target_table_size, num_tables)
nseqs, nkmers = counts.consume_seqfile(sys.argv[1])
print('Loaded', nseqs, 'sequences and', nkmers, 'k-mers from', sys.argv[1])

print('The kmer "CAGCGCCGTGTTGTTGCAATT" appears',
      counts.get('CAGCGCCGTGTTGTTGCAATT'), 'times in the data')
print('The kmer "GATTACAGATTACAGATTACA" appears',
      counts.get('GATTACAGATTACAGATTACA'), 'times in the data')
