#!/usr/bin/env python
"""Populate a count-min sketch with a mask (reference
examples/python-api/cms_w_mask.py): count every k-mer of dataset2
except those shared with dataset1.  For whole FILES the same thing is
one bulk call: `cms.consume_seqfile_with_mask(path, bloomfilter)`."""

import khmer_tpu as khmer

ksize = 6
target_table_size = 5e8
num_tables = 4

dataset1 = 'GCTGCACCGATGTACGCAAAGCTATTTAAAACCATAACTATTCTCACTTA'
dataset2 = 'CCTGCACCGACGTACGCTATGCTATTGAAGACCATTAGTAGGCTCACTCC'

# create a bloom filter and store every k-mer of dataset1
bloomfilter = khmer.Nodetable(ksize, target_table_size, num_tables)
bloomfilter.consume(dataset1)

cms = khmer.Counttable(ksize, target_table_size, num_tables)

# for every kmer in dataset2
for kmer in cms.get_kmers(dataset2):
    if bloomfilter.get(kmer) == 0:  # kmers unique to dataset2
        cms.consume(kmer)

# this kmer is in dataset2 (cms), but not dataset1
assert cms.get('CCTGCA') > 0

# this kmer is in dataset1 (bloomfilter), but not dataset2
assert bloomfilter.get('GCTGCA') > 0

# this kmer is in both datasets, should not be in cms
assert cms.get('GTACGC') == 0
print('cms_w_mask demo OK')
