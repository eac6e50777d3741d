#!/usr/bin/env python
"""Find k-mers unique to one sequence using a Bloom-filter mask
(reference examples/python-api/mask.py)."""

import khmer_tpu as khmer

d1 = "ATGTACGGGCATTACGATTACCGATGTAG"
d2 = "ATGACCAAACTCATTACGATTAGATATAG"
ksize = 5
target_table_size = 5e5
num_tables = 4

bf = khmer.Nodetable(ksize, target_table_size, num_tables)
bf.consume(d1)
cms = khmer.Counttable(ksize, target_table_size, num_tables)
for kmer in cms.get_kmers(d2):
    if bf.get(kmer) == 0:
        cms.consume(kmer)

# If kmer is in both sequences it should not be in cms but in bf
assert cms.get('CATTA') == 0
assert bf.get('CATTA') > 0
# If kmer is in d1 but not d2 it should not be in cms but be in bf
assert cms.get('ATGTA') == 0
assert bf.get('ATGTA') > 0
# If kmer is in d2 but not d1 it should be in cms and not in bf
assert cms.get('TATAG') > 0
assert bf.get('TATAG') == 0
print('mask demo OK')
