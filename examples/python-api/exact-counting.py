#!/usr/bin/env python
"""Exact k-mer counting with the invertible 2-bit hash (reference
examples/python-api/exact-counting.py).  Memory is 4^k buckets, which
limits this to small k — but every count is exact and every bucket
index decodes back to its k-mer via reverse_hash."""

import khmer_tpu as khmer

# Note:
#    - The forward and reverse complements are collapsed since k is
#      even here (canonical = min(fwd, revcomp)).
#    - There are 4^k possible sequences of length k.
#    - A non-prime table size is rounded DOWN to a prime, so ask for
#      slightly more than 4^k to avoid any false positives.
ksize = 6
nkmers = 4**ksize
tablesize = nkmers + 10

cg = khmer.Countgraph(ksize, tablesize, 1)
print('Created a countgraph with', cg.hashsizes(), 'buckets')

cg.count('ATGGCA')
cg.count('ATGGCA')
cg.count('ACATGG')
cg.count('AAAAAA')
cg.count('TTTTTT')  # this will be counted towards AAAAAA

# Show all >0 k-mer abundances from the table
for i in range(nkmers):
    if cg.get(i):
        print(cg.reverse_hash(i), cg.get(i))

# Note: reverse_hash is only available for Countgraph and Nodegraph
# (2-bit hash), not Counttable/Nodetable (murmur is irreversible).
