#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Use a Bloom filter to count unique k-mers.

% python sandbox/bloom-count.py <fasta/fastq>

TPU port of the reference sandbox/bloom-count.py.
"""

import sys

import khmer_tpu as khmer


def main():
    filename = sys.argv[1]
    K = int(sys.argv[2])  # size of kmer
    HT_SIZE = int(sys.argv[3])  # size of hashtable
    N_HT = int(sys.argv[4])  # number of hashtables

    ht = khmer.Nodegraph(K, HT_SIZE, N_HT)
    n_unique = 0
    for n, record in enumerate(khmer.FastxReader(filename)):
        sequence = record.cleaned_seq
        seq_len = len(sequence)
        for n in range(0, seq_len + 1 - K):
            kmer = sequence[n:n + K]
            if not ht.get(kmer):
                n_unique += 1
            ht.count(kmer)
    print(n_unique)
    print(ht.n_occupied())
    print(ht.n_unique_kmers())


if __name__ == '__main__':
    main()
