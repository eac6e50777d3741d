#!/usr/bin/env python
"""Streaming assembly: consume low-coverage reads, label
medium-coverage reads across HDNs, and emit ORFs from labeled-path
contigs once coverage saturates.

% python sandbox/assemble-on-the-go.py <reads.fq> [ ... ]

TPU port of the reference sandbox/assemble-on-the-go.py.
"""

import argparse
import sys

from khmer_tpu import Countgraph, GraphLabels, HashSet
from khmer_tpu.io.fastx import FastxReader

DEFAULT_COV = 20
K = 21
THRESH2 = 30


dna_to_aa = {'TTT': 'F', 'TTC': 'F', 'TTA': 'L', 'TTG': 'L',
             'TCT': 'S', 'TCC': 'S', 'TCA': 'S', 'TCG': 'S',
             'TAT': 'Y', 'TAC': 'Y', 'TAA': '*', 'TAG': '*', 'TGA': '*',
             'TGT': 'C', 'TGC': 'C', 'TGG': 'W',
             'CTT': 'L', 'CTC': 'L', 'CTA': 'L', 'CTG': 'L',
             'CCT': 'P', 'CCC': 'P', 'CCA': 'P', 'CCG': 'P',
             'CAT': 'H', 'CAC': 'H', 'CAA': 'Q', 'CAG': 'Q',
             'CGT': 'R', 'CGC': 'R', 'CGA': 'R', 'CGG': 'R',
             'ATT': 'I', 'ATC': 'I', 'ATA': 'I', 'ATG': 'M',
             'ACT': 'T', 'ACC': 'T', 'ACA': 'T', 'ACG': 'T',
             'AAT': 'N', 'AAC': 'N', 'AAA': 'K', 'AAG': 'K',
             'AGT': 'S', 'AGC': 'S', 'AGA': 'R', 'AGG': 'R',
             'GTT': 'V', 'GTC': 'V', 'GTA': 'V', 'GTG': 'V',
             'GCT': 'A', 'GCC': 'A', 'GCA': 'A', 'GCG': 'A',
             'GAT': 'D', 'GAC': 'D', 'GAA': 'E', 'GAG': 'E',
             'GGT': 'G', 'GGC': 'G', 'GGA': 'G', 'GGG': 'G'}


_COMPLEMENT = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def complement(s):
    """Return complement of 's'."""
    return "".join(_COMPLEMENT[n] for n in s)


def reverse(s):
    """Return reverse of 's'."""
    return "".join(reversed(s))


def peptides(seq, start):
    for i in range(start, len(seq), 3):
        yield dna_to_aa.get(seq[i:i + 3], "X")


def translate(seq):
    for i in range(3):
        yield "".join(peptides(seq, i))

    revcomp = reverse(complement(seq))
    for i in range(3):
        yield "".join(peptides(revcomp, i))


def extract_orfs(pepseq, min_length=99):
    for x in pepseq.split('*'):
        if len(x) >= min_length:
            yield x


def main():
    p = argparse.ArgumentParser()
    p.add_argument('fastq_files', nargs='+')
    args = p.parse_args()

    cg = Countgraph(K, 1e8, 4)

    kept = 0
    hdn = HashSet(K)
    lh = GraphLabels(cg)
    next_label = 1
    next_orf = 1
    output = set()

    for filename in args.fastq_files:
        for n, record in enumerate(FastxReader(filename)):
            if n and n % 10000 == 0:
                print('...', n, file=sys.stderr)

            if len(record.sequence) < K:
                continue

            cov, _, _ = cg.get_median_count(record.sequence)
            if cov < DEFAULT_COV:
                kept += 1
                cg.consume(record.sequence)
            elif cov < THRESH2:
                seq, pos = cg.trim_on_abundance(record.sequence, 3)
                if len(seq) < K:
                    continue

                cg.consume(seq)
                hdn = cg.find_high_degree_nodes(seq)
                lh.label_across_high_degree_nodes(seq, hdn, next_label)
                next_label += 1
            elif cov == THRESH2:
                contigs = lh.assemble_labeled_path(record.sequence[:K])
                for contig in contigs:
                    for t in translate(contig):
                        for o in extract_orfs(t):
                            if hash(o) not in output:
                                output.add(hash(o))
                                print('>orf%d\n%s' % (next_orf, o))
                                next_orf += 1


if __name__ == '__main__':
    main()
