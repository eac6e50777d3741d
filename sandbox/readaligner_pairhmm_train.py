#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Train ReadAligner pair-HMM transition probabilities from a SAM
mapping and a countgraph.

% python sandbox/readaligner_pairhmm_train.py [--json] <graph.ct> <aln.sam>

TPU port of the reference sandbox/readaligner_pairhmm_train.py (CIGAR
states x trusted/untrusted, transition frequencies -> log2 table).
Reads SAM text via simplesam when available, else a minimal internal
parser.
"""

import argparse
import collections
import json
import re
from math import log

from khmer_tpu import Countgraph

try:
    from simplesam import Reader
except ImportError:
    Reader = None

CIGAR_TO_STATE = {'M': 'M', 'I': 'Ir', 'D': 'Ig'}

_CIGAR_RE = re.compile(r'(\d+)([MIDNSHP=X])')


class _SamRecord:
    __slots__ = ('seq', 'cigars')

    def __init__(self, seq, cigars):
        self.seq = seq
        self.cigars = cigars


def _iter_sam(fp):
    """Minimal SAM text reader yielding records with .seq and .cigars
    (list of (length, op))."""
    for line in fp:
        if line.startswith('@'):
            continue
        fields = line.rstrip('\n').split('\t')
        if len(fields) < 11 or fields[5] == '*':
            continue
        cigars = [(int(n), op) for n, op in _CIGAR_RE.findall(fields[5])]
        yield _SamRecord(fields[9], cigars)


def extract_cigar(cigar):
    ret = []
    for length, cig in cigar:
        for _ in range(length):
            ret.append(CIGAR_TO_STATE.get(cig, 'M'))
    return ret


def trusted_str(cov, trusted_cutoff):
    return '_u' if cov < trusted_cutoff else '_t'


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--trusted-cutoff', type=int, default=5)
    parser.add_argument(
        "ht", type=str, help="Counting bloom filter for the reads")
    parser.add_argument("sam_file", type=str, help="SAM read mapping file")
    parser.add_argument("--json", action='store_true', help="output JSON")

    args = parser.parse_args()

    ht = Countgraph.load(args.ht)
    fp = open(args.sam_file, 'r')
    samfile = Reader(fp) if Reader is not None else _iter_sam(fp)

    k = ht.ksize()
    seq_cnt = 0
    dropped_seqs = 0
    base_cnt = {}
    state_cnts = {}
    trans_cnts = {}

    total_bases = 0.0

    for rec in samfile:
        seq = rec.seq

        seq_cnt += 1
        if 'N' in seq:
            dropped_seqs += 1
            continue

        states = extract_cigar(rec.cigars)
        if len(states) <= k:
            dropped_seqs += 1
            continue

        kmer = seq[:k]
        state = states[k] + trusted_str(ht.get(kmer), args.trusted_cutoff)

        state_cnts[state] = state_cnts.get(state, 0) + 1
        base_cnt[kmer[-1]] = base_cnt.get(kmer[-1], 0) + 1

        for i in range(1, len(seq) - k - 1):
            total_bases += 1
            kmer = seq[i:i + k]
            cov = ht.get(kmer)

            last_state = state
            state = states[i] + trusted_str(cov, args.trusted_cutoff)

            trans = last_state + '-' + state
            trans_cnts[trans] = trans_cnts.get(trans, 0) + 1

            state_cnts[state] = state_cnts.get(state, 0) + 1
            base_cnt[kmer[-1]] = base_cnt.get(kmer[-1], 0) + 1

    if not args.json:
        print("kmer size=", k)
        print("seq count=", seq_cnt, "dropped seqs=", dropped_seqs)
        print("base counts=", base_cnt)
        print("state counts=", state_cnts)
        print("trans counts=", trans_cnts)

        trans_probs = collections.defaultdict(float)

        for trans in sorted(trans_cnts.keys()):
            start_state = trans.split('-')[0]
            trans_probs[trans] = trans_cnts[
                trans] / float(state_cnts[start_state])
            print('{0}\t{1:0.7f}'.format(trans, trans_probs[trans]))

        print('static double trans_default[] = { log2({0:0.7f}), '
              'log2({1:0.7f}), log2({2:0.7f}), log2({3:0.7f}), '
              'log2({4:0.7f}), log2({5:0.7f}),'.format(
                  trans_probs['M_t-M_t'], trans_probs['M_t-Ir_t'],
                  trans_probs['M_t-Ig_t'], trans_probs['M_t-M_u'],
                  trans_probs['M_t-Ir_u'], trans_probs['M_t-Ig_u']))
        print('log2({0:0.7f}), log2({1:0.7f}), log2({2:0.7f}), '
              'log2({3:0.7f}),'.format(
                  trans_probs['Ir_t-M_t'], trans_probs['Ir_t-Ir_t'],
                  trans_probs['Ir_t-M_u'], trans_probs['Ir_t-Ir_u']))
        print('log2({0:0.7f}), log2({1:0.7f}), log2({2:0.7f}), '
              'log2({3:0.7f}),'.format(
                  trans_probs['Ig_t-M_t'], trans_probs['Ig_t-Ig_t'],
                  trans_probs['Ig_t-M_u'], trans_probs['Ig_t-Ig_u']))
        print('log2({0:0.7f}), log2({1:0.7f}), log2({2:0.7f}), '
              'log2({3:0.7f}), log2({4:0.7f}), log2({5:0.7f}),'.format(
                  trans_probs['M_u-M_t'], trans_probs['M_u-Ir_t'],
                  trans_probs['M_u-Ig_t'], trans_probs['M_u-M_u'],
                  trans_probs['M_u-Ir_u'], trans_probs['M_u-Ig_u']))
        print('log2({0:0.7f}), log2({1:0.7f}), log2({2:0.7f}), '
              'log2({3:0.7f}),'.format(
                  trans_probs['Ir_u-M_t'], trans_probs['Ir_u-Ir_t'],
                  trans_probs['Ir_u-M_u'], trans_probs['Ir_u-Ir_u']))
        print('log2({0:0.7f}), log2({1:0.7f}), log2({2:0.7f}), '
              'log2({3:0.7f}),'.format(
                  trans_probs['Ig_u-M_t'], trans_probs['Ig_u-Ig_t'],
                  trans_probs['Ig_u-M_u'], trans_probs['Ig_u-Ig_u']))
        print('};')
    else:
        def lp(trans, state):
            return log(trans_cnts[trans] / float(state_cnts[state]), 2)

        params = {
            'scoring_matrix': [-0.06642736173897607,
                               -4.643856189774724,
                               -7.965784284662087,
                               -9.965784284662087],
            'transition_probabilities': (
                (lp('M_t-M_t', 'M_t'), lp('M_t-Ir_t', 'M_t'),
                 lp('M_t-Ig_t', 'M_t'), lp('M_t-M_u', 'M_t'),
                 lp('M_t-Ir_u', 'M_t'), lp('M_t-Ig_u', 'M_t')),
                (lp('Ir_t-M_t', 'Ir_t'), lp('Ir_t-Ir_t', 'Ir_t'),
                 lp('Ir_t-M_u', 'Ir_t'), lp('Ir_t-Ir_u', 'Ir_t')),
                (lp('Ig_t-M_t', 'Ig_t'), lp('Ig_t-Ig_t', 'Ig_t'),
                 lp('Ig_t-M_u', 'Ig_t'), lp('Ig_t-Ig_u', 'Ig_t')),
                (lp('M_u-M_t', 'M_u'), lp('M_u-Ir_t', 'M_u'),
                 lp('M_u-Ig_t', 'M_u'), lp('M_u-M_u', 'M_u'),
                 lp('M_u-Ir_u', 'M_u'), lp('M_u-Ig_u', 'M_u')),
                (lp('Ir_u-M_t', 'Ir_u'), lp('Ir_u-Ir_t', 'Ir_u'),
                 lp('Ir_u-M_u', 'Ir_u'), lp('Ir_u-Ir_u', 'Ir_u')),
                (lp('Ig_u-M_t', 'Ig_u'), lp('Ig_u-Ig_t', 'Ig_u'),
                 lp('Ig_u-M_u', 'Ig_u'), lp('Ig_u-Ig_u', 'Ig_u')),
            ),
        }
        print(json.dumps(params, sort_keys=True, indent=4,
                         separators=(',', ': ')))


if __name__ == "__main__":
    main()
