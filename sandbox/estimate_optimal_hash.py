#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Estimate optimal choice of hash table parameters.

First scenario: we know the number of k-mers N and the size of memory
available to use M; find the table geometry with the lowest false
positive rate:
% sandbox/estimate_optimal_hash.py -N <number_of_kmers> -M <memory>

Second scenario: we know N and the desired maximum false positive
rate f; find the minimum memory:
% sandbox/estimate_optimal_hash.py -N <number_of_kmers> -f <fpr>

TPU port of the reference sandbox/estimate_optimal_hash.py.
"""

import argparse
import sys
import textwrap

import khmer_tpu as khmer
from khmer_tpu.khmer_args import info, optimal_size, sanitize_help


def get_parser():
    epilog = """
    Use only "-M" with "-N" for the memory-bound scenario, or only
    "-f" with "-N" for the fp-rate-bound scenario.
    """
    parser = argparse.ArgumentParser(
        description='Estimate optimal choice of hash table parameters',
        formatter_class=argparse.RawDescriptionHelpFormatter,
        epilog=textwrap.dedent(epilog))
    parser.add_argument('-N', help='number of estimated distinct k-mers',
                        type=int)
    group = parser.add_mutually_exclusive_group()
    group.add_argument('-M', help='size of memory available to use',
                       type=int)
    group.add_argument('-f', help='desired maximum false positive rate',
                       type=float)
    parser.add_argument('--version', action='version', version='%(prog)s '
                        + khmer.__version__)
    return parser


def main():
    info('estimate_optimal_hash.py', ['counting'])
    args = sanitize_help(get_parser()).parse_args()
    N = args.N
    if args.M:
        result = optimal_size(N, mem_cap=args.M)
        print("number of estimated distinct k-mers:  ", N, file=sys.stderr)
        print("size of memory available to use:      ", args.M,
              file=sys.stderr)
    elif args.f:
        result = optimal_size(N, fp_rate=args.f)
        print("number of estimated distinct k-mers:  ", N, file=sys.stderr)
        print("desired maximum false positive rate:  ", args.f,
              file=sys.stderr)
    else:
        get_parser().error(
            'No action requested, add -M (size of memory available to use) '
            'or -f (desired maximum false positive rate)')
    print("optimal number of hash tables:        ", result.num_htables,
          file=sys.stderr)
    print("optimal size of hash tables:          ", result.htable_size,
          file=sys.stderr)
    print("estimated false positive rate:        ", result.fp_rate,
          file=sys.stderr)
    print("estimated usage of memory:            ", result.mem_use,
          file=sys.stderr)


if __name__ == '__main__':
    main()
