#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Scan a SAM stream against the reference genome and emit per-read
mismatch positions (read-oriented).

% sam-scan.py <genome.fa> <samfile> [-o out.pos]

TPU port of the reference benchMarkTrim/sam-scan.py.
"""

import argparse
import math
import sys

from khmer_tpu.io.fastx import FastxReader


def ignore_at(it):
    for item in it:
        if item.startswith('@'):
            continue
        yield item


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('genome')
    parser.add_argument('samfile')
    parser.add_argument('-o', '--outfile', type=argparse.FileType('w'),
                        default=sys.stdout)

    args = parser.parse_args()

    genome_dict = dict([(record.name, record.sequence) for record in
                        FastxReader(args.genome)])

    n = 0
    n_skipped = 0
    n_rev = n_fwd = 0

    for samline in ignore_at(open(args.samfile)):
        n += 1
        if n % 100000 == 0:
            print('...', n, file=sys.stderr)

        readname, flags, refname, refpos, _, _, _, _, _, seq = \
            samline.rstrip('\n').split('\t')[:10]
        if refname == '*' or refpos == '*':
            # (don't count these as skipped)
            continue

        refpos = int(refpos)
        try:
            ref = genome_dict[refname][refpos - 1:refpos + len(seq) - 1]
        except KeyError:
            print("unknown refname: %s; ignoring (read %s)" %
                  (refname, readname), file=sys.stderr)
            n_skipped += 1
            continue

        errors = []
        for pos, (a, b) in enumerate(zip(ref, seq)):
            if a.upper() != b.upper():
                # SAM flag 16 = read is reverse-complemented
                if int(flags) & 16:
                    pos = len(seq) - pos - 1
                    n_rev += 1
                else:
                    n_fwd += 1
                errors.append(pos)

        print(readname, ",".join(map(str, errors)), file=args.outfile)

    # avoid log errors via pseudocount
    n_fwd += 1
    n_rev += 1

    print('logratio of fwd to rev: %.2f' %
          (math.log(n_fwd / float(n_rev), 2)), file=sys.stderr)
    if n and n_skipped / float(n) > .01:
        raise Exception("Error: too many reads ignored! %d of %d" %
                        (n_skipped, n))


if __name__ == '__main__':
    main()
