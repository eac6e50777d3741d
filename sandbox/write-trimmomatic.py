#!/usr/bin/env python
# Derived in part from khmer (https://github.com/dib-lab/khmer/),
# Copyright (C) 2010-2015 Michigan State University,
# Copyright (C) 2015-2016 The Regents of the University of California;
# BSD 3-clause — full license text: LICENSE.third-party at repo root.
"""Emit a shell script that runs Trimmomatic on every R1/R2 pair in
the current directory.

% python sandbox/write-trimmomatic.py > trim.sh

TPU port of the reference sandbox/write-trimmomatic.py.
"""

import glob


def main():
    filelist = glob.glob('*R1*.fastq.gz')

    for r1 in filelist:
        r2 = r1.replace('R1', 'R2')
        final_pe = r1[:-9] + '.pe.fq.gz'
        final_se = r1[:-9] + '.se.fq.gz'
        print("""\
mkdir trim
cd trim
java -jar /usr/local/bin/trimmomatic-0.30.jar PE ../%s ../%s s1_pe s1_se s2_pe s2_se ILLUMINACLIP:/usr/local/share/adapters/TruSeq3-PE.fa:2:30:10
/usr/local/share/khmer/scripts/interleave-reads.py s1_pe s2_pe | gzip -9c > ../%s

cat s1_se s2_se | gzip -9c > ../%s
cd ..
rm -r ./trim/

chmod u-w %s %s
""" % (r1, r2, final_pe, final_se, final_pe, final_se))


if __name__ == '__main__':
    main()
