#!/usr/bin/env python
"""Plot the stamps k-mer abundance distributions produced by do.sh.

Script form of the reference walkthrough notebook
("examples/stamps k-mer distributions.ipynb"): raw-reads spectrum,
diginorm and 3-pass diginorm comparisons, and the two partition
spectra.  Run examples/stamps/do.sh first; PNGs land next to the
.hist files in out/.
"""

import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(HERE, "out")


def load(name):
    # abundance-dist writes a CSV header line; the reference-era .hist
    # files were bare columns — accept both
    return numpy.loadtxt(os.path.join(OUT, name), delimiter=",",
                         skiprows=1, usecols=(0, 1))


reads = load("stamps-reads.hist")
part1 = load("stamps-part.g0.hist")
part2 = load("stamps-part.g1.hist")
dn = load("stamps-dn.hist")
dn3 = load("stamps-dn3.hist")

plt.figure()
plt.plot(reads[:, 0], reads[:, 1], label="raw reads")
plt.ylim(top=200)
plt.legend()
plt.title("A fake metagenome (1:10)")
plt.ylabel("N(k-mers at that abundance)")
plt.xlabel("k-mer abundance")
plt.savefig(os.path.join(OUT, "stamps-reads.png"))

plt.figure()
plt.plot(reads[:, 0], reads[:, 1], label="raw reads")
plt.plot(dn[:, 0], dn[:, 1], label="diginorm to 10")
plt.ylim(top=200)
plt.xlim(right=400)
plt.legend()
plt.title("Normalizing metagenomic data")
plt.ylabel("N(k-mers at that abundance)")
plt.xlabel("k-mer abundance")
plt.savefig(os.path.join(OUT, "diginorm.png"))

plt.figure()
plt.plot(reads[:, 0], reads[:, 1], label="raw reads")
plt.plot(dn3[:, 0], dn3[:, 1], label="3-pass diginorm")
plt.xlim(right=50)
plt.ylim(top=2000)
plt.legend()
plt.title("Normalizing metagenomic data w/error trimming")
plt.ylabel("N(k-mers at that abundance)")
plt.xlabel("k-mer abundance")
plt.savefig(os.path.join(OUT, "diginorm-dn3.png"))

plt.figure()
plt.plot(part1[:, 0], part1[:, 1], label="partition A")
plt.plot(part2[:, 0], part2[:, 1], label="partition B")
plt.ylim(top=120)
plt.legend()
plt.title("Separating different genomes into partitions")
plt.ylabel("N(k-mers at that abundance)")
plt.xlabel("k-mer abundance")
plt.savefig(os.path.join(OUT, "stamps-partitions.png"))

print("wrote stamps-reads.png diginorm.png diginorm-dn3.png "
      "stamps-partitions.png to", OUT)
