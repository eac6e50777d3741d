#!/bin/bash
# The "stamps" end-to-end walkthrough, ported from the reference
# pipeline (reference examples/stamps/do.sh): load counts, abundance
# histograms, digital normalization (+saved graph), partitioning,
# error correction, and abundance filtering, all on
# data/stamps-reads.fa.gz.  BASELINE.md names this pipeline as the
# benchmark recipe.
#
# Usage:  [KHMER_DATA=/path/to/data] examples/stamps/do.sh
# Writes all outputs into examples/stamps/out/.

set -e # exit as soon as one command fails
set -x # echo commands before executing them

HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$(cd "$HERE/../.." && pwd)"
SCRIPTS="$REPO/scripts"
SANDBOX="$REPO/sandbox"
DATA="${KHMER_DATA:-/root/reference/data}"
PY="${PYTHON:-python}"

OUT="$HERE/out"
rm -rf "$OUT" # re-runnable: several steps refuse to squash existing outputs
mkdir -p "$OUT"
cd "$OUT"

# local copy: several steps write .keep/.corr/.part siblings next to
# their input, and the data directory must stay read-only
cp "$DATA/stamps-reads.fa.gz" .

$PY "$SCRIPTS/load-into-counting.py" -x 1e8 -k 20 stamps-reads.ct \
	stamps-reads.fa.gz
$PY "$SCRIPTS/abundance-dist.py" stamps-reads.ct stamps-reads.fa.gz \
	stamps-reads.hist
$PY "$SCRIPTS/normalize-by-median.py" -k 20 -C 10 -x 1e8 stamps-reads.fa.gz \
	--savegraph stamps-dn.ct
$PY "$SCRIPTS/abundance-dist.py" stamps-dn.ct stamps-reads.fa.gz.keep \
	stamps-dn.hist
$PY "$SCRIPTS/do-partition.py" -k 32 -x 1e8 -s 1e4 -T 8 stamps-part \
	stamps-reads.fa.gz
$PY "$SANDBOX/error-correct-pass2.py" --trusted-cov 10 stamps-dn.ct \
	stamps-reads.fa.gz
$PY "$SCRIPTS/load-into-counting.py" -x 1e8 -k 20 stamps-corr.ct \
	stamps-reads.fa.gz.corr
$PY "$SCRIPTS/abundance-dist.py" stamps-corr.ct stamps-reads.fa.gz.corr \
	stamps-corr.hist
$PY "$SCRIPTS/extract-partitions.py" stamps-part stamps-reads.fa.gz.part
$PY "$SCRIPTS/extract-partitions.py" -X 1 stamps-part stamps-reads.fa.gz.part
$PY "$SCRIPTS/load-into-counting.py" -x 1e8 -k 20 stamps-part.g0.ct \
	stamps-part.group0000.fa
$PY "$SCRIPTS/load-into-counting.py" -x 1e8 -k 20 stamps-part.g1.ct \
	stamps-part.group0001.fa
$PY "$SCRIPTS/abundance-dist.py" stamps-part.g0.ct stamps-part.group0000.fa \
	stamps-part.g0.hist
$PY "$SCRIPTS/abundance-dist.py" stamps-part.g1.ct stamps-part.group0001.fa \
	stamps-part.g1.hist

$PY "$SCRIPTS/filter-abund.py" stamps-dn.ct stamps-reads.fa.gz.keep
$PY "$SCRIPTS/normalize-by-median.py" -x 1e8 -k 20 -C 10 \
	stamps-reads.fa.gz.keep.abundfilt --savegraph stamps-dn3.ct

$PY "$SCRIPTS/abundance-dist.py" stamps-dn3.ct \
	stamps-reads.fa.gz.keep.abundfilt.keep stamps-dn3.hist

echo stamps pipeline complete
