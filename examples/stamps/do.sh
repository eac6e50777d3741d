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
#
# KHMER_ONE_PROCESS=1 runs every stage in ONE python process via
# scripts/khmer-run-pipeline.py — one interpreter+JAX startup and
# shared warm jit caches across stages instead of ~2.5 s of startup
# per stage (the pipeline wall-clock mode; stages and their outputs
# are identical).

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

STAGEFILE="$OUT/.stages.txt"
: > "$STAGEFILE"
if [ -n "$KHMER_ONE_PROCESS" ]; then
	# collect stages, run them in one process at the end
	RUN() { printf '%q ' "$@" >> "$STAGEFILE"; printf '\n' >> "$STAGEFILE"; }
else
	RUN() { $PY "$@"; }
fi

RUN "$SCRIPTS/load-into-counting.py" -x 1e8 -k 20 stamps-reads.ct \
	stamps-reads.fa.gz
RUN "$SCRIPTS/abundance-dist.py" stamps-reads.ct stamps-reads.fa.gz \
	stamps-reads.hist
RUN "$SCRIPTS/normalize-by-median.py" -k 20 -C 10 -x 1e8 stamps-reads.fa.gz \
	--savegraph stamps-dn.ct
RUN "$SCRIPTS/abundance-dist.py" stamps-dn.ct stamps-reads.fa.gz.keep \
	stamps-dn.hist
RUN "$SCRIPTS/do-partition.py" -k 32 -x 1e8 -s 1e4 -T 8 stamps-part \
	stamps-reads.fa.gz
RUN "$SANDBOX/error-correct-pass2.py" --trusted-cov 10 stamps-dn.ct \
	stamps-reads.fa.gz
RUN "$SCRIPTS/load-into-counting.py" -x 1e8 -k 20 stamps-corr.ct \
	stamps-reads.fa.gz.corr
RUN "$SCRIPTS/abundance-dist.py" stamps-corr.ct stamps-reads.fa.gz.corr \
	stamps-corr.hist
RUN "$SCRIPTS/extract-partitions.py" stamps-part stamps-reads.fa.gz.part
RUN "$SCRIPTS/extract-partitions.py" -X 1 stamps-part stamps-reads.fa.gz.part
RUN "$SCRIPTS/load-into-counting.py" -x 1e8 -k 20 stamps-part.g0.ct \
	stamps-part.group0000.fa
RUN "$SCRIPTS/load-into-counting.py" -x 1e8 -k 20 stamps-part.g1.ct \
	stamps-part.group0001.fa
RUN "$SCRIPTS/abundance-dist.py" stamps-part.g0.ct stamps-part.group0000.fa \
	stamps-part.g0.hist
RUN "$SCRIPTS/abundance-dist.py" stamps-part.g1.ct stamps-part.group0001.fa \
	stamps-part.g1.hist

RUN "$SCRIPTS/filter-abund.py" stamps-dn.ct stamps-reads.fa.gz.keep
RUN "$SCRIPTS/normalize-by-median.py" -x 1e8 -k 20 -C 10 \
	stamps-reads.fa.gz.keep.abundfilt --savegraph stamps-dn3.ct

RUN "$SCRIPTS/abundance-dist.py" stamps-dn3.ct \
	stamps-reads.fa.gz.keep.abundfilt.keep stamps-dn3.hist

if [ -n "$KHMER_ONE_PROCESS" ]; then
	$PY "$SCRIPTS/khmer-run-pipeline.py" @"$STAGEFILE"
fi

echo stamps pipeline complete
