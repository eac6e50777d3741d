"""Pre-seed the persistent XLA compile cache for the CLI scripts'
device shapes (`make warm-cache`).

Every jitted program is compiled once per (shape, dtype, donation)
signature; over a tunneled TPU one compile costs 30-500 s, which is
what made the round-3 pipeline wall-clocks 100x worse than warm runs
(BENCH_PIPELINES.json notes).  The shapes the scripts dispatch are
deterministic: the bulk consume's chunk/bucket ladder, the deferred
combine/flush buckets, and the query-width buckets.  This script runs
a tiny exemplar through each family so the persistent cache
(/tmp/khmer_tpu_jax_cache, khmer_tpu/_config.py) holds them all;
subsequent script runs compile nothing.

Families warmed (and why):
  * consume ladder: fused append at the native chunk size + the small
    tail buckets, deferred combine + flush (Countgraph AND Counttable
    geometries from khmer_args defaults) — load-into-counting,
    normalize-by-median --savegraph, filter-abund-single, load-graph.
  * row queries: _hash_count_rows / median_at_least at the width
    buckets — normalize-by-median, filter-abund, trim-low-abund.
  * abundance_distribution tracking kernels — abundance-dist-single.

Cost: one-time minutes on a tunneled TPU, seconds on CPU.
"""

import os
import sys
import tempfile
import time

import numpy as np


def log(msg):
    print("[warm-cache] %s" % msg, file=sys.stderr)
    sys.stderr.flush()


def main():
    t_all = time.time()
    import jax

    import khmer_tpu

    log("backend: %s" % jax.default_backend())

    rng = np.random.default_rng(7)
    lut = np.frombuffer(b"ACGT", np.uint8)

    # exemplar read files: tiny (one-bucket consume) and one spanning
    # several native chunks so the full-chunk append/cycle shapes and
    # the producer path all compile
    small = os.path.join(tempfile.gettempdir(), "khmer_warm_small.fa")
    if not os.path.exists(small):
        with open(small, "wb") as f:
            for i in range(500):
                f.write(b">r%d\n" % i)
                f.write(lut[rng.integers(0, 4, 100)].tobytes() + b"\n")
    big = os.path.join(tempfile.gettempdir(), "khmer_warm_big.fa")
    if not os.path.exists(big):
        with open(big, "wb") as f:
            for i in range(120_000):
                f.write(b">r%d\n" % i)
                f.write(lut[rng.integers(0, 4, 100)].tobytes() + b"\n")

    # the geometries khmer_args' defaults/examples produce: countgraph
    # (2-bit) and counttable/nodegraph variants at a few -x ladders.
    # bigcount=True is the load-into-counting DEFAULT, and the flush
    # kernels specialize on it — warm both variants (round-4
    # BENCH_PIPELINES: the unwarmed bigcount flush cost 80 s of
    # compiles on the 3 MB stamps input).
    for cls, x, bigcount in ((khmer_tpu.Countgraph, 1e6, False),
                             (khmer_tpu.Countgraph, 1e8, False),
                             (khmer_tpu.Countgraph, 1e8, True),
                             (khmer_tpu.Nodegraph, 1e8, False),
                             (khmer_tpu.Counttable, 1e6, False)):
        t0 = time.time()
        g = cls(20, int(x), 4)
        if bigcount:
            g.set_use_bigcount(True)
        g.consume_seqfile(small)
        g.n_unique_kmers()
        log("%s x=%g bigcount=%s small consume: %.1fs"
            % (cls.__name__, x, bigcount, time.time() - t0))

    t0 = time.time()
    g = khmer_tpu.Countgraph(20, int(1e8), 4)
    g.consume_seqfile(big)
    g.n_unique_kmers()
    log("Countgraph big consume (chunk ladder): %.1fs"
        % (time.time() - t0))

    # mid-size consume with bigcount: a distinct-count scale between
    # `small` and `big` exercises the intermediate flush-window
    # buckets the stamps-class inputs hit
    mid = os.path.join(tempfile.gettempdir(), "khmer_warm_mid.fa")
    if not os.path.exists(mid):
        with open(mid, "wb") as f:
            for i in range(15_000):
                f.write(b">r%d\n" % i)
                f.write(lut[rng.integers(0, 4, 100)].tobytes() + b"\n")
    t0 = time.time()
    g = khmer_tpu.Countgraph(20, int(1e8), 4)
    g.set_use_bigcount(True)
    g.consume_seqfile(mid)
    g.n_unique_kmers()
    log("Countgraph mid consume (bigcount): %.1fs" % (time.time() - t0))

    # HLL (unique-kmers) kernels at the script's default precision
    t0 = time.time()
    try:
        hll = khmer_tpu.HLLCounter(0.01, 21)
        hll.consume_seqfile(small)
        hll.estimate_cardinality()
        log("HLL consume: %.1fs" % (time.time() - t0))
    except Exception as e:  # pragma: no cover - best effort warmer
        log("HLL warm skipped: %s" % e)

    # query-width buckets: per-row hash+count and median paths
    t0 = time.time()
    seqs = ["".join("ACGT"[c] for c in rng.integers(0, 4, n))
            for n in (80, 100, 150, 250, 400, 900)]
    g._hash_count_rows(seqs)
    for s in seqs:
        g.get_median_count(s)
    log("query-width buckets: %.1fs" % (time.time() - t0))

    # abundance-dist tracking kernels
    t0 = time.time()
    trk = khmer_tpu.Nodegraph(20, int(1e6), 4)
    g2 = khmer_tpu.Countgraph(20, int(1e6), 4)
    g2.consume_seqfile(small)
    g2.abundance_distribution(small, trk)
    log("abundance-dist kernels: %.1fs" % (time.time() - t0))

    log("done in %.1fs (cache: %s)"
        % (time.time() - t_all,
           jax.config.jax_compilation_cache_dir))


if __name__ == "__main__":
    main()
