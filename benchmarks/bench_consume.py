"""End-to-end consume throughput bench (the VERDICT's consume_mbps).

Generates a coverage-C read set from a random genome (realistic
duplication for the deferred counting path), then times
Countgraph.consume_seqfile — parse + hash + count, everything included.
"""
import os
import sys
import tempfile
import time

import numpy as np


def make_reads(path, genome_mb=3.2, coverage=20, readlen=100, seed=42):
    rng = np.random.default_rng(seed)
    G = int(genome_mb * 1e6)
    genome = rng.integers(0, 4, G, dtype=np.uint8)
    lut = np.frombuffer(b"ACGT", np.uint8)
    n_reads = G * coverage // readlen
    with open(path, "wb") as f:
        starts = rng.integers(0, G - readlen, n_reads)
        for i in range(n_reads):
            s = starts[i]
            seq = lut[genome[s: s + readlen]].tobytes()
            f.write(b">r%d\n" % i)
            f.write(seq)
            f.write(b"\n")
    return os.path.getsize(path)


def main(genome_mb=3.2, coverage=20):
    import khmer_tpu
    import jax

    path = os.path.join(tempfile.gettempdir(),
                        f"bench_reads_{genome_mb}_{coverage}.fa")
    if not os.path.exists(path):
        print("generating reads...", flush=True)
        make_reads(path, genome_mb, coverage)
    size = os.path.getsize(path)
    bases = sum(len(l) for l in open(path, "rb") if not l.startswith(b">")) \
        if size < 2e8 else int(size * 0.96)

    print(f"backend={jax.default_backend()} file={size/1e6:.1f} MB",
          flush=True)
    for trial in range(2):
        cg = khmer_tpu.Countgraph(20, 100_000_000, 4)
        t0 = time.perf_counter()
        n_reads, n_consumed = cg.consume_seqfile(path)
        n_unique = cg.n_unique_kmers()  # forces full flush
        dt = time.perf_counter() - t0
        print(f"trial {trial}: {dt:.2f}s  {size/dt/1e6:.1f} MB/s "
              f"({bases/dt/1e6:.1f} Mbases/s)  reads={n_reads} "
              f"consumed={n_consumed} unique={n_unique}", flush=True)
    return size / dt


if __name__ == "__main__":
    gm = float(sys.argv[1]) if len(sys.argv) > 1 else 3.2
    cv = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    main(gm, cv)
