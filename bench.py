"""khmer-tpu headline benchmark: end-to-end bulk consume throughput.

Measures the full `load-into-counting` hot path on one chip — native
parse + clean + 2-bit encode, bit-packed host->device transfer, fused
hash, deferred sort-dedup counting, ONE sketch flush per distinct
k-mer, n_unique — via the same `Countgraph.consume_seqfile` call the
CLI scripts use (reference hot loop: src/oxli/hashtable.cc:133-158),
and prints ONE JSON line:

  {"metric": "consume_mbps", "value": <best MB/s of FASTA bytes>,
   "unit": "MB/s", "vs_baseline": <value / 12.0>,
   "trials_mbps": [...], "stdev_mbps": ...,
   "kmer_hash_gbps": <best GB/s of the bare hash kernel>,
   "hash_trials_gbps": [...], "backend": "...", ...}

MEASUREMENT PROTOCOL (the one protocol all docs quote — round-4
VERDICT #8): trial 1 warms the persistent XLA compile cache and is
reported separately as cold_mbps; warm trials repeat until the last
two agree within 10% (cap 6); the headline is the CONVERGED value
and stdev_mbps covers warm trials only.  The hash kernel number is
the same
kmer_hashes_2bit_pm_u32 [4096, 16403] dispatch used by
benchmarks/bench_kernels.py — PARITY.md and BENCH_KERNELS.json must
quote THIS number, not a differently-shaped variant.

vs_baseline anchors to 12.0 MB/s — round 1's end-to-end number for
this exact config; the reference publishes no throughput numbers
(BASELINE.md).

ROBUSTNESS: TPU backend init through the tunnel can fail or hang
(BENCH_r02 was lost to this).  Init runs in a subprocess probe with
bounded retries + backoff; on persistent failure this script still
prints a STRUCTURED failure JSON (rc 0) carrying the last known-good
TPU record from BENCH_LKG.json marked "stale": true.

Input: a synthetic 20x-coverage read set over a 3.2 Mbase random
genome (realistic k-mer duplication for the deferred counting path),
k=20, 4x100M-bin countgraph — the BASELINE.md load-into-counting
config.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
LKG = os.path.join(HERE, "BENCH_LKG.json")
TRIALS = 3


def _make_reads(path, genome_mb=3.2, coverage=20, readlen=100, seed=42):
    rng = np.random.default_rng(seed)
    G = int(genome_mb * 1e6)
    genome = rng.integers(0, 4, G, dtype=np.uint8)
    lut = np.frombuffer(b"ACGT", np.uint8)
    n_reads = G * coverage // readlen
    starts = rng.integers(0, G - readlen, n_reads)
    with open(path, "wb") as f:
        for i in range(n_reads):
            s = starts[i]
            f.write(b">r%d\n" % i)
            f.write(lut[genome[s: s + readlen]].tobytes())
            f.write(b"\n")


def _probe_backend(timeout_s):
    """Check that the accelerator backend initializes, in a SUBPROCESS
    (a hung tunnel would otherwise wedge this script forever)."""
    code = "import jax; jax.devices(); print(jax.default_backend())"
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None, "backend init timed out after %ds" % timeout_s
    if r.returncode != 0:
        return None, (r.stderr or r.stdout).strip()[-400:]
    return r.stdout.strip().splitlines()[-1], None


def _init_with_retries():
    """Bounded retry/backoff on backend init; returns (backend, error)."""
    delays = (0, 30, 120)
    err = None
    for d in delays:
        if d:
            time.sleep(d)
        backend, err = _probe_backend(timeout_s=420)
        if backend:
            return backend, None
    return None, err


def _hash_kernel_gbps():
    import jax
    import jax.numpy as jnp

    from khmer_tpu.ops.hashing import kmer_hashes_2bit_pm_u32

    K = 20
    if jax.default_backend() == "cpu":
        R, L, iters = 256, 4115, 3
    else:
        R, L, iters = 4096, 16403, 10
    rng = np.random.default_rng(42)
    codes = jnp.asarray(rng.integers(0, 4, (R, L), dtype=np.uint8))
    lengths = jnp.full((R,), L, jnp.int32)
    fn = jax.jit(lambda c: kmer_hashes_2bit_pm_u32(c, lengths, K)[:2])
    trials = []
    for _ in range(TRIALS):
        hi, lo = fn(codes)
        np.asarray(hi.ravel()[0:1]), np.asarray(lo.ravel()[0:1])
        t0 = time.perf_counter()
        for _ in range(iters):
            hi, lo = fn(codes)
        np.asarray(hi.ravel()[0:1]), np.asarray(lo.ravel()[0:1])
        trials.append(R * L * iters / (time.perf_counter() - t0) / 1e9)
    return trials


def _emit(obj):
    print(json.dumps(obj))


def main():
    backend, err = _init_with_retries()
    if backend is None:
        out = {
            "metric": "consume_mbps", "value": 0.0, "unit": "MB/s",
            "vs_baseline": 0.0, "error": "backend unavailable: %s" % err,
        }
        if os.path.exists(LKG):
            with open(LKG) as f:
                lkg = json.load(f)
            lkg["stale"] = True
            lkg["error"] = out["error"]
            out = lkg
        else:
            # no bench.py-protocol record yet: surface the last
            # committed TPU kernel capture (a DIFFERENT protocol —
            # benchmarks/bench_kernels.py counters) rather than
            # nothing, clearly labeled
            bk = os.path.join(HERE, "BENCH_KERNELS.json")
            if os.path.exists(bk):
                with open(bk) as f:
                    kern = json.load(f)
                if kern.get("backend") not in (None, "cpu"):
                    out["stale_kernels_record"] = kern
                    out["stale_kernels_note"] = (
                        "bench_kernels.py protocol (not bench.py's "
                        "best-of-3), last captured on TPU")
        _emit(out)
        return

    import jax  # noqa: F401 — backend proven reachable above

    import khmer_tpu

    path = os.path.join(tempfile.gettempdir(), "khmer_tpu_bench_reads.fa")
    if not os.path.exists(path):
        _make_reads(path)
    size = os.path.getsize(path)

    # converged protocol (round-4 VERDICT #8): trial 1 warms the
    # persistent XLA compile cache and is reported separately as
    # cold_mbps; warm trials repeat until the last two agree within
    # 10% (cap 6), and the headline is the LAST (converged) value, so
    # round-over-round comparisons measure steady state, not warm-up.
    trials = []
    while len(trials) < 7:
        cg = khmer_tpu.Countgraph(20, 100_000_000, 4)
        t0 = time.perf_counter()
        cg.consume_seqfile(path)
        cg.n_unique_kmers()  # forces the full flush
        trials.append(size / (time.perf_counter() - t0) / 1e6)
        warm = trials[1:]
        if len(warm) >= 2 and abs(warm[-1] - warm[-2]) <= \
                0.1 * max(warm[-1], warm[-2]):
            break
    warm = trials[1:]

    hash_trials = _hash_kernel_gbps()
    out = {
        "metric": "consume_mbps",
        "value": round(warm[-1], 2),
        "unit": "MB/s",
        "vs_baseline": round(warm[-1] / 12.0, 3),
        "trials_mbps": [round(t, 2) for t in trials],
        "cold_mbps": round(trials[0], 2),
        "stdev_mbps": round(float(np.std(warm)), 2),
        "kmer_hash_gbps": round(max(hash_trials), 3),
        "hash_trials_gbps": [round(t, 3) for t in hash_trials],
        "backend": jax.default_backend(),
        "protocol": "steady-state: trial 1 warms the persistent XLA "
                    "compile cache (reported as cold_mbps); warm "
                    "trials repeat until the last two agree within "
                    "10%; headline = the converged value",
        "captured_unix": int(time.time()),
    }
    if out["backend"] != "cpu":
        with open(LKG, "w") as f:
            json.dump(out, f, indent=1)
    _emit(out)


if __name__ == "__main__":
    main()
