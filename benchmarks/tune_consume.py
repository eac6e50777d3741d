"""Consume-path tuning sweep for real TPU hardware (round-3 VERDICT
item 1: drive e2e consume toward >=120 MB/s).

Sweeps the two knobs that shape the retain-mode hot path:

  * KHMER_TPU_CHUNK     — bases per device dispatch (wire batching)
  * KHMER_TPU_MERGE_LOG — log2 of DeferredCounter.MERGE_EVERY (cycle
                          sort size; bigger = fewer sorts, more HBM)

Each configuration runs in a SUBPROCESS (env is read at import) over
the bench.py workload (400k x 150bp synthetic reads) with the stage
timers on, printing one JSON line per config and a final ranking.

Usage: python benchmarks/tune_consume.py [--quick]
"""

import itertools
import json
import os
import subprocess
import sys
import tempfile

WORKER = r'''
import os, sys, time, json
import numpy as np

path, tout = sys.argv[1], sys.argv[2]
os.environ["KHMER_TPU_TIMING"] = "1"
os.environ["KHMER_TPU_TIMING_OUT"] = tout

import khmer_tpu as khmer

nbytes = os.path.getsize(path)
cg = khmer.Countgraph(20, 50_000_017, 4)
t0 = time.perf_counter()
cg.consume_seqfile(path)
u = cg.n_unique_kmers()
dt = time.perf_counter() - t0
print(json.dumps({"seconds": round(dt, 3),
                  "mbps": round(nbytes / dt / 1e6, 2),
                  "n_unique": int(u)}))
'''


def make_reads(path, n_reads=400_000, readlen=150, seed=11):
    import numpy as np

    rng = np.random.default_rng(seed)
    lut = np.frombuffer(b"ACGT", np.uint8)
    with open(path, "wb") as f:
        for i in range(n_reads):
            seq = lut[rng.integers(0, 4, readlen)].tobytes()
            f.write(b">r%d\n%s\n" % (i, seq))
    return os.path.getsize(path)


def main():
    quick = "--quick" in sys.argv
    path = os.path.join(tempfile.gettempdir(), "khmer_tune_reads.fa")
    if not os.path.exists(path):
        make_reads(path)
    nbytes = os.path.getsize(path)
    print("workload: %.1f MB" % (nbytes / 1e6), flush=True)

    chunks = [1 << 22, 1 << 23, 1 << 24] if not quick else [1 << 23]
    merges = [24, 25, 26] if not quick else [25]

    rows = []
    for chunk, mlog in itertools.product(chunks, merges):
        tout = tempfile.mktemp(suffix=".stages.json")
        env = dict(os.environ)
        env["KHMER_TPU_CHUNK"] = str(chunk)
        env["KHMER_TPU_MERGE_LOG"] = str(mlog)
        r = subprocess.run([sys.executable, "-c", WORKER, path, tout],
                           capture_output=True, text=True, env=env,
                           timeout=1200)
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("{")]
        if not line:
            print({"chunk": chunk, "merge_log": mlog,
                   "error": r.stderr.strip()[-300:]}, flush=True)
            continue
        row = json.loads(line[-1])
        row.update(chunk=chunk, merge_log=mlog)
        if os.path.exists(tout):
            with open(tout) as f:
                row["stages"] = json.load(f).get("times_s", {})
            os.unlink(tout)
        rows.append(row)
        print(json.dumps(row), flush=True)

    if rows:
        best = max(rows, key=lambda r: r["mbps"])
        print("\nBEST: chunk=%d merge_log=%d -> %.1f MB/s" %
              (best["chunk"], best["merge_log"], best["mbps"]))
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "TUNE_CONSUME.json"),
                "w") as f:
            json.dump(rows, f, indent=1)
        print("wrote TUNE_CONSUME.json")


if __name__ == "__main__":
    main()
