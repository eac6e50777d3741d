"""Sharded-consume scaling table over virtual device meshes.

Runs the USER-FACING `consume_seqfile` sharded path at 1/2/4/8
virtual CPU devices (one subprocess per mesh size — device count is
fixed at backend init) on a fixed read set, asserting bit-equality
with serial and recording wall time; writes BENCH_SCALING.json.

NOTE: virtual devices share one host's cores, so this validates the
collective program and measures its OVERHEAD versus serial — real
speedup needs real chips (the driver's dryrun compiles the same
program; the all_to_all/psum lowering is identical).
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

WORKER = r'''
import os, sys, time, json, zlib
n = int(sys.argv[1]); path = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=%d" % max(n, 1)
os.environ["KHMER_TPU_PLATFORM"] = "cpu"
os.environ["KHMER_TPU_SHARDED"] = "1" if n > 1 else "0"
import numpy as np
import khmer_tpu as khmer

cg = khmer.Countgraph(20, 2_000_003, 4)
t0 = time.perf_counter()
cg.consume_seqfile(path)
u = cg.n_unique_kmers()
dt = time.perf_counter() - t0
# digest for cross-process equality
tbl = np.asarray(cg.storage.table)
print(json.dumps({"devices": n, "seconds": round(dt, 3),
                  "n_unique": int(u),
                  "table_sum": int(tbl.astype(np.uint64).sum()),
                  "table_hash": zlib.crc32(tbl.tobytes())}))
'''


def main():
    path = os.path.join(tempfile.gettempdir(), "khmer_scaling_reads.fa")
    if not os.path.exists(path):
        rng = np.random.default_rng(7)
        lut = np.frombuffer(b"ACGT", np.uint8)
        with open(path, "wb") as f:
            for i in range(120_000):
                seq = lut[rng.integers(0, 4, 100)].tobytes()
                f.write(b">r%d\n%s\n" % (i, seq))
    rows = []
    for n in (1, 2, 4, 8):
        r = subprocess.run([sys.executable, "-c", WORKER, str(n), path],
                           capture_output=True, text=True)
        line = [l for l in r.stdout.splitlines()
                if l.startswith("{")][-1]
        rows.append(json.loads(line))
        print(rows[-1], flush=True)
    assert len({r["table_hash"] for r in rows}) == 1, \
        "sharded tables must be bit-identical across mesh sizes"
    # the n_unique ESTIMATOR: bit-equal to serial until the table
    # saturates; under saturation each shard's partial table has
    # fewer colliding hashes, so the sharded estimate is LARGER
    # (closer to the true distinct count) — documented deviation,
    # same direction as the reference's banded estimators
    serial_u = rows[0]["n_unique"]
    assert all(r["n_unique"] >= serial_u for r in rows[1:])
    out = {
        "workload": "consume_seqfile, 12MB random reads, k=20, "
                    "4x2e6-bin countgraph",
        "n_unique_note": "counts/tables bit-identical; the n_unique "
                         "estimator under table saturation is larger "
                         "(more accurate) on sharded meshes — each "
                         "partial table sees 1/S of the hash "
                         "collisions",
        "note": "virtual CPU devices (one host's cores shared): "
                "validates the collective program + measures sharding "
                "overhead vs serial; real speedup needs real chips.",
        "rows": rows,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH_SCALING.json")


if __name__ == "__main__":
    main()
