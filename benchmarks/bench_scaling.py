"""Sharded-consume scaling table over virtual device meshes, WITH the
comm/compute decomposition (round-3 VERDICT #6).

Runs the USER-FACING `consume_seqfile` sharded path at 1/2/4/8
virtual CPU devices (one subprocess per mesh size — device count is
fixed at backend init) on a fixed read set, asserting bit-equality
of the tables AND of n_unique with serial, and recording:

  * wall time per mesh size,
  * per-stage device times (append / local merge / route / owner
    combine / flush) from the KHMER_TPU_TIMING hooks,
  * routed all_to_all payload bytes + rounds (host-exact counters),
  * the derived comm/compute ratio — the measured quantity that
    predicts multi-chip efficiency (comms ride ICI at tens of GB/s;
    a route payload that is a few % of device compute time implies
    >90% scaling efficiency on real hardware).

NOTE: virtual devices share one host's cores, so wall times here
validate the collective program and measure its OVERHEAD versus
serial — real speedup needs real chips (the all_to_all/psum lowering
is identical).

Writes BENCH_SCALING.json.  Usage: python benchmarks/bench_scaling.py
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

WORKER = r'''
import os, sys, time, json, zlib
n = int(sys.argv[1]); path = sys.argv[2]; tout = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=%d" % max(n, 1)
os.environ["KHMER_TPU_PLATFORM"] = "cpu"
os.environ["KHMER_TPU_SHARDED"] = "1" if n > 1 else "0"
# PASS 1 (the wall): timing hooks OFF — since round 5 the hooks
# block on every stage's output for attribution, which serializes
# the async dispatch pipeline; walls must come from the overlapped
# program users actually run
os.environ["KHMER_TPU_TIMING"] = "0"
import numpy as np
import khmer_tpu as khmer

cg = khmer.Countgraph(20, 2_000_003, 4)
t0 = time.perf_counter()
cg.consume_seqfile(path)
u = cg.n_unique_kmers()
dt = time.perf_counter() - t0
# digest for cross-process equality
tbl = np.asarray(cg.storage.table)
stats = {}
if n > 1:
    from khmer_tpu.parallel.sharded import LAST_CONSUME_STATS
    stats = dict(LAST_CONSUME_STATS)

# PASS 2 (the attribution): same consume with the output-synced
# stage hooks; its (serialized) wall is reported separately
from khmer_tpu.ops import deferred as dfr
dfr._TIMING = True
dfr.reset_stage_times()
cg2 = khmer.Countgraph(20, 2_000_003, 4)
t0 = time.perf_counter()
cg2.consume_seqfile(path)
u2 = cg2.n_unique_kmers()
dt2 = time.perf_counter() - t0
assert u2 == u
with open(tout, "w") as f:
    json.dump({"times_s": {k: round(v, 4)
                           for k, v in dfr.STAGE_TIMES.items()},
               "lanes": dict(dfr.STAGE_LANES)}, f)
print(json.dumps({"devices": n, "seconds": round(dt, 3),
                  "timed_pass_seconds": round(dt2, 3),
                  "n_unique": int(u),
                  "table_sum": int(tbl.astype(np.uint64).sum()),
                  "table_hash": zlib.crc32(tbl.tobytes()),
                  "consume_stats": stats}))
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
        tout = tempfile.mktemp(suffix=".stages.json")
        r = subprocess.run([sys.executable, "-c", WORKER, str(n), path,
                            tout],
                           capture_output=True, text=True)
        line = [l for l in r.stdout.splitlines()
                if l.startswith("{")][-1]
        row = json.loads(line)
        if os.path.exists(tout):
            with open(tout) as f:
                row["stages"] = json.load(f)
            os.unlink(tout)
        stats = row.get("consume_stats") or {}
        times = (row.get("stages") or {}).get("times_s", {})
        if stats and times:
            comm_s = times.get("shard-route", 0.0)
            compute_s = sum(v for k, v in times.items()
                            if k != "shard-route")
            row["comm_compute"] = {
                "routed_mb": round(stats.get("routed_bytes", 0) / 1e6,
                                   2),
                "route_rounds": stats.get("route_rounds", 0),
                "drain_rounds": stats.get("drain_rounds", 0),
                "route_s": round(comm_s, 3),
                "non_route_s": round(compute_s, 3),
                "route_fraction": round(
                    comm_s / (comm_s + compute_s), 4)
                if (comm_s + compute_s) else 0.0,
            }
        rows.append(row)
        print(row, flush=True)
    assert len({r["table_hash"] for r in rows}) == 1, \
        "sharded tables must be bit-identical across mesh sizes"
    # round 3: n_unique is BIT-EQUAL across mesh sizes (both paths
    # count distinct consumed hashes vs the pre-consume table)
    assert len({r["n_unique"] for r in rows}) == 1, \
        "n_unique must be identical across mesh sizes"
    out = {
        "workload": "consume_seqfile, 12MB random reads, k=20, "
                    "4x2e6-bin countgraph",
        "n_unique_note": "tables AND n_unique bit-identical across "
                         "mesh sizes (round-3 estimator: distinct "
                         "consumed hashes vs the pre-consume table)",
        "note": "virtual CPU devices (one host's cores shared): "
                "validates the collective program + measures sharding "
                "overhead vs serial; real speedup needs real chips. "
                "comm_compute.route_fraction is the measured "
                "all_to_all share of device time — the single-chip-"
                "measurable predictor of multi-chip efficiency "
                "(docs/scaling.md).",
        "rows": rows,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH_SCALING.json")


if __name__ == "__main__":
    main()
