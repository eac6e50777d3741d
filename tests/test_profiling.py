"""Tracing/profiling subsystem hooks (SURVEY §5).

Two observability layers, both env-gated because they are read at
import time:

  KHMER_TPU_TIMING=1 (+ KHMER_TPU_TIMING_OUT=<json>) — per-stage wall
      clocks and lane counts for the consume pipeline
      (ops/deferred.py: pack, h2d-enqueue, append, combine, flush...);
      what benchmarks/bench_pipelines.py uses to separate device time
      from the host/tunnel share.
  KHMER_TPU_PROFILE=<dir> — a full XProf/TensorBoard device trace for
      the process (khmer_tpu/_config.py), the profiler-hook analogue
      of the reference's TraceLogger (src/oxli/trace_logger.cc).

Run in subprocesses so the env gates are exercised for real.
"""

import json
import os
import subprocess
import sys

import pytest

from . import khmer_tst_utils as utils

_SCRIPT = """
import khmer_tpu
cg = khmer_tpu.Countgraph(20, 100_000, 2)
cg.consume_seqfile(%r)
print(cg.n_unique_kmers())
"""


def _run(extra_env, tmpdir):
    env = utils.subprocess_env()
    env["KHMER_TPU_PLATFORM"] = "cpu"
    env.pop("KHMER_TPU_TIMING", None)
    env.pop("KHMER_TPU_TIMING_OUT", None)
    env.pop("KHMER_TPU_PROFILE", None)
    env.update(extra_env)
    infile = utils.get_test_data("100-reads.fq.gz")
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT % infile],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=str(tmpdir))
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.strip().splitlines()[-1] == "3854"


def test_stage_timing_dump(tmpdir):
    out = str(tmpdir / "stages.json")
    _run({"KHMER_TPU_TIMING": "1", "KHMER_TPU_TIMING_OUT": out}, tmpdir)
    with open(out) as f:
        rec = json.load(f)
    assert rec["times_s"], "no stages recorded"
    assert all(v >= 0 for v in rec["times_s"].values())
    # the consume path must have passed through the deferred pipeline
    assert any(k in rec["times_s"] for k in ("append", "pack", "combine",
                                             "flush", "h2d-enqueue"))


def test_profiler_trace_dump(tmpdir):
    prof = str(tmpdir / "prof")
    _run({"KHMER_TPU_PROFILE": prof}, tmpdir)
    planes = [f for _, _, fs in os.walk(prof) for f in fs
              if f.endswith(".xplane.pb")]
    assert planes, "no xplane trace written under KHMER_TPU_PROFILE"


def test_hooks_off_by_default(tmpdir):
    # no stray trace/timing artifacts when the env gates are unset
    _run({}, tmpdir)
    assert not os.path.exists(str(tmpdir / "plugins"))


def test_flush_log_env_reread_and_validated(monkeypatch):
    """KHMER_TPU_FLUSH_LOG is re-read on every call (round-4 ADVICE:
    an lru_cache made later changes silently ignored) and validated
    with an error naming the variable."""
    from khmer_tpu.ops import deferred

    monkeypatch.delenv("KHMER_TPU_FLUSH_LOG", raising=False)
    default = deferred.flush_slice()
    assert default == 1 << deferred._default_flush_log()
    monkeypatch.setenv("KHMER_TPU_FLUSH_LOG", "16")
    assert deferred.flush_slice() == 1 << 16
    monkeypatch.setenv("KHMER_TPU_FLUSH_LOG", "17")
    assert deferred.flush_slice() == 1 << 17  # change takes effect
    for bad in ("banana", "7", "99"):
        monkeypatch.setenv("KHMER_TPU_FLUSH_LOG", bad)
        with pytest.raises(ValueError, match="KHMER_TPU_FLUSH_LOG"):
            deferred.flush_slice()
    monkeypatch.delenv("KHMER_TPU_FLUSH_LOG")
    assert deferred.flush_slice() == default
