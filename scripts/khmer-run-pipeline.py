#!/usr/bin/env python
"""usage: khmer-run-pipeline.py script.py arg... -- script.py arg... | @stages.txt

Run several khmer-tpu script invocations in ONE python process.

Each CLI script costs ~2-3 s of interpreter + JAX + backend startup,
and every new process starts with cold in-process jit caches (the
persistent XLA cache removes recompiles, but not retraces or backend
init).  A multi-stage pipeline (examples/stamps/do.sh: 16 stages) pays
that per stage; this driver pays it ONCE and runs the stages in-process
with shared warm caches — the "reuse one backend across pipeline
stages" mode (same in-process exec the test runner uses,
tests/khmer_tst_utils.py runscript).

With @stages.txt, stages come one per line, shell-split.  Script names are resolved against this scripts/ directory, then
sandbox/, then as given.  A non-zero stage exit stops the pipeline and
becomes this process's exit code.  Stage timings go to stderr.
"""

import os
import runpy
import shlex
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
SANDBOX = os.path.join(os.path.dirname(HERE), "sandbox")


def resolve(name):
    for d in (HERE, SANDBOX):
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    return name


def stages_from_argv(argv):
    if len(argv) == 1 and argv[0].startswith("@"):
        with open(argv[0][1:]) as f:
            return [shlex.split(line) for line in f
                    if line.strip() and not line.lstrip().startswith("#")]
    out, cur = [], []
    for a in argv:
        if a == "--":
            if cur:
                out.append(cur)
            cur = []
        else:
            cur.append(a)
    if cur:
        out.append(cur)
    return out


def run_stage(stage):
    path = resolve(stage[0])
    old_argv = sys.argv
    sys.argv = [path] + stage[1:]
    t0 = time.perf_counter()
    try:
        runpy.run_path(path, run_name="__main__")
        code = 0
    except SystemExit as e:
        code = e.code if isinstance(e.code, int) else (0 if e.code is None
                                                       else 1)
    finally:
        sys.argv = old_argv
    dt = time.perf_counter() - t0
    print("[khmer-run-pipeline] %s: %.2fs (exit %s)"
          % (os.path.basename(path), dt, code), file=sys.stderr)
    return code


def main():
    argv = sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help", "--version", "--info"):
        # behave like every other scripts/ entry point: citation to
        # stderr on --info/--version/--help (the script sweep test
        # checks the whole directory)
        from khmer_tpu import khmer_args

        khmer_args.info(os.path.basename(sys.argv[0]))
        if not argv or argv[0] in ("-h", "--help"):
            print(__doc__)
        return 0
    stages = stages_from_argv(argv)
    t0 = time.perf_counter()
    for stage in stages:
        code = run_stage(stage)
        if code:
            print("[khmer-run-pipeline] stage failed; stopping",
                  file=sys.stderr)
            return code
    print("[khmer-run-pipeline] %d stages in %.2fs total"
          % (len(stages), time.perf_counter() - t0), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
