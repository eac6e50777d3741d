"""In-process script runner (parity: reference tests/khmer_tst_utils.py
:123-200): exec a scripts/*.py file with patched argv/stdout/stderr so
script integration tests run without subprocess overhead."""

import io
import os
import runpy
import sys
import traceback

SCRIPTS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
SANDBOX_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "sandbox")


def scriptpath(name):
    for d in (SCRIPTS_DIR, SANDBOX_DIR):
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(name)


def runscript(scriptname, args, in_directory=None, fail_ok=False):
    """Run a script in-process; returns (status, out, err)."""
    path = scriptpath(scriptname)
    sysargs = [path] + [str(a) for a in args]

    cwd = os.getcwd()
    oldargs = sys.argv
    oldout, olderr = sys.stdout, sys.stderr
    sys.stdout = io.StringIO()
    sys.stderr = io.StringIO()
    status = 0
    try:
        sys.argv = sysargs
        if in_directory:
            os.chdir(in_directory)
        try:
            runpy.run_path(path, run_name="__main__")
        except SystemExit as err:
            status = err.code or 0
        except Exception:
            traceback.print_exc(file=sys.stderr)
            status = -1
    finally:
        sys.argv = oldargs
        out = sys.stdout.getvalue()
        err = sys.stderr.getvalue()
        sys.stdout, sys.stderr = oldout, olderr
        os.chdir(cwd)
    if status != 0 and not fail_ok:
        raise AssertionError(
            "%s exited with status %s\nout: %s\nerr: %s" %
            (scriptname, status, out, err))
    return status, out, err
