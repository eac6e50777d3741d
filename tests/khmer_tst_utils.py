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


REF_TEST_DATA = os.path.join(
    os.environ.get("KHMER_REFERENCE_DIR", "/root/reference"),
    "tests", "test-data")

_temp_root = None


def get_test_data(name):
    return os.path.join(REF_TEST_DATA, name)


def _tempdir():
    global _temp_root
    if _temp_root is None:
        import tempfile

        _temp_root = tempfile.mkdtemp(prefix="khmer_tpu_test_")
    return _temp_root


def get_temp_filename(name, tempdir=None):
    import tempfile

    d = tempdir if tempdir is not None else tempfile.mkdtemp(
        dir=_tempdir())
    return os.path.join(d, name)


def copy_test_data(name):
    import shutil

    dst = get_temp_filename(name)
    shutil.copy(get_test_data(name), dst)
    return dst


def longify(values):
    return list(values)


def cleanup():
    global _temp_root
    if _temp_root is not None:
        import shutil

        shutil.rmtree(_temp_root, ignore_errors=True)
        _temp_root = None


def runscript(scriptname, args, in_directory=None, fail_ok=False,
              sandbox=False):
    """Run a script in-process; returns (status, out, err).

    `sandbox` is accepted for reference-test parity (scriptpath
    already searches both scripts/ and sandbox/)."""
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
