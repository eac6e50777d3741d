"""In-process script runner (parity: reference tests/khmer_tst_utils.py
:123-200): exec a scripts/*.py file with patched argv/stdout/stderr so
script integration tests run without subprocess overhead."""

import io
import os
import runpy
import sys
import traceback

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS_DIR = os.path.join(REPO_ROOT, "scripts")
SANDBOX_DIR = os.path.join(REPO_ROOT, "sandbox")


def subprocess_env(base=None):
    """Environment for spawned test subprocesses: guarantees the repo
    root is on PYTHONPATH so ``import khmer_tpu`` works on a fresh
    checkout (no install step), regardless of how pytest itself found
    the package."""
    env = dict(os.environ if base is None else base)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    return env


def scriptpath(name=None):
    """Path of a script (searching scripts/ then sandbox/); with no
    argument, the scripts/ directory itself (reference
    khmer_tst_utils.scriptpath default behavior)."""
    if name is None:
        return SCRIPTS_DIR
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


def copy_test_data(name, newname=None):
    import shutil

    dst = get_temp_filename(newname if newname is not None else name)
    shutil.copy(get_test_data(name), dst)
    return dst


def longify(values):
    return list(values)


def screed_open(path):
    """screed.open stand-in: iterate records with .name/.sequence/
    .quality attributes from any fasta/fastq(.gz/.bz2) file; yields
    nothing on empty input (screed semantics, not ReadParser's)."""
    from khmer_tpu.io.fastx import screed_open as _so

    return _so(path)


def _revcomp(seq):
    from khmer_tpu import reverse_complement

    return reverse_complement(seq)


def _equals_rc(query, match):
    """True if query equals match directly or reverse-complemented
    (parity: reference tests/khmer_tst_utils.py:59)."""
    return (query == match) or (_revcomp(query) == match)


def _contains_rc(match, query):
    """True if query (either orientation) is a substring of match
    (parity: reference tests/khmer_tst_utils.py:63)."""
    return (query in match) or (_revcomp(query) in match)


def _calc_md5(fp):
    from hashlib import md5

    m = md5()
    data = fp.read() if hasattr(fp, "read") else fp
    if isinstance(data, str):
        data = data.encode("utf-8")
    m.update(data)
    return m.hexdigest()


def _calc_md5_path(path):
    from hashlib import md5

    with open(path, "rb") as fp:
        return md5(fp.read()).hexdigest()


def run_shell_cmd(cmd, fail_ok=False, in_directory=None):
    """Run a real shell pipeline (parity: reference
    tests/khmer_tst_utils.py:208) — used by the streaming-io tests to
    exercise stdin/stdout/pipe semantics that the in-process runner
    cannot.  Scripts are resolved via the SCRIPTS/SANDBOX dirs placed
    on PATH, run by the current interpreter."""
    import subprocess

    cwd = os.getcwd()
    if in_directory:
        os.chdir(in_directory)
    env = subprocess_env()
    env["PATH"] = SCRIPTS_DIR + os.pathsep + SANDBOX_DIR + \
        os.pathsep + env.get("PATH", "")
    env.setdefault("KHMER_TPU_PLATFORM", env.get("KHMER_TPU_PLATFORM",
                                                 "cpu"))
    try:
        proc = subprocess.Popen(cmd, shell=True, stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, env=env,
                                executable="/bin/bash")
        out, err = proc.communicate()
        out = out.decode("utf-8", "replace")
        err = err.decode("utf-8", "replace")
        if proc.returncode != 0 and not fail_ok:
            print("out:", out)
            print("err:", err)
            raise AssertionError("exit code %d from: %s" %
                                 (proc.returncode, cmd))
        return proc.returncode, out, err
    finally:
        os.chdir(cwd)


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
