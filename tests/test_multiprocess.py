"""True multi-process jax.distributed counting (VERDICT round-2 #1b).

Spawns TWO OS processes, each with 4 virtual CPU devices, wired by a
loopback jax.distributed coordinator into one [1, 8] mesh; the file
list is deliberately uneven (one file, two hosts), so the run also
proves the SPMD progress gating.  Asserts bit-equality of the merged
sharded table with a plain single-device consume.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from .conftest import REF_TEST_DATA

WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_count_bit_equal(tmpdir):
    from khmer_tpu.native import native_available

    if not native_available():
        pytest.skip("native loader not built")
    infile = os.path.join(REF_TEST_DATA, "100-reads.fq.gz")
    port = _free_port()
    from . import khmer_tst_utils as tst
    env = tst.subprocess_env(
        {k: v for k, v in os.environ.items()
         if k not in ("XLA_FLAGS", "JAX_PLATFORMS")})
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), "2", infile,
             str(tmpdir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=540)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, "worker failed:\n%s\n%s" % (out[-2000:], err[-2000:])

    got = np.load(str(tmpdir.join("result.npz")))
    assert int(got["dropped"]) == 0

    # serial ground truth in-process (CPU backend via conftest)
    from khmer_tpu.graph import Countgraph
    from khmer_tpu.primes import get_n_primes_near_x

    g = Countgraph(20, primes=get_n_primes_near_x(3, 100000))
    g.set_use_bigcount(True)
    g.consume_seqfile(infile)
    assert int(got["uniq"]) == g.n_unique_kmers()
    assert np.array_equal(got["table"], np.asarray(g.storage.table))
