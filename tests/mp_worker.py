"""Worker process for the 2-process jax.distributed CPU test
(tests/test_multiprocess.py).  Not a test module.

Each worker owns 4 virtual CPU devices; together they form a [1, 8]
("data", "shard") mesh.  Only process 0 receives the input file, so
process 1 must keep stepping with zero-weight chunks — exercising the
SPMD-safe progress gating in distributed_count.
"""

import os
import sys

import numpy as np


def main():
    port, pid, nproc, infile, outdir = sys.argv[1:6]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4").strip()
    os.environ["KHMER_TPU_PLATFORM"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:%s" % port,
        num_processes=int(nproc),
        process_id=int(pid),
    )
    assert jax.device_count() == 4 * int(nproc)

    from khmer_tpu.ops.sketch_ops import SketchSpec
    from khmer_tpu.parallel.multihost import distributed_count
    from khmer_tpu.primes import get_n_primes_near_x

    spec = SketchSpec("byte", tuple(get_n_primes_near_x(3, 100000)), True)
    c = distributed_count([infile], spec, 20, chunk=4096)
    table = c.merged_table()
    uniq = c.n_unique_kmers()
    dropped = c.n_dropped
    if int(pid) == 0:
        np.savez(os.path.join(outdir, "result.npz"),
                 table=table, uniq=np.int64(uniq),
                 dropped=np.int64(dropped))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
