"""Multi-host orchestration for khmer-tpu.

On a multi-host TPU pod slice, each host process runs the same program
(SPMD): `jax.distributed.initialize` wires the hosts together, every
host parses its own shard of the input files with the native loader,
and the sharded consume step's collectives (all_to_all routing along
"shard", psum merges) ride ICI within a slice and DCN across slices —
exactly the north-star layout (BASELINE.md).

The single-chip driver cannot exercise real multi-host runs; this
module is the documented entry point, validated structurally on the
virtual multi-device mesh (the same `shard_map` program runs in both
settings — JAX collectives are agnostic to process count).
"""

import os

import numpy as np

import jax

from khmer_tpu.parallel.sharded import ShardedCountConsumer, make_mesh


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    No-op when single-process."""
    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num_processes,
        process_id=process_id if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def shard_files_for_host(filenames, process_id=None, num_processes=None):
    """Round-robin file assignment: each host consumes its own input
    shard (the reference's analogue is one ReadParser per thread,
    oxli/functions.py:42-66; here it is one file stream per host)."""
    pid = process_id if process_id is not None else jax.process_index()
    n = num_processes if num_processes is not None else jax.process_count()
    return [f for i, f in enumerate(filenames) if i % n == pid]


def distributed_count(filenames, spec, k, hash_kind="2bit", data_axis=None,
                      chunk=1 << 20):
    """Count k-mers from `filenames` across every device of every host.

    Builds a global ("data", "shard") mesh over jax.devices(), streams
    each host's file shard through the native loader, and feeds
    per-device chunks into the sharded consume step.  Returns the
    ShardedCountConsumer (query/merge through its methods)."""
    from khmer_tpu.native import NativeChunkReader, native_available

    mesh = make_mesh(jax.devices(), data=data_axis)
    consumer = ShardedCountConsumer(spec, k, hash_kind, mesh=mesh,
                                    chunk=chunk)
    D, S = consumer.D, consumer.S
    per_step = D * S

    if not native_available():
        raise RuntimeError("native loader required for distributed_count")

    my_files = shard_files_for_host(filenames)
    pending_data = []
    pending_mask = []

    def flush():
        n = len(pending_data)
        if n == 0:
            return
        while len(pending_data) < per_step:
            pending_data.append(np.zeros(chunk, np.uint8))
            pending_mask.append(np.zeros(chunk, np.uint8))
        data = np.stack(pending_data).reshape(D, S, chunk)
        mask = np.stack(pending_mask).reshape(D, S, chunk)
        consumer.consume_chunks(data, mask)
        pending_data.clear()
        pending_mask.clear()

    for filename in my_files:
        for data, mask in NativeChunkReader(filename, k, chunk):
            pending_data.append(data)
            pending_mask.append(mask)
            if len(pending_data) == per_step:
                flush()
    flush()
    return consumer
