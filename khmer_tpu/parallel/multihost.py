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
    each host's file shard through the native loader, and feeds each
    process's LOCAL device chunks into the sharded consume step
    (jax.make_array_from_process_local_data assembles the global
    array).  SPMD-safe under uneven file shards: every step is gated
    on a cross-process allgather of per-host progress, so all
    processes issue identical collective sequences — a host whose
    files are exhausted keeps stepping with zero-weight chunks until
    every host is done.  Returns the ShardedCountConsumer."""
    import itertools

    from khmer_tpu.native import NativeChunkReader, native_available

    mesh = make_mesh(jax.devices(), data=data_axis)
    consumer = ShardedCountConsumer(spec, k, hash_kind, mesh=mesh,
                                    chunk=chunk)
    D, S = consumer.D, consumer.S

    if not native_available():
        raise RuntimeError("native loader required for distributed_count")

    multi = jax.process_count() > 1
    if multi and D != 1:
        raise ValueError(
            "multi-process distributed_count supports a [1, S] mesh "
            "(every device a hash-band shard); got data=%d" % D)

    # local rows of the global [D, S, chunk] batch owned by this process
    n_local = sum(d.process_index == jax.process_index()
                  for d in mesh.devices.flat)

    def local_chunks():
        for filename in shard_files_for_host(filenames):
            yield from NativeChunkReader(filename, k, chunk)

    it = local_chunks()
    while True:
        batch = list(itertools.islice(it, n_local))
        got = len(batch)
        if multi:
            from jax.experimental import multihost_utils

            flags = multihost_utils.process_allgather(
                np.asarray(got, np.int32))
            if int(np.max(flags)) == 0:
                break
        elif got == 0:
            break
        while len(batch) < n_local:
            batch.append((np.zeros(chunk, np.uint8),
                          np.zeros(chunk, np.uint8)))
        local_data = np.stack([d for d, _ in batch])
        local_mask = np.stack([m.astype(np.uint32) for _, m in batch])
        if multi:
            data = jax.make_array_from_process_local_data(
                consumer.shardings["data"],
                local_data.reshape(1, n_local, chunk))
            mask = jax.make_array_from_process_local_data(
                consumer.shardings["data"],
                local_mask.reshape(1, n_local, chunk))
            consumer.consume_chunks_arrays(data, mask)
        else:
            consumer.consume_chunks(local_data.reshape(D, S, chunk),
                                    local_mask.reshape(D, S, chunk))
    return consumer
