"""Multi-host orchestration for khmer-tpu.

On a multi-host TPU pod slice, each host process runs the same program
(SPMD): `jax.distributed.initialize` wires the hosts together, every
host parses its own shard of the input files with the native loader,
and the sharded consume's collectives (all_to_all band routing, psum
merges) ride ICI within a slice and DCN across slices — exactly the
north-star layout (BASELINE.md).

Round 3: `distributed_count` runs on the DEFERRED consumer
(parallel/sharded.py ShardedDeferredConsumer) — zero-communication
streaming with local sort-dedup, one routed collect + exact owner-side
combine at the end.  Drops are structurally impossible (routing
overflow lanes drain until none remain), and n_unique is bit-equal to
the single-device path (round-2 used the streaming router, which could
drop lanes under hash skew and overcounted n_unique per band).

The single-chip driver cannot exercise real multi-host runs; this
module is the documented entry point, validated by a true 2-OS-process
jax.distributed test (tests/test_multiprocess.py) and on the virtual
multi-device mesh (the same `shard_map` program runs in both settings —
JAX collectives are agnostic to process count).
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from khmer_tpu.parallel.sharded import (ShardedDeferredConsumer, make_mesh,
                                        make_scalar_sum, make_sharded_query)


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


class DistributedCountResult:
    """Read-side view of a finished distributed count: partial tables
    stay device-resident; queries psum across the mesh (exact serial
    CMS reads), aggregate reads come from replicated-output jits."""

    n_dropped = 0  # structurally impossible in the deferred design

    def __init__(self, consumer, delta, n_unique, n_consumed, cands):
        self._consumer = consumer
        self._delta = delta
        self._n_unique = n_unique
        self._n_consumed = n_consumed
        self.bigcount_candidates = cands
        self.spec = consumer.spec
        self.mesh = consumer.mesh
        self._query = make_sharded_query(self.spec, self.mesh)

    def n_unique_kmers(self):
        return self._n_unique

    @property
    def n_consumed(self):
        return self._n_consumed

    def get_counts(self, hashes):
        return np.asarray(self._query(
            self._consumer.tables, jnp.asarray(hashes, jnp.uint64)))

    def merged_table(self):
        """The serial-equal flat u32 table (replicated; host numpy)."""
        return np.asarray(self._delta)


def distributed_count(filenames, spec, k, hash_kind="2bit", data_axis=None,
                      chunk=1 << 20):
    """Count k-mers from `filenames` across every device of every host.

    Builds a global ("data", "shard") mesh over jax.devices(), streams
    each host's file shard through the native loader, and feeds each
    process's LOCAL device chunks into the sharded deferred consumer
    (jax.make_array_from_process_local_data assembles the global
    batch).  SPMD-safe under uneven file shards: every dispatch is
    gated on a cross-process allgather of per-host progress, so all
    processes issue identical collective sequences — a host whose
    files are exhausted keeps dispatching zero-weight chunks until
    every host is done.  Returns a DistributedCountResult."""
    import itertools

    from khmer_tpu.native import NativeChunkReader, native_available

    mesh = make_mesh(jax.devices(), data=data_axis)
    consumer = ShardedDeferredConsumer(spec, k, hash_kind, mesh=mesh,
                                       chunk=chunk, from_codes=True)

    if not native_available():
        raise RuntimeError("native loader required for distributed_count")

    multi = jax.process_count() > 1
    n_local = consumer._batch_rows

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
        for data, weights in batch:
            consumer.add_chunk(data, weights)  # auto-dispatches when full
        # lockstep: exactly ONE dispatch per process per round (a full
        # batch auto-dispatched above; short/empty ones pad out here)
        if multi and (consumer._pending or got < n_local):
            consumer._dispatch(force=True)
    delta, n_unique, n_consumed, cands = consumer.finish(virgin=True)
    return DistributedCountResult(consumer, delta, n_unique, n_consumed,
                                  cands)
