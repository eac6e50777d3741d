"""Multi-chip / multi-host scaling for khmer-tpu.

The reference's entire parallelism surface is single-host (SURVEY.md
section 2d): shared-sketch threading (P1), hash-space banding (P2), and
task-parallel partitioning (P3).  This package is the TPU-native
replacement: a `jax.sharding.Mesh` with

  * a ``data`` axis — read batches stream data-parallel, each device
    consuming its own chunk (the analogue of `-T` threads hammering one
    sketch, reference oxli/functions.py:42-66), and
  * a ``shard`` axis — the hash space is split into contiguous bands and
    each shard owns one band's k-mers (the analogue of
    `consume_seqfile_banding`, reference include/oxli/hashtable.hh:302-344),
    with k-mers routed to their owner via `jax.lax.all_to_all` over ICI.

Merging per-device partial tables is a saturating sum (exactly equal to
the serial table: saturating increments commute, see
khmer_tpu/parallel/sharded.py), and count queries psum per-table bin
totals before the min-over-tables reduction, reproducing serial CMS
semantics bit-for-bit.
"""

from khmer_tpu.parallel.sharded import (  # noqa: F401
    ShardedDeferredConsumer,
    band_owner,
    make_mesh,
    make_sharded_query,
    merge_tables_saturating,
)
from khmer_tpu.parallel.multihost import (  # noqa: F401
    distributed_count,
    initialize,
    shard_files_for_host,
)
