"""Device-resident partition label propagation (round-5 VERDICT #5;
khmer_tpu/partition_device.py).

The north-star engine computes tag-graph connected components ON
DEVICE (min-label propagation + pointer jumping over a device edge
list) instead of the parity engine's host union-find.  These tests
pin: (1) the CC kernel against a host union-find on random graphs,
(2) the sharded (edge-sharded, label-all-reduce) variant against the
serial one on the 8-device virtual mesh, (3) SubsetPartition's
do_partition_device against do_partition as SETS of tags on real
reference data (subset.cc:623-910 semantics).
"""

import numpy as np
import pytest

import khmer_tpu as khmer
from khmer_tpu.partition_device import (
    connected_components,
    connected_components_sharded,
    host_union_find,
)

from . import khmer_tst_utils as utils


def _random_graph(rng, n, e):
    src = rng.integers(0, n, e).astype(np.uint32)
    dst = rng.integers(0, n, e).astype(np.uint32)
    return src, dst


@pytest.mark.parametrize("n,e,seed", [
    (1, 1, 0),
    (17, 3, 1),
    (100, 50, 2),
    (1000, 800, 3),
    (1000, 5000, 4),
    (4096, 4096, 5),
])
def test_cc_matches_union_find(n, e, seed):
    rng = np.random.default_rng(seed)
    src, dst = _random_graph(rng, n, e)
    want = host_union_find(n, src, dst)
    got = np.asarray(connected_components(n, src, dst))
    assert np.array_equal(got, want)


def test_cc_chain_worst_case():
    # a single path graph needs the pointer jumping to converge in
    # O(log n) blocks, not O(n)
    n = 2048
    src = np.arange(n - 1, dtype=np.uint32)
    dst = src + 1
    got = np.asarray(connected_components(n, src, dst))
    assert np.array_equal(got, np.zeros(n, np.uint32))


def test_cc_sharded_matches_serial():
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.array(devs[:4]), ("d",))
    rng = np.random.default_rng(7)
    n, e = 5000, 9000
    src, dst = _random_graph(rng, n, e)
    want = np.asarray(connected_components(n, src, dst))
    got = np.asarray(connected_components_sharded(mesh, n, src, dst))
    assert np.array_equal(got, want)
    assert np.array_equal(want, host_union_find(n, src, dst))


def _partition_sets(subset):
    """Partitions as frozensets of tags (pid numbering ignored)."""
    by_pid = {}
    unassigned = set()
    for tag, pid in subset.partition_map.items():
        if pid is None:
            unassigned.add(tag)
        else:
            by_pid.setdefault(pid, set()).add(tag)
    return {frozenset(s) for s in by_pid.values()}, unassigned


@pytest.mark.parametrize("datafile,ksize,size", [
    ("random-20-a.fa", 20, 4 ** 7 + 1),
    ("test-graph2.fa", 32, 2e3),
])
def test_do_partition_device_equivalence(datafile, ksize, size):
    filename = utils.get_test_data(datafile)

    from khmer_tpu.partitioning import SubsetPartition

    ht1 = khmer.Nodegraph(ksize, size, 4)
    ht1.consume_seqfile_and_tag(filename)
    s1 = SubsetPartition(ht1)
    s1.do_partition()

    ht2 = khmer.Nodegraph(ksize, size, 4)
    ht2.consume_seqfile_and_tag(filename)
    s2 = SubsetPartition(ht2)
    s2.do_partition_device()

    sets1, un1 = _partition_sets(s1)
    sets2, un2 = _partition_sets(s2)
    assert sets1 == sets2
    assert un1 == un2
    assert s1.count_partitions() == s2.count_partitions()


def test_do_partition_device_sharded_mesh():
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.array(devs[:4]), ("d",))
    filename = utils.get_test_data("random-20-a.fa")

    from khmer_tpu.partitioning import SubsetPartition

    ht1 = khmer.Nodegraph(20, 4 ** 7 + 1, 4)
    ht1.consume_seqfile_and_tag(filename)
    s1 = SubsetPartition(ht1)
    s1.do_partition()

    ht2 = khmer.Nodegraph(20, 4 ** 7 + 1, 4)
    ht2.consume_seqfile_and_tag(filename)
    s2 = SubsetPartition(ht2)
    s2.do_partition_device(mesh=mesh)

    assert _partition_sets(s1) == _partition_sets(s2)
