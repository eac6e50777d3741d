"""Partition engine scaling bench (round-5 VERDICT #5).

Times connected components over synthetic tag graphs at >=10x stamps
scale (stamps: 121K tags) — host union-find (the parity engine's
merge machinery) vs the device-resident min-label propagation engine
(khmer_tpu/partition_device.py), serial and mesh-sharded.

The synthetic graph mimics partition structure: `n` tags in
`n_comp` components, each component a random tree plus extra random
in-component edges (tag stars from overlapping BFS neighborhoods).

Writes BENCH_PARTITION.json at the repo root.

Usage: python benchmarks/bench_partition.py [--small]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def synth_tag_graph(rng, n, n_comp, extra_per_node=1.5):
    """Edges over n nodes in n_comp random components."""
    comp = rng.integers(0, n_comp, n)
    order = np.argsort(comp, kind="stable")
    # tree edges: within each component, link each node to a random
    # earlier node of the same component
    starts = np.searchsorted(comp[order], np.arange(n_comp))
    src_t, dst_t = [], []
    sizes = np.diff(np.append(starts, n))
    for c in range(n_comp):
        s, sz = starts[c], sizes[c]
        if sz <= 1:
            continue
        members = order[s: s + sz]
        parents = members[(rng.random(sz - 1) *
                           np.arange(1, sz)).astype(np.int64)]
        src_t.append(members[1:])
        dst_t.append(parents)
    src = np.concatenate(src_t) if src_t else np.zeros(0, np.int64)
    dst = np.concatenate(dst_t) if dst_t else np.zeros(0, np.int64)
    # extra in-component edges
    ne = int(n * extra_per_node)
    a = rng.integers(0, n, ne)
    # partner drawn from the same component via sorted-order offset
    ca = comp[a]
    lo, sz = starts[ca], sizes[ca]
    b = order[lo + (rng.random(ne) * sz).astype(np.int64)]
    src = np.concatenate([src, a]).astype(np.uint32)
    dst = np.concatenate([dst, b]).astype(np.uint32)
    return src, dst


def _scipy_canonical(n, src, dst):
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components as scc

    g = coo_matrix((np.ones(len(src), np.int8), (src, dst)),
                   shape=(n, n))
    _, labels = scc(g, directed=False)
    first = np.full(labels.max() + 1, n, np.int64)
    np.minimum.at(first, labels, np.arange(n))
    return first[labels].astype(np.uint32)


def main(small=False):
    from khmer_tpu.partition_device import (connected_components,
                                            connected_components_sharded,
                                            host_union_find)
    import jax

    rng = np.random.default_rng(42)
    sizes = [(1 << 17, 4000)] if small else \
        [(1 << 20, 20_000), (1 << 22, 60_000)]
    rows = []
    for n, n_comp in sizes:
        src, dst = synth_tag_graph(rng, n, n_comp)
        e = len(src)

        t0 = time.perf_counter()
        want = _scipy_canonical(n, src, dst)
        scipy_s = time.perf_counter() - t0

        row = {
            "n_tags": n, "n_edges": e, "n_components": n_comp,
            "host_scipy_cc_s": round(scipy_s, 3),
        }
        if n <= 1 << 20:
            # the dict/pointer analogue of the parity engine's merge
            # machinery; pure python, so only timed at the small size
            t0 = time.perf_counter()
            uf = host_union_find(n, src, dst)
            row["host_union_find_s"] = round(
                time.perf_counter() - t0, 3)
            assert np.array_equal(uf, want)

        # warm (compile) then measure
        got = np.asarray(connected_components(n, src, dst))
        t0 = time.perf_counter()
        got = np.asarray(connected_components(n, src, dst))
        dev_s = time.perf_counter() - t0
        assert np.array_equal(got, want), "device CC != host CC"

        row["device_cc_s"] = round(dev_s, 3)
        row["device_vs_scipy"] = round(scipy_s / dev_s, 2)

        devs = jax.devices()
        if len(devs) >= 4:
            from jax.sharding import Mesh

            mesh = Mesh(np.array(devs[:4]), ("d",))
            got = np.asarray(connected_components_sharded(
                mesh, n, src, dst))
            t0 = time.perf_counter()
            got = np.asarray(connected_components_sharded(
                mesh, n, src, dst))
            row["device_cc_sharded4_s"] = round(
                time.perf_counter() - t0, 3)
            assert np.array_equal(got, want)
        rows.append(row)
        print(row, flush=True)

    out = {
        "backend": jax.default_backend(),
        "generated_by": "benchmarks/bench_partition.py",
        "note": ("synthetic tag graphs at >=10x stamps scale (121K "
                 "tags); device engine = min-label propagation + "
                 "pointer jumping (partition_device.py), checked "
                 "bit-equal to the host CC each run (scipy csgraph; "
                 "pure-python union-find — the parity engine's merge "
                 "analogue — timed at the 1M size); sharded row = "
                 "edge-sharded 4-device mesh, labels min-all-reduced "
                 "per round"),
        "rows": rows,
    }
    path = os.path.join(REPO, "BENCH_PARTITION.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main(small="--small" in sys.argv)
