"""GB-scale sketch support (reference tests/test_memory.py: sketches
whose table sizes exceed a 32-bit int must allocate and count).

The flat uint32-bin engine indexes bins in int64, so sizes past 2**32
must construct, count, and read back correctly.  These allocate
multi-GB host buffers (lazily zeroed), so table counts are kept to 1.
"""

import pytest

import khmer_tpu as khmer


@pytest.mark.parametrize("sketch_allocator", [
    khmer.Nodetable,
    khmer.Counttable,
    khmer.SmallCounttable,
])
def test_bigger_than_int(sketch_allocator):
    """Support GB-sized sketches (reference test_bigger_than_int)."""
    sketch = sketch_allocator(32, 2 ** 32, 1)
    kmer = "A" * 16 + "C" * 16
    sketch.add(kmer)
    assert sketch.get(kmer) == 1
    assert sketch.hashsizes()[0] > 2 ** 31  # bigger than int32


def test_bigger_than_int_labels():
    """GraphLabels over a >int32 graph (reference parametrization
    includes NodeGraphLabels/CountGraphLabels)."""
    from khmer_tpu.labeling import GraphLabels

    graph = khmer.Nodegraph(32, 2 ** 32, 1)
    lh = GraphLabels(graph)
    assert lh.graph.hashsizes()[0] > 2 ** 31
