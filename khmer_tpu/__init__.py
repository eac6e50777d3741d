"""khmer-tpu: TPU-native k-mer counting, filtering and graph traversal.

A ground-up re-design of the khmer/oxli toolkit (reference:
github.com/dib-lab/khmer) for TPU hardware: sketches live in device HBM as
flat arrays, every per-k-mer loop is a batched XLA/Pallas kernel, and
multi-chip scaling uses jax.sharding meshes with hash-space sharding.

The public API mirrors khmer's (khmer/__init__.py in the reference) so the
CLI scripts and user code port over directly.
"""

from collections import namedtuple
from struct import pack, unpack
import sys

from khmer_tpu import _config  # noqa: F401  (enables x64 etc.)
from khmer_tpu._version import __version__

from khmer_tpu.ops.hashing import (
    forward_hash,
    forward_hash_no_rc,
    reverse_hash,
    reverse_complement,
    hash_murmur3_scalar as hash_murmur3,
    hash_no_rc_murmur3_scalar as hash_no_rc_murmur3,
)
from khmer_tpu.primes import get_n_primes_near_x, is_prime
from khmer_tpu.io.fastx import Read, FastxReader
from khmer_tpu.io.oxli_format import FILETYPES
from khmer_tpu.hashtable import (
    BufferedQFCounttable,
    OnDiskQFCounttable,
    Counttable,
    CyclicCounttable,
    QFCounttable,
    SmallCounttable,
    Nodetable,
)
from khmer_tpu.kmer import Kmer
from khmer_tpu.graph import (
    Countgraph,
    SmallCountgraph,
    Nodegraph,
)
from khmer_tpu.legacy import Hashbits, new_hashbits, new_hashtable
from khmer_tpu.hllcounter import HLLCounter
from khmer_tpu.hashset import HashSet
from khmer_tpu.readaligner import ReadAligner
from khmer_tpu.labeling import GraphLabels
from khmer_tpu.assembly import (
    JunctionCountAssembler,
    LinearAssembler,
    SimpleLabeledAssembler,
)
from khmer_tpu.partitioning import PrePartitionInfo, SubsetPartition
from khmer_tpu.parsing import FastxParser

# khmer exposes the ReadParser name for multi-threaded parsing; on TPU the
# parser feeds device batches, one stream per host process.
ReadParser = FastxReader

_buckets_per_byte = {
    # parity with reference khmer/__init__.py:86-93
    'qfcounttable': 1 / 1.26,
    'countgraph': 1,
    'counttable': 1,
    'smallcountgraph': 2,
    'nodegraph': 8,
}


def extract_nodegraph_info(filename):
    """Header peek for a nodegraph file (khmer/__init__.py:96-132)."""
    try:
        with open(filename, 'rb') as f:
            signature, = unpack('4s', f.read(4))
            version, = unpack('B', f.read(1))
            ht_type, = unpack('B', f.read(1))
            ksize, = unpack('I', f.read(4))
            n_tables, = unpack('B', f.read(1))
            occupied, = unpack('Q', f.read(8))
            table_size, = unpack('Q', f.read(8))
        if signature != b"OXLI":
            raise ValueError(
                "Node graph '{}' is missing file type "
                "signature".format(filename) + str(signature))
    except ValueError:
        raise
    except Exception:
        raise ValueError("Node graph '{}' is corrupt ".format(filename))

    return ksize, round(table_size, -2), n_tables, version, ht_type, occupied


def extract_countgraph_info(filename):
    """Header peek for a countgraph file (khmer/__init__.py:135-179)."""
    CgInfo = namedtuple("CgInfo", ['ksize', 'n_tables', 'table_size',
                                   'use_bigcount', 'version', 'ht_type',
                                   'n_occupied'])
    try:
        with open(filename, 'rb') as f:
            signature, = unpack('4s', f.read(4))
            version, = unpack('B', f.read(1))
            ht_type, = unpack('B', f.read(1))
            if ht_type != FILETYPES['SMALLCOUNT']:
                use_bigcount, = unpack('B', f.read(1))
            else:
                use_bigcount = None
            ksize, = unpack('I', f.read(4))
            n_tables, = unpack('B', f.read(1))
            occupied, = unpack('Q', f.read(8))
            table_size, = unpack('Q', f.read(8))
        if signature != b'OXLI':
            raise ValueError(
                "Count graph file '{}' is missing file type "
                "signature. ".format(filename) + str(signature))
    except ValueError:
        raise
    except Exception:
        raise ValueError(
            "Count graph file '{}' is corrupt ".format(filename))

    return CgInfo(ksize, n_tables, round(table_size, -2), use_bigcount,
                  version, ht_type, occupied)


def __version_cpp__():
    """Version stamp compiled into the native (C++) runtime — the
    analogue of reference khmer.__version_cpp__ (_cpy_khmer.cc /
    tests/test_version.py).  Falls back to the package version when
    the native loader is unavailable (pure-python mode)."""
    from khmer_tpu.native import native_version

    v = native_version()
    return v if v is not None else __version__


def calc_expected_collisions(graph, force=False, max_false_pos=.2):
    """FP-rate estimate + guard (khmer/__init__.py:182-216)."""
    sizes = graph.hashsizes()
    n_ht = float(len(sizes))
    occupancy = float(graph.n_occupied())
    min_size = min(sizes)

    fp_one = occupancy / min_size
    fp_all = fp_one ** n_ht

    if fp_all > max_false_pos:
        print("**", file=sys.stderr)
        print("** ERROR: the graph structure is too small for ",
              file=sys.stderr)
        print("** this data set.  Increase data structure size",
              file=sys.stderr)
        print("** with --max_memory_usage/-M.", file=sys.stderr)
        print("**", file=sys.stderr)
        print("** Do not use these results!!", file=sys.stderr)
        print("**", file=sys.stderr)
        print("** (estimated false positive rate of %.3f;" % fp_all,
              file=sys.stderr, end=' ')
        print("max recommended %.3f)" % max_false_pos, file=sys.stderr)
        print("**", file=sys.stderr)

        if not force:
            sys.exit(1)

    return fp_all
