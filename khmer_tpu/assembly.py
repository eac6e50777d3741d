"""Assemblers: LinearAssembler, SimpleLabeledAssembler,
JunctionCountAssembler.

Parity: reference src/oxli/assembler.cc + include/oxli/assembler.hh,
AssemblerTraverser::next_symbol (src/oxli/traversal.cc), Cython facade
khmer/_oxli/assembly.pyx.

The unitig walk is sequential by nature; each step's 4-way neighbor
probe runs as one batched device query, and callers assembling many
seeds batch across seeds.
"""

import numpy as np

from khmer_tpu.ops.hashing import reverse_hash
from khmer_tpu.traversal import (
    _seed,
    counts_of,
    left_neighbors_fr,
    right_neighbors_fr,
)

_BASES = "ACGT"
# khmer twobit codes are A=0 T=1 C=2 G=3; neighbor arrays are indexed
# by code, but DNA_SIMPLE iteration order (ACGT) decides ties — with
# the >1-found early stop the result is order-independent.
_CODE_OF = {"A": 0, "C": 2, "G": 3, "T": 1}
_BASE_OF_CODE = "ATCG"


class _Cursor:
    """AssemblerTraverser state: (f, r) cursor + shared visited set."""

    __slots__ = ("f", "r", "visited", "filters")

    def __init__(self, f, r, visited, filters=()):
        self.f = f
        self.r = r
        self.visited = visited
        self.filters = list(filters)

    def clone(self):
        c = _Cursor(self.f, self.r, self.visited, self.filters)
        return c


class LinearAssembler:
    """Maximal linear path through the seed (assembler.cc:52-168)."""

    def __init__(self, graph, stop_filter=None):
        self.graph = graph
        self.stop_filter = stop_filter

    def set_stop_filter(self, stop_filter=None):
        self.stop_filter = stop_filter

    # -- core -------------------------------------------------------------

    def _neighbors(self, cursor, direction):
        """Existing, unvisited, unfiltered neighbors of the cursor.

        Returns list of (f, r, canon, base_char)."""
        k = self.graph.ksize()
        f = np.array([cursor.f], np.uint64)
        r = np.array([cursor.r], np.uint64)
        if direction == "right":
            nf, nr = right_neighbors_fr(f, r, k)
        else:
            nf, nr = left_neighbors_fr(f, r, k)
        canon = np.minimum(nf, nr)[0]
        counts = counts_of(self.graph, canon)
        if self.stop_filter is not None:
            stop_counts = counts_of(self.stop_filter, canon)
        out = []
        for base in _BASES:  # DNA_SIMPLE iteration order
            code = _CODE_OF[base]
            if counts[code] == 0:
                continue
            c = int(canon[code])
            if c in cursor.visited:
                continue
            if self.stop_filter is not None and stop_counts[code]:
                continue
            if any(flt(c) for flt in cursor.filters):
                continue
            out.append((int(nf[0, code]), int(nr[0, code]), c, base))
        return out

    def _next_symbol(self, cursor, direction):
        """One step of AssemblerTraverser::next_symbol
        (traversal.cc): stop on 0 or >1 found neighbors."""
        cursor.visited.add(int(min(cursor.f, cursor.r)))
        found = self._neighbors(cursor, direction)
        if len(found) != 1:
            return None
        f, r, _, base = found[0]
        cursor.f, cursor.r = f, r
        return base

    def _assemble_directed(self, cursor, direction):
        k = self.graph.ksize()
        contig = reverse_hash(cursor.f, k)
        while True:
            base = self._next_symbol(cursor, direction)
            if base is None:
                break
            if direction == "right":
                contig = contig + base
            else:
                contig = base + contig
        return contig

    # -- public -----------------------------------------------------------

    def assemble(self, seed):
        f, r = _seed(self.graph, seed)
        if counts_of(self.graph, [min(f, r)])[0] == 0:
            return ""
        visited = set()
        rc = _Cursor(f, r, visited)
        lc = _Cursor(f, r, visited)
        right_contig = self._assemble_directed(rc, "right")
        left_contig = self._assemble_directed(lc, "left")
        return left_contig + right_contig[self.graph.ksize():]

    def assemble_right(self, seed):
        f, r = _seed(self.graph, seed)
        return self._assemble_directed(_Cursor(f, r, set()), "right")

    def assemble_left(self, seed):
        f, r = _seed(self.graph, seed)
        return self._assemble_directed(_Cursor(f, r, set()), "left")


class SimpleLabeledAssembler:
    """Linear assembly that hops high-degree nodes when a label spans
    them (assembler.cc:185-344)."""

    def __init__(self, labels, stop_filter=None):
        self.labels = labels
        self.graph = labels.graph
        self.stop_filter = stop_filter
        self.linear_asm = LinearAssembler(self.graph, stop_filter)

    def set_stop_filter(self, stop_filter=None):
        self.stop_filter = stop_filter
        self.linear_asm.stop_filter = stop_filter

    def _label_intersect_filter(self, src_labels, min_cov=5):
        """(kmer_filters.cc get_simple_label_intersect_filter): filter
        OUT label-disjoint branches, and putative tips (dst carries
        exactly the one shared label) — but the tip heuristic only
        fires at label coverage >= min_cov (default 5,
        kmer_filters.hh:61), so low-coverage bubbles keep both
        branches."""
        lh = self.labels
        src = set(src_labels)

        def flt(canon):
            dst = set(lh.get_tag_labels(canon))
            inter = src & dst
            if len(inter) == 1 and len(dst) == 1 and len(src) >= min_cov:
                return True  # putative tip
            if inter:
                return False
            return True

        return flt

    def _assemble_directed(self, start_cursor, direction):
        la = self.linear_asm
        paths = []
        root_contig = la._assemble_directed(start_cursor, direction)
        stack = [(root_contig, start_cursor)]
        k = self.graph.ksize()
        while stack:
            segment, cursor = stack.pop()
            if _degree(self.graph, cursor) > 1:
                labels = self.labels.get_tag_labels(
                    int(min(cursor.f, cursor.r)))
                if not labels:
                    paths.append(segment)
                    continue
                cursor.filters.append(self._label_intersect_filter(labels))
                branch_starts = la._neighbors(cursor, direction)
                cursor.filters.pop()
                if not branch_starts:
                    paths.append(segment)
                    continue
                for f, r, _, _ in branch_starts:
                    bc = _Cursor(f, r, cursor.visited,
                                 cursor.filters)
                    branch = la._assemble_directed(bc, direction)
                    if direction == "right":
                        new_segment = segment + branch[k - 1:]
                    else:
                        new_segment = branch[: len(branch) - (k - 1)] + \
                            segment
                    stack.append((new_segment, bc))
            else:
                paths.append(segment)
        return paths

    def assemble(self, seed):
        f, r = _seed(self.graph, seed)
        visited = set()
        right_paths = self._assemble_directed(
            _Cursor(f, r, visited), "right")
        left_paths = self._assemble_directed(
            _Cursor(f, r, visited), "left")
        k = self.graph.ksize()
        paths = []
        for left in left_paths:
            for right in right_paths:
                paths.append(left + right[k:])
        return paths


class JunctionCountAssembler:
    """Linear assembly that crosses junctions seen often enough in the
    reads (assembler.cc:346-533)."""

    def __init__(self, graph, stop_filter=None):
        from khmer_tpu.graph import Countgraph

        self.graph = graph
        self.stop_filter = stop_filter
        self.linear_asm = LinearAssembler(graph, stop_filter)
        self.junctions = Countgraph(
            graph.ksize(), primes=graph.hashsizes())

    def set_stop_filter(self, stop_filter=None):
        self.stop_filter = stop_filter
        self.linear_asm.stop_filter = stop_filter

    def count_junction(self, canon_a, canon_b):
        self.junctions.storage.add(int(canon_a) ^ int(canon_b))

    def get_junction_count(self, canon_a, canon_b):
        return self.junctions.storage.get(int(canon_a) ^ int(canon_b))

    def consume(self, sequence):
        """Count junctions around high-degree nodes of the read
        (assembler.cc:359-396)."""
        from khmer_tpu.traversal import counts_of as _counts
        from khmer_tpu.traversal import fr_from_hash_codes
        from khmer_tpu.ops import encode as enc

        self.graph.consume(sequence)
        k = self.graph.ksize()
        hashes = self.graph._hash_array(sequence)
        n = hashes.shape[0]
        if n < 2:
            return 0
        codes = enc.encode_sequence(sequence)
        degs = []
        f = np.zeros(n, np.uint64)
        r = np.zeros(n, np.uint64)
        for i in range(n):
            f[i], r[i] = fr_from_hash_codes(codes[i: i + k])
        nfr, nrr = right_neighbors_fr(f, r, k)
        nfl, nrl = left_neighbors_fr(f, r, k)
        cand = np.concatenate(
            [np.minimum(nfr, nrr), np.minimum(nfl, nrl)], axis=1)
        counts = _counts(self.graph, cand).reshape(cand.shape)
        degs = (counts > 0).sum(axis=1)
        n_junctions = 0
        for i in range(n - 1):
            if degs[i] > 2 or degs[i + 1] > 2:
                self.count_junction(int(hashes[i]), int(hashes[i + 1]))
                n_junctions += 1
        return n_junctions

    def _junction_filter(self, prev_canon):
        def flt(canon):
            return self.get_junction_count(prev_canon, canon) < 2

        return flt

    def _assemble_directed(self, start_cursor, direction):
        la = self.linear_asm
        paths = []
        root_contig = la._assemble_directed(start_cursor, direction)
        stack = [(root_contig, start_cursor)]
        k = self.graph.ksize()
        while stack:
            segment, cursor = stack.pop()
            if _degree(self.graph, cursor) > 1:
                cur_canon = int(min(cursor.f, cursor.r))
                cursor.filters.append(self._junction_filter(cur_canon))
                branch_starts = la._neighbors(cursor, direction)
                cursor.filters.pop()
                if not branch_starts:
                    paths.append(segment)
                    continue
                for f, r, _, _ in branch_starts:
                    bc = _Cursor(f, r, cursor.visited, cursor.filters)
                    branch = la._assemble_directed(bc, direction)
                    if direction == "right":
                        new_segment = segment + branch[k - 1:]
                    else:
                        new_segment = branch[: len(branch) - (k - 1)] + \
                            segment
                    stack.append((new_segment, bc))
            else:
                paths.append(segment)
        return paths

    def assemble(self, seed):
        f, r = _seed(self.graph, seed)
        visited = set()
        right_paths = self._assemble_directed(
            _Cursor(f, r, visited), "right")
        left_paths = self._assemble_directed(
            _Cursor(f, r, visited), "left")
        k = self.graph.ksize()
        paths = []
        for left in left_paths:
            for right in right_paths:
                paths.append(left + right[k:])
        return paths


def _degree(graph, cursor):
    from khmer_tpu.traversal import kmer_degree_fr

    return kmer_degree_fr(graph, int(cursor.f), int(cursor.r),
                          graph.ksize())
