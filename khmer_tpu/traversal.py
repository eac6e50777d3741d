"""de Bruijn graph traversal: TPU-batched frontier BFS.

Parity targets: reference src/oxli/traversal.cc (NodeGatherer neighbor
"bit-foo", Traverser API), src/oxli/hashgraph.cc:756-(„calc_connected_
graph_size"), :1151 (traverse_from_kmer), :1085 (trim_on_stoptags),
:1471 (extract_unique_paths); find_high_degree_nodes/traverse_linear_
path semantics reconstructed from include/oxli/hashgraph.hh:398-404 and
khmer/_oxli/graphs.pyx:598-623 (their 3.0 bodies were lost in the
reference graft).

TPU re-design: a frontier of (kmer_f, kmer_r) pairs is expanded 8-ways
with vectorized shift arithmetic in numpy, and membership of the whole
candidate batch is resolved with ONE device query per BFS level
(padded to width buckets to bound recompilation), replacing the
reference's per-node pointer chase.
"""

import numpy as np

import jax.numpy as jnp

_MASK64 = (1 << 64) - 1


def _consts(k):
    bitmask = (1 << (2 * k)) - 1
    rc_shift = 2 * k - 2
    return bitmask, rc_shift


def fr_from_hash(h, k):
    """(kmer_f, kmer_r) of a canonical hash, following the reference's
    decode-then-rehash (hashgraph.cc:1155-1158): the canonical value is
    decoded as the forward strand."""
    f = int(h)
    r = 0
    x = f
    for _ in range(k):
        r = ((r << 2) | ((x & 3) ^ 1)) & _MASK64
        x >>= 2
    return f, r


# neighbor arithmetic (reference traversal.cc:88-113); codes are khmer
# 2-bit (A=0 T=1 C=2 G=3), complement = code ^ 1
def right_neighbors_fr(f, r, k):
    """[N] -> ([N,4] f, [N,4] r) appending each base on the right."""
    bitmask, rc_shift = _consts(k)
    codes = np.arange(4, dtype=np.uint64)
    nf = ((f[:, None] << np.uint64(2)) & np.uint64(bitmask)) | codes[None, :]
    nr = (r[:, None] >> np.uint64(2)) | (
        (codes[None, :] ^ np.uint64(1)) << np.uint64(rc_shift))
    return nf, nr


def left_neighbors_fr(f, r, k):
    """[N] -> ([N,4] f, [N,4] r) prepending each base on the left."""
    bitmask, rc_shift = _consts(k)
    codes = np.arange(4, dtype=np.uint64)
    nf = (f[:, None] >> np.uint64(2)) | (codes[None, :] << np.uint64(rc_shift))
    nr = ((r[:, None] << np.uint64(2)) & np.uint64(bitmask)) | (
        codes[None, :] ^ np.uint64(1))
    return nf, nr


_QUERY_BUCKETS = (64, 256, 1024, 4096, 16384, 65536, 1 << 18, 1 << 20)


def counts_of(graph, hashes):
    """Batched membership/count query padded to width buckets."""
    hashes = np.asarray(hashes, np.uint64).reshape(-1)
    n = hashes.shape[0]
    if n == 0:
        return np.zeros(0, np.uint16)
    width = next((b for b in _QUERY_BUCKETS if n <= b), n)
    padded = np.zeros(width, np.uint64)
    padded[:n] = hashes
    return np.asarray(graph.storage.get_batch_device(
        jnp.asarray(padded)))[:n]


class _Frontier:
    """Deduplicated BFS frontier of (f, r) pairs keyed by canonical."""

    __slots__ = ("f", "r", "canon")

    def __init__(self, f, r):
        self.f = np.asarray(f, np.uint64)
        self.r = np.asarray(r, np.uint64)
        self.canon = np.minimum(self.f, self.r)


def _expand(graph, f, r, k, direction="both"):
    """All existing neighbors of frontier nodes.

    Returns (nf, nr, ncanon, src_idx) flattened over existing
    candidates; src_idx maps each neighbor to its frontier row."""
    parts = []
    if direction in ("both", "right"):
        parts.append(right_neighbors_fr(f, r, k))
    if direction in ("both", "left"):
        parts.append(left_neighbors_fr(f, r, k))
    nf = np.concatenate([p[0] for p in parts], axis=1)
    nr = np.concatenate([p[1] for p in parts], axis=1)
    canon = np.minimum(nf, nr)
    counts = counts_of(graph, canon).reshape(canon.shape)
    exists = counts > 0
    src = np.broadcast_to(
        np.arange(f.shape[0])[:, None], canon.shape)
    return (nf[exists], nr[exists], canon[exists], src[exists])


def _seed(graph, kmer):
    k = graph.ksize()
    if hasattr(kmer, "kmer_f"):  # a Kmer object carries its own f/r
        return int(kmer.kmer_f), int(kmer.kmer_r)
    if isinstance(kmer, str):
        from khmer_tpu.ops.hashing import hash_2bit_scalar

        _, f, r = hash_2bit_scalar(kmer, k)
        return f, r
    return fr_from_hash(int(kmer), k)


# ---------------------------------------------------------------------------
# Traverser (parity: khmer/_oxli/traversal.pyx)
# ---------------------------------------------------------------------------


class Traverser:
    def __init__(self, graph):
        self.graph = graph

    def ksize(self):
        return self.graph.ksize()

    def _neighbor_strings(self, node, direction):
        k = self.graph.ksize()
        f, r = _seed(self.graph, node)
        fa = np.array([f], np.uint64)
        ra = np.array([r], np.uint64)
        nf, nr, canon, _ = _expand(self.graph, fa, ra, k,
                                   direction=direction)
        from khmer_tpu.ops.hashing import reverse_hash

        return [reverse_hash(int(c), k) for c in canon]

    def neighbors(self, node):
        return self._neighbor_strings(node, "both")

    def right_neighbors(self, node):
        return self._neighbor_strings(node, "right")

    def left_neighbors(self, node):
        return self._neighbor_strings(node, "left")

    def degree(self, node):
        return kmer_degree(self.graph, node)

    def right_degree(self, node):
        return len(self._neighbor_strings(node, "right"))

    def left_degree(self, node):
        return len(self._neighbor_strings(node, "left"))


# ---------------------------------------------------------------------------
# Hashgraph graph queries
# ---------------------------------------------------------------------------


def kmer_degree(graph, kmer):
    """Number of existing neighbors (reference hashgraph.cc:840-897)."""
    k = graph.ksize()
    f, r = _seed(graph, kmer)
    nf, nr, canon, _ = _expand(graph, np.array([f], np.uint64),
                               np.array([r], np.uint64), k)
    return int(canon.shape[0])


def neighbors(graph, kmer):
    """Existing neighbors as Kmer objects, one per found direction
    (duplicates preserved — graphs.pyx:553-557 returns the Traverser's
    per-direction finds)."""
    from khmer_tpu.kmer import Kmer

    if isinstance(kmer, bytes):
        kmer = kmer.decode("ascii")
    if not isinstance(kmer, (str, int, np.integer)):
        raise TypeError("kmer must be a string or hash")
    k = graph.ksize()
    if isinstance(kmer, str) and len(kmer) != k:
        raise ValueError("k-mer length must equal the graph k size")
    f, r = _seed(graph, kmer)
    _, _, canon, _ = _expand(graph, np.array([f], np.uint64),
                             np.array([r], np.uint64), k)
    return [Kmer.create(int(c), k) for c in canon]


def traverse_from_kmer(graph, kmer, radius, max_count=None):
    """Level-BFS within `radius`; returns the set of canonical hashes
    reached (reference traverse_from_kmer, hashgraph.cc:1151-1244:
    stop at stop_tags, cap total at MAX_KEEPER_SIZE=1e6)."""
    if max_count is None:
        max_count = int(1e6)  # MAX_KEEPER_SIZE, hashgraph.hh:69
    k = graph.ksize()
    f, r = _seed(graph, kmer)
    keeper = set()
    stop = graph.stop_tags
    cf = np.array([f], np.uint64)
    cr = np.array([r], np.uint64)
    breadth = 0
    while cf.size and breadth <= radius:
        canon = np.minimum(cf, cr)
        fresh = []
        for i in range(canon.shape[0]):
            c = int(canon[i])
            if c in keeper or c in stop:
                continue
            keeper.add(c)
            fresh.append(i)
            if len(keeper) > max_count:
                return keeper
        if not fresh or breadth == radius:
            break
        idx = np.asarray(fresh)
        nf, nr, ncanon, _ = _expand(graph, cf[idx], cr[idx], k)
        if ncanon.size:
            _, ui = np.unique(ncanon, return_index=True)
            mask = np.ones(ncanon.shape[0], bool)
            seen_mask = np.fromiter(
                (int(c) in keeper for c in ncanon), bool, ncanon.shape[0])
            mask &= ~seen_mask
            keepu = np.zeros(ncanon.shape[0], bool)
            keepu[ui] = True
            mask &= keepu
            cf, cr = nf[mask], nr[mask]
        else:
            cf = np.zeros(0, np.uint64)
            cr = cf
        breadth += 1
    return keeper


def count_kmers_within_radius(graph, kmer, radius, max_count=0):
    seen = traverse_from_kmer(graph, kmer, radius,
                              max_count=max_count or None)
    return len(seen)


def calc_connected_graph_size(graph, kmer, max_size=0,
                              break_on_circumference=False):
    """Size of the connected component containing kmer, truncated at
    max_size (reference calc_connected_graph_size, hashgraph.cc:756)."""
    k = graph.ksize()
    f, r = _seed(graph, kmer)
    canon0 = min(f, r)
    if counts_of(graph, [canon0])[0] == 0:
        return 0
    keeper = set()
    stop = graph.stop_tags
    count = 0
    cf = np.array([f], np.uint64)
    cr = np.array([r], np.uint64)
    while cf.size:
        canon = np.minimum(cf, cr)
        fresh = []
        for i in range(canon.shape[0]):
            c = int(canon[i])
            if c in keeper or c in stop:
                continue
            keeper.add(c)
            if break_on_circumference:
                if kmer_degree_fr(graph, int(cf[i]), int(cr[i]), k) > 4:
                    continue
            fresh.append(i)
            count += 1
            if max_size and count >= max_size:
                return count
        if not fresh:
            break
        idx = np.asarray(fresh)
        nf, nr, ncanon, _ = _expand(graph, cf[idx], cr[idx], k)
        if not ncanon.size:
            break
        _, ui = np.unique(ncanon, return_index=True)
        mask = np.zeros(ncanon.shape[0], bool)
        mask[ui] = True
        seen_mask = np.fromiter(
            (int(c) in keeper for c in ncanon), bool, ncanon.shape[0])
        mask &= ~seen_mask
        cf, cr = nf[mask], nr[mask]
    return count


def kmer_degree_fr(graph, f, r, k):
    _, _, canon, _ = _expand(graph, np.array([f], np.uint64),
                             np.array([r], np.uint64), k)
    return int(canon.shape[0])


def find_high_degree_nodes(graph, sequence):
    """Canonical hashes of sequence k-mers with degree > 2 (semantics
    per hashgraph.hh:398 and its pyx caller)."""
    from khmer_tpu.hashset import HashSet

    k = graph.ksize()
    hdns = HashSet(k)
    hashes = graph._hash_array(sequence)
    if hashes.size == 0:
        return hdns
    # degree of every kmer of the sequence, batched in one query
    from khmer_tpu.ops import encode as enc

    codes = enc.encode_sequence(sequence)
    n = hashes.size
    f = np.zeros(n, np.uint64)
    r = np.zeros(n, np.uint64)
    for i in range(n):
        f[i], r[i] = fr_from_hash_codes(codes[i: i + k])
    nfr, nrr = right_neighbors_fr(f, r, k)
    nfl, nrl = left_neighbors_fr(f, r, k)
    cand = np.concatenate(
        [np.minimum(nfr, nrr), np.minimum(nfl, nrl)], axis=1)
    counts = counts_of(graph, cand).reshape(cand.shape)
    degs = (counts > 0).sum(axis=1)
    for i in range(n):
        if degs[i] > 2:
            hdns.add(int(hashes[i]))
    return hdns


def fr_from_hash_codes(codes):
    """(f, r) from a k-length slice of 2-bit codes."""
    f = 0
    r = 0
    k = len(codes)
    for i in range(k):
        f = (f << 2) | int(codes[i])
        r = (r << 2) | (int(codes[k - 1 - i]) ^ 1)
    return np.uint64(f & _MASK64), np.uint64(r & _MASK64)


def traverse_linear_path(graph, kmer, adjacencies, visited, stop_filter,
                         hdns=None):
    """Walk the linear path containing kmer, stopping at high-degree
    nodes (collected into `adjacencies` AND marked in the
    `stop_filter` Bloom filter) and at k-mers already in the filter.
    Visited k-mers are per-call output only — they are NOT added to
    the filter, so the same path can be traversed again from its other
    end (reference test_nodegraph.py::test_traverse_linear_path_2
    pins this).  Returns the path size.  (Reconstructed from
    hashgraph.hh:401-404 / graphs.pyx:608-623.)"""
    k = graph.ksize()
    if hdns is None:
        hdns = getattr(adjacencies, "hashes", set())
    else:
        hdns = set(int(h) for h in hdns)
    f, r = _seed(graph, kmer)
    size = 0
    queue = [(f, r)]
    local_seen = set()
    while queue:
        f, r = queue.pop()
        c = int(min(f, r))
        if c in hdns:
            adjacencies.add(c)
            if stop_filter is not None:
                stop_filter.add(c)
            continue
        if c in local_seen or c in visited:
            continue
        if stop_filter is not None and stop_filter.get(c):
            continue
        local_seen.add(c)
        visited.add(c)
        size += 1
        nf, nr, ncanon, _ = _expand(
            graph, np.array([f], np.uint64), np.array([r], np.uint64), k)
        for i in range(ncanon.shape[0]):
            queue.append((int(nf[i]), int(nr[i])))
    return size


def trim_on_stoptags(graph, sequence):
    """Trim the sequence at the first stop-tagged k-mer
    (reference hashgraph.cc... trim_on_stoptags, 2.x hashtable.cc:1085)."""
    k = graph.ksize()
    if len(sequence) < k:
        return sequence[:0], 0
    hashes = graph._hash_array(sequence)
    stop = graph.stop_tags
    i = k - 2
    for j in range(hashes.shape[0]):
        if int(hashes[j]) in stop:
            return sequence[:i], i
        i += 1
    return sequence, len(sequence)


def extract_unique_paths(graph, seq, min_length, min_unique_f):
    """Extract maximal windows whose fraction of already-seen k-mers is
    <= 1 - min_unique_f (reference hashgraph.cc:1471-1565, ported
    branch-for-branch including the end-adjustment quirks)."""
    results = []
    if len(seq) < min_length:
        return results
    max_seen = 1.0 - min_unique_f
    k = graph.ksize()
    min_length = min_length - k + 1
    counts = counts_of(graph, graph._hash_array(seq))
    seen = counts > 0
    n_kmers = seen.shape[0]

    i = 0
    while i < n_kmers - min_length:
        seen_counter = int(seen[i: i + min_length].sum())
        if seen_counter / float(min_length) <= max_seen:
            start = i
            while (start + min_length) < n_kmers:
                if seen[start]:
                    seen_counter -= 1
                if seen[start + min_length]:
                    seen_counter += 1
                start += 1
                if seen_counter / float(min_length) > max_seen:
                    break
            if start + min_length == n_kmers:
                if seen_counter / float(min_length) > max_seen:
                    start -= 1
                start -= 1
            else:
                start -= 2
            results.append(seq[i: start + min_length + k])
            i = start + min_length + 1
        else:
            i += 1
    return results
