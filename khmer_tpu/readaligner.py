"""ReadAligner: graph-guided read error correction via a 6-state
pair-HMM A* search.

Parity: reference src/oxli/read_aligner.cc + include/oxli/read_aligner.hh
(states MATCH/INSERT_READ/INSERT_GRAPH x trusted/untrusted, the
published transition log-probabilities at read_aligner.hh:105-117, the
best-first Subalign with its closed-map quirks) and the Cython facade
khmer/_oxli/readaligner.pyx.

The search itself is inherently sequential pointer-chasing; count
lookups run against a host snapshot of the device table
(Storage.host_counts) so each expansion costs no device round trip.
"""

import heapq
import math

import numpy as np

from khmer_tpu.ops.hashing import hash_2bit_scalar

# states (read_aligner.hh:60-62)
MATCH, INSERT_READ, INSERT_GRAPH, \
    MATCH_UNTRUSTED, INSERT_READ_UNTRUSTED, INSERT_GRAPH_UNTRUSTED = range(6)

# transitions (read_aligner.hh:65-71)
(MM, MIr, MIg, MMu, MIru, MIgu,
 IrM, IrIr, IrMu, IrIru,
 IgM, IgIg, IgMu, IgIgu,
 MuM, MuIr, MuIg, MuMu, MuIru, MuIgu,
 IruM, IruIr, IruMu, IruIru,
 IguM, IguIg, IguMu, IguIgu,
 DISALLOWED) = range(29)

_log2 = math.log2

# trained transition log-probabilities (read_aligner.hh:105-117)
TRANS_DEFAULT = [
    _log2(0.9848843), _log2(0.0000735), _log2(0.0000334),
    _log2(0.0150068), _log2(0.0000017), _log2(0.0000003),   # M_t
    _log2(0.5196194), _log2(0.4647955), _log2(0.0059060),
    _log2(0.0096792),                                       # Ir_t
    _log2(0.7611255), _log2(0.2294619), _log2(0.0072673),
    _log2(0.0021453),                                       # Ig_t
    _log2(0.0799009), _log2(0.0000262), _log2(0.0001836),
    _log2(0.9161349), _log2(0.0033370), _log2(0.0004173),   # M_u
    _log2(0.1434529), _log2(0.0036995), _log2(0.2642928),
    _log2(0.5885548),                                       # Ir_u
    _log2(0.1384551), _log2(0.0431328), _log2(0.6362921),
    _log2(0.1821200),                                       # Ig_u
]

# emission/frequency scores (read_aligner.hh:119-122)
FREQ_DEFAULT = [_log2(0.955), _log2(0.04), _log2(0.004), _log2(0.001)]

_BACKGROUND_PROB = 0.0

_NUCL = "ACGT"
_NUCL_CODE = {"A": 0, "C": 1, "G": 2, "T": 3, "U": 3}

# transition lookup table indexed (from_state, to_state)
_TRANS_TABLE = [[DISALLOWED] * 6 for _ in range(6)]
for _row, _pairs in {
    MATCH: [(MATCH, MM), (INSERT_GRAPH, MIg), (INSERT_READ, MIr),
            (MATCH_UNTRUSTED, MMu), (INSERT_GRAPH_UNTRUSTED, MIgu),
            (INSERT_READ_UNTRUSTED, MIru)],
    INSERT_GRAPH: [(MATCH, IgM), (INSERT_GRAPH, IgIg),
                   (MATCH_UNTRUSTED, IgMu),
                   (INSERT_GRAPH_UNTRUSTED, IgIgu)],
    INSERT_READ: [(MATCH, IrM), (INSERT_READ, IrIr),
                  (MATCH_UNTRUSTED, IrMu),
                  (INSERT_READ_UNTRUSTED, IrIru)],
    MATCH_UNTRUSTED: [(MATCH, MuM), (INSERT_GRAPH, MuIg),
                      (INSERT_READ, MuIr), (MATCH_UNTRUSTED, MuMu),
                      (INSERT_GRAPH_UNTRUSTED, MuIgu),
                      (INSERT_READ_UNTRUSTED, MuIru)],
    INSERT_GRAPH_UNTRUSTED: [(MATCH, IguM), (INSERT_GRAPH, IguIg),
                             (MATCH_UNTRUSTED, IguMu),
                             (INSERT_GRAPH_UNTRUSTED, IguIgu)],
    INSERT_READ_UNTRUSTED: [(MATCH, IruM), (INSERT_READ, IruIr),
                            (MATCH_UNTRUSTED, IruMu),
                            (INSERT_READ_UNTRUSTED, IruIru)],
}.items():
    for _to, _tr in _pairs:
        _TRANS_TABLE[_row][_to] = _tr


def _get_null(length):
    """Null-model score (read_aligner.cc:103-106)."""
    return _log2(0.25) * length + _log2(1.0 / (length + 1))


class _Node:
    __slots__ = ("prev", "base", "seq_idx", "state", "trans", "fwd", "rc",
                 "score", "f_score", "h_score", "trusted", "cov",
                 "num_indels", "length")

    def __init__(self, prev, base, seq_idx, state, trans, fwd, rc, length):
        self.prev = prev
        self.base = base
        self.seq_idx = seq_idx
        self.state = state
        self.trans = trans
        self.fwd = fwd
        self.rc = rc
        self.score = 0.0
        self.f_score = 0.0
        self.h_score = 0.0
        self.trusted = False
        self.cov = 0
        self.num_indels = 0
        self.length = length


class Alignment:
    """Result record (read_aligner.hh:210-217)."""

    def __init__(self, score, graph_alignment, read_alignment, trusted="",
                 covs=None, truncated=True):
        self.score = score
        self.graph_alignment = graph_alignment
        self.read_alignment = read_alignment
        self.trusted = trusted
        self.covs = covs or []
        self.truncated = truncated


def _empty_alignment():
    return Alignment(-math.inf, "", "", truncated=True)


class ReadAligner:
    """A*-guided pair-HMM alignment of a read against a Countgraph."""

    def __init__(self, count_graph, trusted_cov_cutoff=2, bits_theta=1.0,
                 scoring_matrix=None, transitions=None,
                 transition_probabilities=None, filename=None):
        self.graph = count_graph
        self.k = count_graph.ksize()
        self.bitmask = (1 << (2 * self.k)) - 1
        self.rc_left_shift = 2 * self.k - 2
        self.trusted_cutoff = trusted_cov_cutoff
        self.bits_theta = bits_theta
        if filename is not None:
            # params-file constructor (readaligner.pyx / _cpy_khmer.cc
            # ReadAligner init with a JSON file of scoring_matrix +
            # per-state transition_probabilities)
            import json

            with open(filename) as fp:
                params = json.load(fp)
            scoring_matrix = params["scoring_matrix"]
            transition_probabilities = params["transition_probabilities"]
        if scoring_matrix is None:
            scoring_matrix = FREQ_DEFAULT
        (self.trusted_match, self.trusted_mismatch,
         self.untrusted_match, self.untrusted_mismatch) = scoring_matrix
        if transition_probabilities is not None:
            # nested per-from-state shape (M_t, Ir_t, Ig_t, M_u, Ir_u,
            # Ig_u) — the reference's public API shape
            self.tsc = [float(x) for grp in transition_probabilities
                        for x in grp]
        elif transitions is not None:
            self.tsc = list(transitions)
        else:
            self.tsc = list(TRANS_DEFAULT)

    # -- count access ------------------------------------------------------

    def _count(self, h):
        return int(self.graph.storage.host_counts([h])[0])

    def _counts4(self, hashes):
        return self.graph.storage.host_counts(hashes)

    # -- neighbor arithmetic (2.x next_f/next_r/prev_f/prev_r) -------------

    def _next(self, fwd, rc, code):
        nf = ((fwd << 2) & self.bitmask) | code
        nr = (rc >> 2) | ((code ^ 1) << self.rc_left_shift)
        return nf, nr

    def _prev(self, fwd, rc, code):
        pf = (fwd >> 2) | (code << self.rc_left_shift)
        pr = ((rc << 2) & self.bitmask) | (code ^ 1)
        return pf, pr

    # -- A* search ---------------------------------------------------------

    def _enumerate(self, open_heap, counter, curr, forward, seq):
        if forward:
            next_seq_idx = curr.seq_idx + 1
            if next_seq_idx >= len(seq):
                return
            remaining = len(seq) - next_seq_idx
        else:
            next_seq_idx = curr.seq_idx - 1
            remaining = next_seq_idx

        # 4 neighbor k-mers, coverage in one host-snapshot lookup
        cands = []
        hashes = []
        for i, nucl in enumerate(_NUCL):
            code = {"A": 0, "C": 2, "G": 3, "T": 1}[nucl]  # khmer twobit
            if forward:
                nf, nr = self._next(curr.fwd, curr.rc, code)
            else:
                nf, nr = self._prev(curr.fwd, curr.rc, code)
            cands.append((i, nucl, nf, nr))
            hashes.append(min(nf, nr))
        covs = self._counts4(hashes)

        for (i, nucl, nf, nr), cov in zip(cands, covs):
            cov = int(cov)
            if cov == 0:
                continue
            if cov < self.trusted_cutoff:
                start_state, end_state = (MATCH_UNTRUSTED,
                                          INSERT_GRAPH_UNTRUSTED)
                match_sc = self.trusted_match
                mismatch_sc = self.trusted_mismatch
            else:
                start_state, end_state = MATCH, INSERT_GRAPH
                match_sc = self.trusted_match
                mismatch_sc = self.trusted_mismatch

            for next_state in range(start_state, end_state + 1):
                trans = _TRANS_TABLE[curr.state][next_state]
                if trans == DISALLOWED:
                    continue
                hcost = self.tsc[_TRANS_TABLE[next_state][MATCH]] + \
                    (self.tsc[MM] + self.trusted_match) * \
                    (0 if remaining == 0 else remaining - 1)
                if next_state in (MATCH, MATCH_UNTRUSTED):
                    sc = match_sc if nucl == seq[next_seq_idx] \
                        else mismatch_sc
                else:
                    sc = _BACKGROUND_PROB

                if next_state in (MATCH, MATCH_UNTRUSTED):
                    nxt = _Node(curr, i, next_seq_idx, next_state, trans,
                                nf, nr, curr.length + 1)
                    nxt.num_indels = curr.num_indels
                elif next_state in (INSERT_READ, INSERT_READ_UNTRUSTED):
                    nxt = _Node(curr, i, next_seq_idx, next_state, trans,
                                curr.fwd, curr.rc, curr.length + 1)
                    nxt.num_indels = curr.num_indels + 1
                else:  # INSERT_GRAPH(_UNTRUSTED)
                    nxt = _Node(curr, i, curr.seq_idx, next_state, trans,
                                nf, nr, curr.length)
                    nxt.num_indels = curr.num_indels + 1

                nxt.score = curr.score + sc + self.tsc[trans]
                nxt.trusted = cov >= self.trusted_cutoff
                nxt.cov = cov
                nxt.h_score = hcost
                nxt.f_score = nxt.score + nxt.h_score

                if nxt.num_indels < 3 and \
                        nxt.score - _get_null(nxt.length) > \
                        nxt.length * self.bits_theta:
                    counter[0] += 1
                    heapq.heappush(open_heap, (-nxt.f_score, counter[0],
                                               nxt))

    def _subalign(self, start, seq_len, forward, seq):
        native = self._native_subalign(start, seq_len, forward, seq)
        if native is not None:
            return native
        return self._subalign_py(start, seq_len, forward, seq)

    def _native_subalign(self, start, seq_len, forward, seq):
        """Run the Subalign through the C++ core (native/read_aligner
        .cc) against a host snapshot of the sketch; None when the
        native runtime is unavailable."""
        import ctypes

        from khmer_tpu.native import get_lib

        lib = get_lib()
        if lib is None:
            return None
        if not hasattr(lib, "_ra_ready"):
            lib.ra_subalign.restype = ctypes.c_long
            lib._ra_ready = True
        st = self.graph.storage
        cached = getattr(self, "_native_ctx", None)
        if cached is None or cached[0] is not st.table:
            # refresh the host snapshot host_counts maintains and pin
            # the argument arrays for this table version
            st.host_counts(np.zeros(1, np.uint64))
            self._native_ctx = (
                st.table,
                np.ascontiguousarray(st._host_table, np.uint32),
                np.ascontiguousarray(st.spec.tablesizes, np.uint64),
                np.ascontiguousarray(st.spec.bin_offsets, np.int64),
                np.ascontiguousarray(self.tsc, np.float64))
            cached = self._native_ctx
        _, table, sizes, offs, tsc = cached
        cap = 4 * (seq_len + 16)
        o_state = np.empty(cap, np.int8)
        o_base = np.empty(cap, np.int8)
        o_idx = np.empty(cap, np.int32)
        o_trust = np.empty(cap, np.uint8)
        o_cov = np.empty(cap, np.uint32)
        score = ctypes.c_double()
        trunc = ctypes.c_int()
        end_idx = ctypes.c_int32()
        p = lambda a: a.ctypes.data_as(ctypes.c_void_p)  # noqa: E731
        n = lib.ra_subalign(
            p(table), p(sizes), p(offs), ctypes.c_int(len(sizes)),
            ctypes.c_uint32(int(st._read_spec().read_cap)), p(tsc),
            ctypes.c_double(self.trusted_match),
            ctypes.c_double(self.trusted_mismatch),
            ctypes.c_double(self.bits_theta),
            ctypes.c_uint32(self.trusted_cutoff),
            ctypes.c_int(self.k), seq.encode("ascii"),
            ctypes.c_int(seq_len), ctypes.c_int(start.base),
            ctypes.c_int(start.seq_idx), ctypes.c_double(start.score),
            ctypes.c_uint64(start.fwd), ctypes.c_uint64(start.rc),
            ctypes.c_int(1 if forward else 0), ctypes.c_long(cap),
            p(o_state), p(o_base), p(o_idx), p(o_trust), p(o_cov),
            ctypes.byref(score), ctypes.byref(trunc),
            ctypes.byref(end_idx))
        if n < 0:
            return None  # path overflow: fall back to python
        read_alignment = []
        graph_alignment = []
        trusted = []
        covs = []
        for i in range(n):
            state = int(o_state[i])
            if state in (MATCH, MATCH_UNTRUSTED):
                graph_base = _NUCL[o_base[i]]
                read_base = seq[o_idx[i]]
            elif state in (INSERT_READ, INSERT_READ_UNTRUSTED):
                graph_base = "-"
                read_base = seq[o_idx[i]].lower()
            else:
                graph_base = _NUCL[o_base[i]].lower()
                read_base = "-"
            if forward:
                graph_alignment.insert(0, graph_base)
                read_alignment.insert(0, read_base)
                trusted.insert(0, "T" if o_trust[i] else "F")
                covs.insert(0, int(o_cov[i]))
            else:
                graph_alignment.append(graph_base)
                read_alignment.append(read_base)
                trusted.append("T" if o_trust[i] else "F")
        graph_alignment = "".join(graph_alignment)
        read_alignment = "".join(read_alignment)
        truncated = bool(trunc.value)
        if truncated:
            if forward:
                graph_alignment = graph_alignment + \
                    seq[end_idx.value + 1:]
            else:
                graph_alignment = seq[: start.seq_idx] + graph_alignment
        return Alignment(score.value, graph_alignment, read_alignment,
                         "".join(trusted), covs, truncated)

    def _subalign_py(self, start, seq_len, forward, seq):
        open_heap = []
        counter = [0]
        heapq.heappush(open_heap, (-start.f_score, 0, start))
        # the reference's closed std::map orders nodes by f_score, so
        # nodes with equal f_score collapse to one entry — replicated
        # by keying on the f_score value (read_aligner.cc:361-392)
        closed = {}
        best = None
        while open_heap:
            _, _, curr = heapq.heappop(open_heap)
            if best is None or (best.score - _get_null(best.length) <
                                curr.score - _get_null(curr.length)):
                best = curr
            if curr.seq_idx == seq_len - 1 or curr.seq_idx == 0:
                best = curr
                break
            key = curr.f_score
            entry = closed.get(key)
            if entry is None:
                times_closed = 0
            else:
                closed_score, times = entry
                if closed_score > curr.score or closed_score == curr.score:
                    times_closed = times
                    del closed[key]
                else:
                    continue
            if times_closed > 200:
                continue
            closed[key] = (curr.score, times_closed + 1)
            self._enumerate(open_heap, counter, curr, forward, seq)
        return self._extract(best, forward, seq)

    def _extract(self, node, forward, read):
        if node is None:
            return Alignment(0.0, "", "", "", [], True)
        read_alignment = []
        graph_alignment = []
        trusted = []
        covs = []
        ret_score = node.score
        truncated = node.seq_idx != 0 and node.seq_idx != len(read) - 1
        farthest_seq_idx = node.seq_idx
        while node is not None and node.prev is not None:
            if node.state in (MATCH, MATCH_UNTRUSTED):
                graph_base = _NUCL[node.base]
                read_base = read[node.seq_idx]
            elif node.state in (INSERT_READ, INSERT_READ_UNTRUSTED):
                graph_base = "-"
                read_base = read[node.seq_idx].lower()
            else:
                graph_base = _NUCL[node.base].lower()
                read_base = "-"
            if forward:
                graph_alignment.insert(0, graph_base)
                read_alignment.insert(0, read_base)
                trusted.insert(0, "T" if node.trusted else "F")
                covs.insert(0, node.cov)
            else:
                graph_alignment.append(graph_base)
                read_alignment.append(read_base)
                trusted.append("T" if node.trusted else "F")
            node = node.prev
        graph_alignment = "".join(graph_alignment)
        read_alignment = "".join(read_alignment)
        if truncated:
            if forward:
                graph_alignment = graph_alignment + \
                    read[farthest_seq_idx + 1:]
            else:
                graph_alignment = read[: node.seq_idx] + graph_alignment
        return Alignment(ret_score, graph_alignment, read_alignment,
                         "".join(trusted), covs, truncated)

    # -- seeding -----------------------------------------------------------

    def _start_node(self, kmer, kmer_idx, k_cov):
        k = self.k
        _, fhash, rhash = hash_2bit_scalar(kmer, k)
        e = _NUCL_CODE.get(kmer[k - 1].upper(), 0)
        node = _Node(None, e, kmer_idx + k - 1, MATCH, MM, fhash, rhash, k)
        node.f_score = 0.0
        node.h_score = 0.0
        if k_cov >= self.trusted_cutoff:
            node.score = k * self.trusted_match + k * self.tsc[MM]
        else:
            node.score = k * self.untrusted_match + k * self.tsc[MM]
        return node

    def align_many(self, sequences):
        """Batched align(): ONE device call hashes every read; seed
        coverage uses the host count snapshot and the A* searches run
        per read in the native core — no per-read device traffic.
        Returns a list of align() result tuples."""
        rows = self.graph._hash_rows(sequences)
        return [self._align_hashed(seq, row)
                for seq, row in zip(sequences, rows)]

    def align(self, sequence):
        """Bidirectional alignment from the max-coverage seed k-mer
        (read_aligner.cc Align); returns (score, graph_aln, read_aln,
        truncated) like readaligner.pyx:84-96."""
        if len(sequence) - self.k + 1 <= 0:
            raise ValueError("sequence shorter than k")
        return self._align_hashed(sequence,
                                  self.graph._hash_array(sequence))

    def _align_hashed(self, sequence, hashes):
        k = self.k
        read = sequence
        if len(read) - k + 1 <= 0:
            raise ValueError("sequence shorter than k")
        covs = self.graph.storage.host_counts(hashes)
        best_idx = int(np.argmax(covs)) if covs.size else 0
        # reference keeps the FIRST maximal (strictly greater updates)
        best_idx = int(np.flatnonzero(covs == covs.max())[0])
        k_cov = int(covs[best_idx])
        if k_cov == 0:
            aln = _empty_alignment()
            return aln.score, aln.graph_alignment, aln.read_alignment, \
                aln.truncated
        kmer = read[best_idx: best_idx + k]

        start = self._start_node(kmer, best_idx, k_cov)
        forward = self._subalign(start, len(read), True, read)
        final_length = len(forward.read_alignment) + k

        start2 = self._start_node(kmer, best_idx, k_cov)
        start2.seq_idx = best_idx
        reverse = self._subalign(start2, len(read), False, read)
        final_length += len(reverse.read_alignment)

        score = reverse.score + forward.score - start.score
        read_alignment = reverse.read_alignment + kmer + \
            forward.read_alignment
        graph_alignment = reverse.graph_alignment + kmer + \
            forward.graph_alignment
        score = score - _get_null(final_length)
        truncated = forward.truncated or reverse.truncated
        return (score, graph_alignment.upper(), read_alignment.upper(),
                truncated)

    def align_forward(self, sequence):
        """Forward-only alignment seeded at position 0
        (read_aligner.cc AlignForward); returns (score, graph_aln,
        read_aln, truncated, covs)."""
        k = self.k
        read = sequence
        if len(read) < k:
            raise ValueError("sequence shorter than k")
        kmer = read[:k]
        k_cov = self._count(min(*hash_2bit_scalar(kmer, k)[1:]))
        if k_cov == 0:
            aln = _empty_alignment()
            return aln.score, aln.graph_alignment, aln.read_alignment, \
                aln.truncated, []
        start = self._start_node(kmer, 0, k_cov)
        forward = self._subalign(start, len(read), True, read)
        final_length = len(forward.read_alignment) + k
        score = forward.score - _get_null(final_length)
        read_alignment = kmer + forward.read_alignment
        graph_alignment = kmer + forward.graph_alignment
        covs = [k_cov] + list(forward.covs) + [0] * (k - 1)
        return (score, graph_alignment.upper(), read_alignment.upper(),
                forward.truncated, covs)

    # -- introspection (readaligner.pyx:139-180) ---------------------------

    @property
    def defaultScoringMatrix(self):
        return list(FREQ_DEFAULT)

    # per-from-state group sizes of the flat transition table
    # (M_t:6, Ir_t:4, Ig_t:4, M_u:6, Ir_u:4, Ig_u:4)
    _TRANS_GROUPS = (6, 4, 4, 6, 4, 4)

    @staticmethod
    def _nest_transitions(flat):
        out = []
        i = 0
        for n in ReadAligner._TRANS_GROUPS:
            out.append(tuple(flat[i:i + n]))
            i += n
        return tuple(out)

    @property
    def defaultTransitionProbabilities(self):
        return self._nest_transitions(TRANS_DEFAULT)

    @property
    def scoring_matrix(self):
        return [self.trusted_match, self.trusted_mismatch,
                self.untrusted_match, self.untrusted_mismatch]

    @property
    def transition_probabilities(self):
        return self._nest_transitions(self.tsc)
