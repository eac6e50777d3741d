"""HyperLogLog++ cardinality counter, TPU-native.

Parity: reference src/oxli/hllcounter.cc + include/oxli/hllcounter.hh.
The register update is embarrassingly TPU-friendly — one `scatter-max`
per batch of k-mer hashes (the reference's OpenMP task pool,
hllcounter.cc:336-409, becomes a single device op); merge is an
element-wise max (hllcounter.cc:412-420).

Bias-correction constants are the published HyperLogLog-in-Practice
appendix data (Heule, Nunkesser & Hall, dx.doi.org/10.1145/2452376.
2452456), stored in khmer_tpu/data/hllpp_constants.json.
"""

import json
import math
import os
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from khmer_tpu.io.fastx import FastxReader
from khmer_tpu.ops import encode as enc
from khmer_tpu.ops.hashing import kmer_hashes_murmur_bytes

U8 = jnp.uint8
U64 = jnp.uint64

_CONSTANTS_PATH = os.path.join(
    os.path.dirname(__file__), "data", "hllpp_constants.json")

_CHUNK = 1 << 20


@lru_cache(maxsize=1)
def _constants():
    with open(_CONSTANTS_PATH) as f:
        data = json.load(f)
    return data


def _calc_alpha(m):
    p = int(math.floor(math.log2(m)))
    if p < 4:
        raise ValueError(
            "Please set error rate to a value smaller than 0.367696")
    if p > 16:
        raise ValueError(
            "Please set error rate to a value greater than 0.0040624")
    if p == 4:
        return 0.673
    if p == 5:
        return 0.697
    if p == 6:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / (1 << p))


@lru_cache(maxsize=None)
def _make_update_fn(k, p, m):
    """Fused hash + register scatter-max over a flat chunk of bases."""

    def fn(counters, data, weights):
        hashes, _ = kmer_hashes_murmur_bytes(
            data[None, :], jnp.array([data.shape[0]], jnp.int32), k,
            assume_acgt=True)
        h = hashes[0]
        w = weights[: h.shape[0]]
        idx = (h & U64(m - 1)).astype(jnp.int32)
        to_count = h >> U64(p)
        clz = jax.lax.clz(to_count).astype(jnp.int32)
        rho = jnp.where(to_count > 0, clz, 64) - p + 1
        rho = jnp.where(w > 0, rho, 0).astype(U8)
        idx = jnp.where(w > 0, idx, m)  # dummy slot for masked lanes
        return counters.at[idx].max(rho)

    return jax.jit(fn, donate_argnums=(0,))


class HLLCounter:
    """HyperLogLog++ k-mer cardinality estimator."""

    def __init__(self, error_rate=0.01, ksize=20):
        if isinstance(error_rate, int) and error_rate > 1:
            # reference alternate constructor: explicit register count
            self._init(int(error_rate), int(ksize))
            return
        if error_rate < 0:
            raise ValueError(
                "Please set error rate to a value greater than zero")
        p = int(math.ceil(math.log2((1.04 / error_rate) ** 2)))
        self._init(1 << p, int(ksize))

    def _init(self, nc, ksize):
        self.alpha = _calc_alpha(nc)
        self._p = int(math.floor(math.log2(nc)))
        self._m = nc
        self._ksize = ksize
        # one trailing dummy register absorbs masked scatter lanes
        self._counters = jnp.zeros(nc + 1, U8)

    # -- properties -------------------------------------------------------

    @property
    def error_rate(self):
        return 1.04 / math.sqrt(self._m)

    @error_rate.setter
    def error_rate(self, erate):
        if np.asarray(self._counters).any():
            raise AttributeError(
                "You can only change error rate prior to first counting")
        if erate < 0:
            raise ValueError(
                "Please set error rate to a value greater than zero")
        p = int(math.ceil(math.log2((1.04 / erate) ** 2)))
        self._init(1 << p, self._ksize)

    @property
    def ksize(self):
        return self._ksize

    @ksize.setter
    def ksize(self, new_k):
        if int(new_k) <= 0:
            raise ValueError("Please set k-mer size to a value greater "
                             "than zero")
        if np.asarray(self._counters).any():
            raise AttributeError(
                "You can only change k-mer size prior to first counting")
        self._ksize = int(new_k)

    @property
    def counters(self):
        return [int(c) for c in np.asarray(self._counters)[:-1]]

    @counters.setter
    def counters(self, values):
        if len(values) != self._m:
            raise ValueError(
                "New counters must match the size of old counters")
        self._counters = jnp.concatenate(
            [jnp.asarray(np.asarray(values, np.uint8)),
             jnp.zeros(1, U8)])

    def __len__(self):
        return self.estimate_cardinality()

    # -- counting ---------------------------------------------------------

    def add(self, kmer):
        """Add one value — the murmur hash of the whole string
        (hllcounter.cc:264-300; note this does NOT split into k-mers)."""
        from khmer_tpu.ops.hashing import hash_murmur3_scalar

        h = hash_murmur3_scalar(kmer)
        idx = h & (self._m - 1)
        to_count = h >> self._p
        rho = (64 - to_count.bit_length() if to_count > 0 else 64) \
            - self._p + 1
        self._counters = self._counters.at[idx].max(np.uint8(max(rho, 0)))

    def _consume_bytes_chunks(self, chunks_iter):
        fn = _make_update_fn(self._ksize, self._p, self._m)
        for data, weights in chunks_iter:
            self._counters = fn(self._counters, jnp.asarray(data),
                                jnp.asarray(weights))

    def consume_string(self, seq):
        """Count every k-mer in the string; returns how many."""
        n = len(seq)
        k = self._ksize
        if n < k:
            return 0
        from khmer_tpu.hashtable import _FlatBatcher

        byts = np.frombuffer(seq.encode("ascii"), np.uint8)
        batcher = _FlatBatcher(k, _CHUNK)
        chunks = list(batcher.add(byts))
        tail = batcher.drain()
        if tail is not None:
            chunks.append(tail)
        self._consume_bytes_chunks(iter(chunks))
        return n - k + 1

    def consume_seqfile(self, filename, stream_records=False):
        """Count all reads of a file; returns (total_reads, n_consumed)."""
        import sys

        from khmer_tpu.hashtable import _FlatBatcher
        from khmer_tpu.io.fastx import write_record

        k = self._ksize
        batcher = _FlatBatcher(k, _CHUNK)
        total_reads = 0
        n_consumed = 0
        fn = _make_update_fn(k, self._p, self._m)

        for read in FastxReader(filename):
            total_reads += 1
            if stream_records:
                write_record(read, sys.stdout)
            seq = read.cleaned_seq
            if len(seq) >= k:
                n_consumed += len(seq) - k + 1
            byts = np.frombuffer(seq.encode("ascii"), np.uint8)
            for data, weights in batcher.add(byts):
                self._counters = fn(self._counters, jnp.asarray(data),
                                    jnp.asarray(weights))
        tail = batcher.drain()
        if tail is not None:
            data, weights = tail
            self._counters = fn(self._counters, jnp.asarray(data),
                                jnp.asarray(weights))
        return total_reads, n_consumed

    # -- estimation -------------------------------------------------------

    def estimate_cardinality(self):
        """HLL++ estimate (hllcounter.cc:239-262)."""
        regs = np.asarray(self._counters)[:-1].astype(np.float64)
        m = self._m
        V = int((regs == 0).sum())
        consts = _constants()
        if V > 0:
            H = m * math.log(m / V)
            if H <= consts["threshold"][str(self._p)]:
                return int(H)
        E = self.alpha * m * m / float(np.sum(np.power(2.0, -regs)))
        if E <= 5 * m:
            return int(E - self._estimate_bias(E))
        return int(E)

    def _estimate_bias(self, E):
        consts = _constants()
        raw = np.asarray(consts["raw_estimate"][str(self._p)])
        bias = np.asarray(consts["bias"][str(self._p)])
        # 6 nearest neighbors by squared distance (hllcounter.cc:147-166)
        d = (E - raw) ** 2
        nearest = np.argsort(d, kind="stable")[:6]
        return float(bias[nearest].mean())

    def merge(self, other):
        """Element-wise register max (hllcounter.cc:412-420)."""
        if self._m != other._m or self._ksize != other._ksize:
            raise ValueError(
                "HLLCounters to be merged must be created with same "
                "parameters")
        self._counters = jnp.maximum(self._counters, other._counters)

    def __getstate__(self):
        return (self._m, self._ksize, self.counters)

    def __setstate__(self, state):
        m, k, counters = state
        self._init(m, k)
        self.counters = counters
