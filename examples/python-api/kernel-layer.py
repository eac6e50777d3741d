#!/usr/bin/env python
"""Dropping below the table API: the khmer_tpu.ops kernel layer.

The reference's equivalent is the C++ liboxli API
(reference examples/c++-api/*.cc — consume.cc, bloom.cc,
exact-counting.cc link liboxli directly).  khmer-tpu's compute core is
JAX/XLA, so "one level down" is the jittable kernel layer: fused
batched hashing and raw sketch update/read ops you can compose into
your own jit/pjit programs."""

import numpy as np

import jax.numpy as jnp

from khmer_tpu.ops.encode import encode_sequence
from khmer_tpu.ops.hashing import kmer_hashes_2bit
from khmer_tpu.ops.sketch_ops import (SketchSpec, alloc_table, sketch_get,
                                      sketch_update)
from khmer_tpu.primes import get_n_primes_near_x

K = 21
seq = "GCTGCACCGATGTACGCAAAGCTATTTAAAACCATAACTATTCTCACTTA"

# 1. encode + hash one batch of sequences (one row per sequence)
codes = jnp.asarray(encode_sequence(seq))[None, :]
lengths = jnp.asarray([len(seq)], jnp.int32)
hashes, valid = kmer_hashes_2bit(codes, lengths, K)
hashes = hashes[0][np.asarray(valid[0])]
print("hashed", hashes.shape[0], "k-mers; first =", hex(int(hashes[0])))

# 2. raw count-min sketch: allocate, scatter-update, gather-read
spec = SketchSpec("byte", tuple(get_n_primes_near_x(4, 1_000_000)), False)
table = alloc_table(spec)
z = jnp.zeros((), jnp.uint64)
table, _, n_unique, _ = sketch_update(
    spec, table, z, z, hashes, jnp.ones(hashes.shape[0], jnp.uint32))
counts = np.asarray(sketch_get(spec, table, hashes))
print("n_unique =", int(n_unique), "min/max count =",
      counts.min(), counts.max())
assert counts.min() >= 1
print("kernel-layer demo OK")
