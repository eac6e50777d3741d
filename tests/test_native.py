"""Native C++ data-loader parity: its (data, mask) chunks and resulting
sketch state must match the pure-python parser+batcher exactly."""

import gzip

import numpy as np
import pytest

from khmer_tpu.hashtable import CHUNK, Counttable, _FlatBatcher
from khmer_tpu.graph import Countgraph
from khmer_tpu.io.fastx import FastxReader
from khmer_tpu.native import NativeChunkReader, native_available
from khmer_tpu.ops import encode as enc

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native loader not built")

K = 21


def python_chunks(filename, k, chunk):
    batcher = _FlatBatcher(k, chunk)
    out = []
    for read in FastxReader(filename):
        for data, mask in batcher.add(enc.encode_sequence(read.cleaned_seq)):
            out.append((data, mask))
    tail = batcher.drain()
    if tail is not None:
        out.append(tail)
    return out


def write_test_fasta(path, n=300, multiline=False):
    import random

    rng = random.Random(42)
    with open(path, "w") as f:
        for i in range(n):
            ln = rng.randint(15, 400)
            seq = "".join(rng.choice("ACGTN") for _ in range(ln))
            if multiline and ln > 100:
                f.write(">r%d\n%s\n%s\n" % (i, seq[:100], seq[100:]))
            else:
                f.write(">r%d\n%s\n" % (i, seq))


def write_test_fastq(path, n=200):
    import random

    rng = random.Random(43)
    with open(path, "w") as f:
        for i in range(n):
            ln = rng.randint(20, 150)
            seq = "".join(rng.choice("acgtACGT") for _ in range(ln))
            f.write("@r%d\n%s\n+\n%s\n" % (i, seq, "I" * ln))


@pytest.mark.parametrize("kind", ["fasta", "fasta_multiline", "fastq",
                                  "fastq_gz"])
def test_chunk_parity(tmp_path, kind):
    chunk = 4096
    if kind.startswith("fasta"):
        path = str(tmp_path / "t.fa")
        write_test_fasta(path, multiline=(kind == "fasta_multiline"))
    else:
        path = str(tmp_path / "t.fq")
        write_test_fastq(path)
        if kind == "fastq_gz":
            gz = path + ".gz"
            with open(path, "rb") as f, gzip.open(gz, "wb") as g:
                g.write(f.read())
            path = gz

    py = python_chunks(path, K, chunk)
    nat = list(NativeChunkReader(path, K, chunk))
    # python side does not pad the final chunk; native does
    assert len(py) == len(nat)
    for i, ((pd, pm), (nd, nm)) in enumerate(zip(py, nat)):
        if i == len(py) - 1:
            nd = nd[: pd.shape[0]]
            nm = nm[: pm.shape[0]]
        assert np.array_equal(pd, nd), "data mismatch in chunk %d" % i
        assert np.array_equal(pm, nm), "mask mismatch in chunk %d" % i


def test_native_stats(tmp_path):
    path = str(tmp_path / "t.fa")
    write_test_fasta(path, n=50)
    reader = NativeChunkReader(path, K, CHUNK)
    list(reader)
    n_reads, n_consumed, n_bases = reader.stats()
    exp_reads = 0
    exp_consumed = 0
    exp_bases = 0
    for read in FastxReader(path):
        exp_reads += 1
        exp_bases += len(read.sequence)
        if len(read.sequence) >= K:
            exp_consumed += len(read.sequence) - K + 1
    assert n_reads == exp_reads
    assert n_consumed == exp_consumed
    assert n_bases == exp_bases


def test_consume_native_matches_python(tmp_path, ref_test_data):
    infile = ref_test_data + "/100-reads.fq.gz"
    g_native = Countgraph(20, 2e4, 3)
    g_python = Countgraph(20, 2e4, 3)
    n_reads, n_consumed = g_native.consume_seqfile(infile)
    assert g_native._can_use_native(infile)
    n_reads2, n_consumed2 = g_python._run_consume(
        g_python._reads(infile))
    assert (n_reads, n_consumed) == (n_reads2, n_consumed2)
    assert np.array_equal(np.asarray(g_native.storage.table),
                          np.asarray(g_python.storage.table))
    assert g_native.n_unique_kmers() == g_python.n_unique_kmers()


def test_consume_native_murmur(tmp_path):
    path = str(tmp_path / "t.fa")
    write_test_fasta(path, n=100)
    t_native = Counttable(K, 2e4, 3)
    t_python = Counttable(K, 2e4, 3)
    t_native.consume_seqfile(path)
    t_python._run_consume(t_python._reads(path))
    assert np.array_equal(np.asarray(t_native.storage.table),
                          np.asarray(t_python.storage.table))
