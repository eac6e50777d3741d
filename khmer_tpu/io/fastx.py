"""Host-side FASTA/FASTQ reading and writing.

Parity notes: the reference parses reads with SeqAn behind a spin-locked
ReadParser (src/oxli/read_parsers.cc:336-361).  On TPU the parser's job is
to feed fixed-shape device batches, so this is a plain streaming parser
with gzip/bzip2 transparently handled.  Read cleaning follows
include/oxli/read_parsers.hh:122-138: uppercase, then non-ACGT -> 'A'.
"""

import bz2
import gzip
import io
import os
import sys

from khmer_tpu.ops.encode import clean_sequence


class Read:
    """A sequencing read (reference include/oxli/read_parsers.hh:102-138).

    Mirrors the Cython Sequence/screed Record surface: attributes plus
    dict-style access, and `quality` raising AttributeError when the
    record has none (tests/test_read_parsers.py:60-66 relies on
    `hasattr(read, 'quality')` being False for FASTA input)."""

    __slots__ = ("name", "sequence", "_quality", "description", "_cleaned")

    def __init__(self, name="", sequence="", quality=None, description=""):
        self.name = name
        self.sequence = sequence
        self._quality = quality
        self.description = description
        self._cleaned = None

    @property
    def quality(self):
        if self._quality is None:
            raise AttributeError("this read has no quality string")
        return self._quality

    @quality.setter
    def quality(self, value):
        self._quality = value

    def __getitem__(self, key):
        # screed.Record compatibility (sandbox scripts use record['name'])
        if key in ("name", "sequence", "description", "quality",
                   "cleaned_seq"):
            try:
                return getattr(self, key)
            except AttributeError:
                raise KeyError(key)
        raise KeyError(key)

    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default

    @property
    def cleaned_seq(self):
        if self._cleaned is None:
            self._cleaned = clean_sequence(self.sequence)
        return self._cleaned

    @cleaned_seq.setter
    def cleaned_seq(self, value):
        self._cleaned = value

    def set_clean_seq(self):
        self._cleaned = clean_sequence(self.sequence)

    def __len__(self):
        return len(self.sequence)

    def __repr__(self):
        return 'Read(name="{0}")'.format(self.name)

    def write_fastx(self, fileobj):
        write_record(self, fileobj)


def _open_stream(filename):
    """Open a (possibly compressed) sequence file for text reading."""
    if filename in ("-", "/dev/stdin"):
        return sys.stdin.buffer
    if hasattr(filename, "read"):
        return filename
    if not os.path.exists(filename):
        raise OSError("file '{}' does not exist".format(filename))
    f = open(filename, "rb")
    magic = f.read(3)
    f.seek(0)
    if magic[:2] == b"\x1f\x8b":
        return gzip.open(f, "rb")
    if magic == b"BZh":
        return bz2.open(f, "rb")
    return f


def sniff_filetype(filename):
    """Classify a file like khmer's FILETYPES probe: returns one of
    'fasta', 'fastq', 'gzip', 'bzip2', 'unknown'."""
    with open(filename, "rb") as f:
        magic = f.read(3)
    if magic[:2] == b"\x1f\x8b":
        return "gzip"
    if magic == b"BZh":
        return "bzip2"
    if magic[:1] == b">":
        return "fasta"
    if magic[:1] == b"@":
        return "fastq"
    return "unknown"


class FastxReader:
    """Streaming FASTA/FASTQ reader yielding Read objects."""

    def __init__(self, filename):
        self.filename = filename
        self._stream = _open_stream(filename)
        self.num_reads = 0

    def __iter__(self):
        stream = self._stream
        # peek at first non-empty line to pick the format
        first = stream.readline()
        while first in (b"\n", b"\r\n"):
            first = stream.readline()
        if not first:
            return
        if first.startswith(b">"):
            yield from self._iter_fasta(first, stream)
        elif first.startswith(b"@"):
            yield from self._iter_fastq(first, stream)
        else:
            raise ValueError(
                "unknown sequence format in {!r}".format(self.filename))

    def _iter_fasta(self, header, stream):
        name = header[1:].strip().decode()
        chunks = []
        for line in stream:
            if line.startswith(b">"):
                self.num_reads += 1
                yield self._make_read(name, b"".join(chunks))
                name = line[1:].strip().decode()
                chunks = []
            else:
                chunks.append(line.strip())
        self.num_reads += 1
        yield self._make_read(name, b"".join(chunks))

    def _iter_fastq(self, header, stream):
        while True:
            if not header:
                return
            if header in (b"\n", b"\r\n"):
                header = stream.readline()
                continue
            if not header.startswith(b"@"):
                raise ValueError(
                    "invalid FASTQ record in {!r}".format(self.filename))
            name = header[1:].strip().decode()
            seq = stream.readline().strip()
            plus = stream.readline()
            if not plus.startswith(b"+"):
                raise ValueError(
                    "invalid FASTQ record (missing '+') in {!r}".format(
                        self.filename))
            qual = stream.readline().strip()
            # NOTE: a quality string whose length differs from the
            # sequence is passed through unchanged — the reference's
            # SeqAn readRecord does not enforce equality and its own
            # test data (valid-read-testing.fq) relies on that
            self.num_reads += 1
            yield Read(name=name, sequence=seq.decode(),
                       quality=qual.decode())
            header = stream.readline()

    @staticmethod
    def _make_read(name, seq_bytes):
        return Read(name=name, sequence=seq_bytes.decode())

    def close(self):
        if self._stream not in (sys.stdin.buffer,):
            self._stream.close()


def open_reads(filename):
    """Iterate reads from a sequence file."""
    return iter(FastxReader(filename))


def write_record(record, fileobj):
    """Write one record in FASTA/FASTQ (follows khmer/utils.py:172-187)."""
    quality = getattr(record, "quality", None)
    if quality is not None:
        recstr = "@{0}\n{1}\n+\n{2}\n".format(
            record.name, record.sequence, quality)
    else:
        recstr = ">{0}\n{1}\n".format(record.name, record.sequence)
    try:
        fileobj.write(bytes(recstr, "ascii"))
    except TypeError:
        fileobj.write(recstr)


def write_record_pair(read1, read2, fileobj):
    write_record(read1, fileobj)
    write_record(read2, fileobj)
