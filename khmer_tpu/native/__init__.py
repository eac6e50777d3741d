"""Native (C++) host runtime components.

The compute path is jax/XLA; the host-side runtime around it — the
data loader that parses, cleans, 2-bit-encodes and chunk-batches reads
(the reference's C++ read_parsers layer, src/oxli/read_parsers.cc) —
is C++ compiled on first use with the system toolchain and bound via
ctypes.  Falls back cleanly to the pure-python path when no compiler
is available.
"""

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastx_loader.cc")
_SRC_RA = os.path.join(_HERE, "read_aligner.cc")
_SO = os.path.join(_HERE, "libkhmer_io.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build():
    from khmer_tpu._version import __version__

    # pid-unique temp name: concurrent builders (pytest-xdist workers,
    # CLI subprocesses racing a source update) must not interleave
    # writes into one .tmp before the atomic rename
    tmp = "%s.tmp.%d" % (_SO, os.getpid())
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
           _SRC_RA, '-DKHMER_TPU_VERSION="%s"' % __version__,
           "-lz", "-l:libbz2.so.1", "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _SO)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def native_version():
    """Version string compiled into the native runtime (None when the
    native library is unavailable or predates the version stamp)."""
    lib = get_lib()
    if lib is None:
        return None
    try:
        fn = lib.kio_version
    except AttributeError:
        return None
    fn.restype = ctypes.c_char_p
    fn.argtypes = []
    return fn().decode()


def get_lib():
    """The loaded native library, building it on first use; None when
    unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_SO) or (
                    os.path.getmtime(_SO) < max(os.path.getmtime(_SRC),
                                                os.path.getmtime(_SRC_RA))):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.kio_open.restype = ctypes.c_void_p
            lib.kio_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                     ctypes.c_long]
            lib.kio_next_chunk.restype = ctypes.c_long
            lib.kio_next_chunk.argtypes = [ctypes.c_void_p,
                                           ctypes.c_void_p,
                                           ctypes.c_void_p]
            lib.kio_stats.restype = None
            lib.kio_stats.argtypes = [ctypes.c_void_p] + \
                [ctypes.POINTER(ctypes.c_uint64)] * 3
            lib.kio_close.restype = None
            lib.kio_close.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception as exc:  # pragma: no cover - toolchain issues
            print("khmer_tpu: native loader unavailable (%s); "
                  "using python parser" % exc, file=sys.stderr)
            _build_failed = True
    return _lib


def native_available():
    return get_lib() is not None


class NativeChunkReader:
    """Stream (data, mask) device chunks for a sequence file.

    Produces exactly the chunks khmer_tpu.hashtable._FlatBatcher would
    for the cleaned 2-bit code stream of the file; FASTA/FASTQ, plain
    or gzip.  bzip2 inputs are not handled natively — callers should
    fall back to the python path for those.
    """

    def __init__(self, filename, k, chunk):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self.chunk = chunk
        self._h = lib.kio_open(
            os.fsencode(filename), int(k), int(chunk))
        if not self._h:
            raise OSError("file '{}' could not be opened".format(filename))

    def __iter__(self):
        lib = self._lib
        chunk = self.chunk
        while True:
            data = np.empty(chunk, np.uint8)
            mask = np.empty(chunk, np.uint8)
            n = lib.kio_next_chunk(
                self._h,
                data.ctypes.data_as(ctypes.c_void_p),
                mask.ctypes.data_as(ctypes.c_void_p))
            if n == -2:
                raise ValueError("invalid FASTA/FASTQ input")
            if n == -1:
                return
            yield data, mask
            if n < chunk:
                return

    def stats(self):
        """(n_reads, n_consumed_kmers, n_bases) so far."""
        a = ctypes.c_uint64()
        b = ctypes.c_uint64()
        c = ctypes.c_uint64()
        self._lib.kio_stats(self._h, ctypes.byref(a), ctypes.byref(b),
                            ctypes.byref(c))
        return a.value, b.value, c.value

    def close(self):
        if self._h:
            self._lib.kio_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
