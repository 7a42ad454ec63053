"""ctypes binding for the native FASTA/FASTQ batcher (native/fasta_reader.cpp).

Builds the shared library on first use (cached next to the source) and falls
back to the pure-Python reader when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = None


def _build_lib():
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "fasta_reader.cpp"))
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libfastareader.so"))
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(
            ["c++", "-O3", "-shared", "-fPIC", src, "-o", so], check=True
        )
    return so


def _lib():
    global _LIB
    if _LIB is None:
        so = _build_lib()
        lib = ctypes.CDLL(so)
        lib.fr_open.restype = ctypes.c_void_p
        lib.fr_open.argtypes = [ctypes.c_char_p]
        lib.fr_close.argtypes = [ctypes.c_void_p]
        lib.fr_next_batch.restype = ctypes.c_int64
        lib.fr_next_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_char), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _LIB = lib
    return _LIB


def native_available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


class NativeBatcher:
    """Iterate fixed-shape [B, L] uint8 batches straight from a FASTA/FASTQ
    file; headers and true lengths ride along."""

    def __init__(self, path: str, batch_size: int, max_len: int,
                 hdr_buf_cap: int = 1 << 22):
        self.lib = _lib()
        self.handle = self.lib.fr_open(path.encode())
        if not self.handle:
            raise FileNotFoundError(path)
        self.B = batch_size
        self.L = max_len
        self.hdr_cap = hdr_buf_cap
        # persistent buffers: the first binding allocated + zeroed a fresh
        # 4 MB header buffer per batch and copied all of it back — 40x slower
        # than the Python parser.  Reused buffers + the C-reported header
        # byte count keep the per-batch cost proportional to the data.
        self._batch = np.zeros((self.B, self.L), np.uint8)
        self._lengths = np.zeros(self.B, np.int32)
        self._hdr = np.zeros(self.hdr_cap, np.uint8)
        self._hdr_bytes = ctypes.c_int64(0)

    def __iter__(self):
        return self

    def __next__(self):
        n = self.lib.fr_next_batch(
            self.handle,
            self._batch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self.B, self.L,
            self._lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._hdr.ctypes.data_as(ctypes.POINTER(ctypes.c_char)),
            self.hdr_cap, ctypes.byref(self._hdr_bytes),
        )
        if n == 0:
            self.close()
            raise StopIteration
        used = self._hdr_bytes.value
        headers = self._hdr[:used].tobytes().split(b"\0")[:n]
        if len(headers) < n:
            # header buffer was exhausted mid-batch (C side truncates
            # content but can run out of separator bytes only when the
            # buffer is completely full): keep row alignment with blanks
            headers += [b""] * (n - len(headers))
        headers = [h.decode(errors="replace") for h in headers]
        # rows are copies: the caller may hold a batch while the next one
        # is parsed into the persistent buffer
        return self._batch[:n].copy(), self._lengths[:n].copy(), headers

    def close(self):
        if self.handle:
            self.lib.fr_close(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
