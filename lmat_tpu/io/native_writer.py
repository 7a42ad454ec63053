"""ctypes binding for the native .out line formatter (native/out_formatter.cpp).

The fast-mode host loop is transfer- and format-bound; the native formatter
turns the per-batch Python string building (~30us/read) into one C call.
Falls back silently when no compiler is available (callers keep the pure
Python formatter).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = None
_FAILED = False


def _build_lib():
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "out_formatter.cpp"))
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "liboutfmt.so"))
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(
            ["c++", "-O3", "-shared", "-fPIC", src, "-o", so], check=True
        )
    return so


def _lib():
    global _LIB, _FAILED
    if _LIB is None and not _FAILED:
        try:
            lib = ctypes.CDLL(_build_lib())
            lib.fmt_out_lines.restype = ctypes.c_int64
            lib.fmt_out_lines.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,          # ints, flts
                ctypes.c_void_p, ctypes.c_void_p,          # tids, score
                ctypes.c_int64, ctypes.c_int64,            # B, C
                ctypes.c_char_p, ctypes.c_void_p,          # hdrs, hdr_off
                ctypes.c_char_p, ctypes.c_void_p,          # seqs, seq_off
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_float,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_char_p, ctypes.c_int64,
            ]
            _LIB = lib
        except Exception:
            _FAILED = True
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def _pack_strs(strs):
    data = ("\0".join(strs) + "\0").encode()
    lens = np.array([len(s.encode()) + 1 for s in strs], np.int64)
    off = np.zeros(len(strs), np.int64)
    off[1:] = np.cumsum(lens[:-1])
    return data, off


def fmt_out_lines(ints, flts, tids, score, reads, k, min_kmer, min_fnd_kmer,
                  screen_phix, min_score):
    """Format one batch; returns (bytes, track_tid, track_score,
    nomatch_kind) or None when the native library is unavailable.

    ints/flts/tids/score: numpy arrays from the fetched device step (rows
    beyond len(reads) ignored).  reads: [(hdr, seq)].
    """
    lib = _lib()
    if lib is None:
        return None
    n = len(reads)
    C = tids.shape[1]
    ints = np.ascontiguousarray(ints[:n], np.int32)
    flts = np.ascontiguousarray(flts[:n], np.float32)
    tids = np.ascontiguousarray(tids[:n], np.int32)
    score = np.ascontiguousarray(score[:n], np.float32)
    hdrs, hdr_off = _pack_strs([h for h, _ in reads])
    seqs, seq_off = _pack_strs([s for _, s in reads])
    track_tid = np.empty(n, np.int32)
    track_score = np.empty(n, np.float32)
    nomatch = np.empty(n, np.int8)
    cap = len(hdrs) + len(seqs) + n * (C * 26 + 192)
    while True:
        buf = ctypes.create_string_buffer(cap)
        wrote = lib.fmt_out_lines(
            ints.ctypes.data, flts.ctypes.data, tids.ctypes.data,
            score.ctypes.data, n, C,
            hdrs, hdr_off.ctypes.data, seqs, seq_off.ctypes.data,
            k, min_kmer, min_fnd_kmer, int(screen_phix),
            np.float32(min_score),
            track_tid.ctypes.data, track_score.ctypes.data,
            nomatch.ctypes.data, buf, cap,
        )
        if wrote >= 0:
            return buf.raw[:wrote], track_tid, track_score, nomatch
        cap *= 2
