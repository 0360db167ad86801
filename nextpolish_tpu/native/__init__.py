"""ctypes loader for the native host substrate (libnpt.so).

Builds on demand with `make` if the shared object is missing; every entry
point has a pure-Python fallback in io/, so `available()` gating is enough.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libnpt.so")
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.npt_bgzf_size.restype = ctypes.c_longlong
    lib.npt_bgzf_size.argtypes = [ctypes.c_char_p, ctypes.c_longlong]
    lib.npt_bgzf_decompress.restype = ctypes.c_int
    lib.npt_bgzf_decompress.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong, ctypes.c_void_p,
        ctypes.c_longlong, ctypes.c_int,
    ]
    lib.npt_bam_count.restype = ctypes.c_int
    lib.npt_bam_fill.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def bgzf_decompress(data: bytes, n_threads: int = 0) -> bytes | None:
    lib = _load()
    if lib is None:
        return None
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    size = lib.npt_bgzf_size(data, len(data))
    if size < 0:
        return None
    out = np.empty(size, dtype=np.uint8)
    rc = lib.npt_bgzf_decompress(
        data, len(data), out.ctypes.data_as(ctypes.c_void_p), size,
        n_threads,
    )
    if rc != 0:
        return None
    return out.tobytes()


def bam_scan(data: bytes, off: int):
    """Parse BAM records starting at `off` into columnar numpy arrays.
    Returns a dict of arrays or None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    nr = ctypes.c_longlong()
    nc = ctypes.c_longlong()
    nb = ctypes.c_longlong()
    nt = ctypes.c_longlong()
    lib.npt_bam_count(data, len(data), off, ctypes.byref(nr),
                      ctypes.byref(nc), ctypes.byref(nb), ctypes.byref(nt))
    n = nr.value

    def arr(dtype, size):
        return np.zeros(size, dtype=dtype)

    cols = dict(
        tid=arr(np.int32, n), pos=arr(np.int32, n), mapq=arr(np.uint8, n),
        flag=arr(np.uint16, n), tlen=arr(np.int32, n),
        lqseq=arr(np.int32, n), mtid=arr(np.int32, n), mpos=arr(np.int32, n),
        cigar=arr(np.uint32, nc.value), cigar_off=arr(np.int64, n),
        cigar_len=arr(np.int32, n), seq=arr(np.uint8, nb.value),
        seq_off=arr(np.int64, n), qual=arr(np.uint8, nb.value),
        tags=arr(np.uint8, max(nt.value, 1)), tags_off=arr(np.int64, n),
        tags_len=arr(np.int32, n),
    )
    qnames = np.zeros(max(len(data) - off, 1), dtype=np.uint8)
    qused = ctypes.c_longlong()

    def p(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    rc = lib.npt_bam_fill(
        data, len(data), off,
        p(cols["tid"]), p(cols["pos"]), p(cols["mapq"]), p(cols["flag"]),
        p(cols["tlen"]), p(cols["lqseq"]), p(cols["mtid"]), p(cols["mpos"]),
        p(cols["cigar"]), p(cols["cigar_off"]), p(cols["cigar_len"]),
        p(cols["seq"]), p(cols["seq_off"]), p(cols["qual"]),
        p(cols["tags"]), p(cols["tags_off"]), p(cols["tags_len"]),
        p(qnames), len(qnames), ctypes.byref(qused),
    )
    if rc != 0:
        return None
    cols["tags"] = cols["tags"][: nt.value]
    cols["qnames"] = qnames[: qused.value].tobytes()
    cols["n"] = n
    return cols
