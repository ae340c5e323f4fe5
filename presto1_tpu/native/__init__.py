"""Native (C++) host-side helpers, loaded via ctypes with lazy build.

The TPU compute path is XLA; the host-side loader hot spots (text-column
materialisation, dictionary encoding, LCG stream generation) are C++ —
see dbgen_native.cpp.  Falls back to pure numpy when the toolchain is
unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libp1native.so")
_SRC = os.path.join(_HERE, "dbgen_native.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            L = ctypes.CDLL(_SO)
        except OSError:
            return None
        L.p1_lehmer_seeds.argtypes = [
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")]
        L.p1_text_extract.restype = ctypes.c_int64
        L.p1_text_extract.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")]
        L.p1_dict_encode.restype = ctypes.c_int64
        L.p1_dict_encode.argtypes = [
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")]
        _lib = L
        return _lib


def dict_encode_packed(arena: np.ndarray, offsets: np.ndarray):
    """Dictionary-encode packed strings -> (sorted dict np array, codes).

    Returns None if the native library is unavailable."""
    L = lib()
    if L is None:
        return None
    n = len(offsets) - 1
    codes = np.empty(n, dtype=np.int32)
    dict_index = np.empty(max(n, 1), dtype=np.int64)
    d = L.p1_dict_encode(arena, offsets, n, codes, dict_index)
    views = []
    for r in range(d):
        i = dict_index[r]
        views.append(arena[offsets[i]:offsets[i + 1]].tobytes().decode())
    return np.array(views, dtype=object), codes
