"""ctypes binding for the native threaded JPEG batch decoder (native/).

Falls back gracefully: `available()` is False when the shared library has not
been built (`make -C native`), and data/decode.py then uses cv2.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libzsvc_decode.so"),
    "libzsvc_decode.so",
)

_lib = None
_threads = max((os.cpu_count() or 1), 1)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(os.path.abspath(p) if os.sep in p else p)
            lib.zsvc_decode_jpeg_batch.restype = ctypes.c_int
            lib.zsvc_decode_jpeg_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
                ctypes.c_int,
            ]
            lib.zsvc_jpeg_dims.restype = ctypes.c_int
            lib.zsvc_jpeg_dims.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            _lib = lib
            return _lib
        except OSError:
            continue
    _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def set_threads(n: int) -> None:
    global _threads
    _threads = max(int(n), 1)


def jpeg_dims(path: str) -> Optional[Tuple[int, int]]:
    lib = _load()
    if not lib:
        return None
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.zsvc_jpeg_dims(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def decode_jpeg_batch(paths: List[str]) -> Optional[np.ndarray]:
    """-> [n, h, w, 3] RGB uint8, or None on failure (caller falls back)."""
    lib = _load()
    if not lib or not paths:
        return None
    dims = jpeg_dims(paths[0])
    if dims is None:
        return None
    h, w = dims
    n = len(paths)
    out = np.empty((n, h, w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    n_ok = lib.zsvc_decode_jpeg_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        h, w, _threads)
    if n_ok == 0:
        return None
    return out
