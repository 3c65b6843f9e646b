"""ctypes binding for the native CTC beam search (native/ctc_beam.cpp).

Builds lazily with make on first use when the shared library is missing;
falls back to the pure-Python implementation if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libecf_native.so")
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.ecf_arpa_load.restype = ctypes.c_void_p
    lib.ecf_arpa_load.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.ecf_arpa_free.argtypes = [ctypes.c_void_p]
    lib.ecf_arpa_order.restype = ctypes.c_int
    lib.ecf_arpa_order.argtypes = [ctypes.c_void_p]
    lib.ecf_ctc_beam_search.restype = ctypes.c_int
    lib.ecf_ctc_beam_search.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeArpa:
    """Owns a native ARPA model handle."""

    def __init__(self, path: str, ngram_offset: int = 100):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._handle = lib.ecf_arpa_load(path.encode(), ngram_offset)
        if not self._handle:
            raise FileNotFoundError(path)

    @property
    def order(self) -> int:
        return self._lib.ecf_arpa_order(self._handle)

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.ecf_arpa_free(self._handle)
            self._handle = None


def ctc_beam_search_native(
    log_probs: np.ndarray,
    seq_len: int,
    beam_size: int = 16,
    blank: int = 0,
    lm: Optional[NativeArpa] = None,
    alpha: float = 0.0,
    beta: float = 0.0,
    cutoff_top_n: int = 0,   # 0 = full vocabulary (reference default)
) -> List[int]:
    lib = _load()
    assert lib is not None
    lp = np.ascontiguousarray(log_probs, np.float32)
    t, v = lp.shape
    out = np.zeros((t,), np.int32)
    n = lib.ecf_ctc_beam_search(
        lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t, v, int(seq_len), beam_size, blank,
        lm._handle if lm is not None else None,
        alpha, beta, cutoff_top_n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        t,
    )
    return out[:n].tolist()
