"""ctypes binding for the native BPE encoder (native/bpe_encode.cpp)."""

from __future__ import annotations

import ctypes
from typing import List, Sequence, Tuple

from efficientconformer_tpu.decoding import native_binding


def _lib():
    lib = native_binding._load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if not hasattr(lib, "_bpe_ready"):
        lib.ecf_bpe_create.restype = ctypes.c_void_p
        lib.ecf_bpe_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
        ]
        lib.ecf_bpe_free.argtypes = [ctypes.c_void_p]
        lib.ecf_bpe_encode.restype = ctypes.c_int
        lib.ecf_bpe_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib._bpe_ready = True
    return lib


def _char_array(strings: Sequence[str]):
    arr = (ctypes.c_char_p * len(strings))()
    arr[:] = [s.encode("utf-8") for s in strings]
    return arr


class NativeBpe:
    def __init__(self, pieces: List[str], merges: List[Tuple[str, str]]):
        self._lib = _lib()
        p = _char_array(pieces)
        ma = _char_array([m[0] for m in merges])
        mb = _char_array([m[1] for m in merges])
        self._handle = self._lib.ecf_bpe_create(p, len(pieces), ma, mb, len(merges))
        if not self._handle:
            raise RuntimeError("ecf_bpe_create failed")

    def encode(self, text: str) -> List[int]:
        data = text.encode("utf-8")
        # worst case: one id per byte
        out = (ctypes.c_int * max(len(data), 8))()
        n = self._lib.ecf_bpe_encode(self._handle, data, out, len(out))
        return list(out[:n])

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.ecf_bpe_free(self._handle)
            self._handle = None
