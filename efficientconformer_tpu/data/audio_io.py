"""Host-side audio decoding (replaces torchaudio.load, reference
utils/datasets.py:45).

WAV (PCM16/PCM32/float32) is decoded natively with numpy. FLAC —
LibriSpeech's format — is decoded by the in-repo native decoder
(native/flac_decode.cpp; the image ships neither a FLAC CLI nor libFLAC),
falling back to the ``flac``/``ffmpeg`` CLI if the native library cannot be
built. The native call releases the GIL (ctypes), so a thread pool scales
decode throughput (data/loader.py workers).
Decoded audio is float32 in [-1, 1], shape (T,), with the sample rate returned.
"""

from __future__ import annotations

import ctypes
import functools
import io
import os
import shutil
import subprocess
import wave
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libecf_native.so")


@functools.lru_cache(maxsize=1)
def _native_lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ecf_flac_info.restype = ctypes.c_int
        lib.ecf_flac_info.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.ecf_flac_decode.restype = ctypes.c_longlong
        lib.ecf_flac_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_longlong,
        ]
        return lib
    except (OSError, AttributeError):
        return None


def load_flac_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode a FLAC byte stream with the native decoder -> (float32 mono, sr)."""
    lib = _native_lib()
    if lib is None:
        raise RuntimeError("native FLAC decoder unavailable")
    total = ctypes.c_longlong()
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    bps = ctypes.c_int()
    if lib.ecf_flac_info(data, len(data), ctypes.byref(total),
                         ctypes.byref(sr), ctypes.byref(ch),
                         ctypes.byref(bps)) != 0:
        raise ValueError("invalid FLAC stream")
    cap = total.value if total.value else len(data) * 4 + 65536
    out = np.empty((cap * ch.value,), np.int32)
    n = lib.ecf_flac_decode(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cap,
    )
    if n < 0:
        raise ValueError("FLAC decode failed")
    x = out[: n * ch.value].astype(np.float32) / float(1 << (bps.value - 1))
    if ch.value > 1:
        x = x.reshape(-1, ch.value).mean(axis=1)
    return x, sr.value


@functools.lru_cache(maxsize=1)
def _flac_backend() -> str | None:
    if _native_lib() is not None:
        return "native"
    for tool in ("flac", "ffmpeg"):
        if shutil.which(tool):
            return tool
    return None


def load_wav_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        raw = w.readframes(n)
        ch = w.getnchannels()
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def load_audio(path: str) -> Tuple[np.ndarray, int]:
    """Decode an audio file to (float32 mono (T,), sample_rate)."""
    if path.endswith(".wav"):
        with open(path, "rb") as f:
            return load_wav_bytes(f.read())
    if path.endswith(".flac"):
        backend = _flac_backend()
        if backend is None:
            raise RuntimeError(
                "No FLAC decoder available (native build failed and no "
                "`flac`/`ffmpeg` on PATH)."
            )
        if backend == "native":
            with open(path, "rb") as f:
                return load_flac_bytes(f.read())
        if backend == "flac":
            out = subprocess.run(
                ["flac", "-dcs", "--force-raw-format", "--endian=little",
                 "--sign=signed", path],
                capture_output=True, check=True,
            ).stdout
            x = np.frombuffer(out, np.int16).astype(np.float32) / 32768.0
            return x, 16000
        out = subprocess.run(
            ["ffmpeg", "-v", "quiet", "-i", path, "-f", "s16le", "-ac", "1", "-"],
            capture_output=True, check=True,
        ).stdout
        x = np.frombuffer(out, np.int16).astype(np.float32) / 32768.0
        return x, 16000
    raise ValueError(f"unsupported audio format: {path}")


def audio_length(path: str) -> int:
    """Number of samples without decoding the payload (wav header / flac
    STREAMINFO)."""
    if path.endswith(".wav"):
        with wave.open(path, "rb") as w:
            return w.getnframes()
    if path.endswith(".flac"):
        with open(path, "rb") as f:
            magic = f.read(4)
            if magic != b"fLaC":
                raise ValueError(f"not a flac file: {path}")
            # first metadata block is STREAMINFO
            header = f.read(4)
            f.read(10)  # min/max block & frame sizes
            rest = f.read(8)
            bits = int.from_bytes(rest, "big")
            total = bits & ((1 << 36) - 1)
            return total
    raise ValueError(f"unsupported audio format: {path}")
