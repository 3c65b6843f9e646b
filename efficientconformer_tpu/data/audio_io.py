"""Host-side audio decoding (replaces torchaudio.load, reference
utils/datasets.py:45).

WAV (PCM16/PCM32/float32) is decoded natively with numpy. FLAC — LibriSpeech's
format — is decoded through the ``flac`` or ``ffmpeg`` CLI when present
(checked once); there is no Python FLAC decoder dependency in the image.
Decoded audio is float32 in [-1, 1], shape (T,), with the sample rate returned.
"""

from __future__ import annotations

import functools
import io
import shutil
import subprocess
import wave
from typing import Tuple

import numpy as np


@functools.lru_cache(maxsize=1)
def _flac_backend() -> str | None:
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
                "No FLAC decoder available (need `flac` or `ffmpeg` on PATH); "
                "convert the dataset to wav or install one."
            )
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
