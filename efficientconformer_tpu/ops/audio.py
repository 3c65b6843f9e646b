"""Audio frontend as device ops: STFT -> mel filterbank -> log.

Computes the same log-mel features as the reference AudioPreprocessing
(models/modules.py:55-106, which wraps torchaudio Spectrogram + MelScale):
reflect-centred 512-point STFT with a periodic Hann window of win_length
zero-padded to n_fft, power spectrum, HTK-scale triangular mel filterbank
(f_min 0, f_max 8000, no norm), then log(x + 1e-9) evaluated in fp32
(the reference's AMP overflow guard).

Everything is jit-compiled: framing is a gather, the DFT is jnp.fft.rfft (XLA
FFT on TPU), the mel projection is a single (n_fft/2+1, n_mels) matmul that
lands on the MXU. Output layout is channels-last (B, frames, n_mels).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def hann_window_padded(win_length: int, n_fft: int) -> np.ndarray:
    """Periodic Hann window of win_length, centred in an n_fft buffer."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    left = (n_fft - win_length) // 2
    out = np.zeros(n_fft)
    out[left : left + win_length] = w
    return out


@functools.lru_cache(maxsize=8)
def dft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-input DFT as two (n_fft, n_fft//2+1) matmul operands (cos, -sin).

    On TPU an explicit DFT matmul runs on the MXU and beats the XLA FFT at
    speech frame sizes (512-point, tens of thousands of frames per batch);
    power = (frames @ C)^2 + (frames @ S)^2.
    """
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_freqs: int, n_mels: int, sample_rate: int, f_min: float, f_max: float
) -> np.ndarray:
    """(n_freqs, n_mels) HTK-scale triangular filterbank, no normalisation."""

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                      # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def log_mel_spectrogram(
    x: jnp.ndarray,
    x_len: jnp.ndarray | None,
    *,
    sample_rate: int = 16000,
    n_fft: int = 512,
    win_length_ms: int = 25,
    hop_length_ms: int = 10,
    n_mels: int = 80,
    normalize: bool = False,
    mean: float = 0.0,
    std: float = 1.0,
):
    """(B, T_audio) waveform -> ((B, T_audio//hop + 1, n_mels) fp32, lengths).

    Frame count and x_len update match the reference exactly:
    frames = T//hop + 1, x_len = x_len//hop + 1.
    """
    win_length = sample_rate * win_length_ms // 1000
    hop = sample_rate * hop_length_ms // 1000
    b, t = x.shape
    n_frames = t // hop + 1

    x = jnp.asarray(x, jnp.float32)
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = xp[:, idx]                                   # (B, nF, n_fft)
    window = jnp.asarray(hann_window_padded(win_length, n_fft))
    frames = frames * window
    # real DFT via MXU matmuls (see dft_matrices)
    cos_m, sin_m = dft_matrices(n_fft)
    re = frames @ jnp.asarray(cos_m)
    im = frames @ jnp.asarray(sin_m)
    power = re * re + im * im                             # (B, nF, n_fft//2+1)

    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, 0.0, 8000.0))
    mel = power @ fb                                      # (B, nF, n_mels)
    out = jnp.log(mel + 1e-9)

    if normalize:
        out = (out - mean) / std

    if x_len is not None:
        x_len = x_len // hop + 1
    return out, x_len
