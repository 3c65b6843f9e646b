"""Audio frontend vs torch.stft oracle + filterbank properties."""

import numpy as np
import jax.numpy as jnp
import torch

from efficientconformer_tpu.ops.audio import (
    hann_window_padded,
    log_mel_spectrogram,
    mel_filterbank,
)


def test_power_spectrum_matches_torch_stft():
    sr, n_fft, win, hop = 16000, 512, 400, 160
    rng = np.random.default_rng(0)
    t = 3200
    x = rng.standard_normal((2, t)).astype(np.float32)

    # our frames -> power, via the full pipeline with an identity mel matrix
    out, x_len = log_mel_spectrogram(jnp.array(x), jnp.array([t, t - 500]))
    # reconstruct our power spectrum directly
    import efficientconformer_tpu.ops.audio as audio

    xp = jnp.pad(jnp.array(x), ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    idx = np.arange(t // hop + 1)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = xp[:, idx] * jnp.array(hann_window_padded(win, n_fft))
    spec = jnp.fft.rfft(frames, axis=-1)
    power = np.asarray(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2)

    window = torch.zeros(n_fft)
    window[(n_fft - win) // 2 : (n_fft - win) // 2 + win] = torch.hann_window(
        win, periodic=True
    )
    ts = torch.stft(
        torch.tensor(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=window,
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    want = (ts.real ** 2 + ts.imag ** 2).numpy().transpose(0, 2, 1)
    assert want.shape == power.shape
    np.testing.assert_allclose(power, want, atol=1e-2, rtol=1e-4)

    # length formulas
    assert out.shape[1] == t // hop + 1
    np.testing.assert_array_equal(np.asarray(x_len), [t // hop + 1, (t - 500) // hop + 1])


def test_mel_filterbank_properties():
    fb = mel_filterbank(257, 80, 16000, 0.0, 8000.0)
    assert fb.shape == (257, 80)
    assert (fb >= 0).all()
    # each filter is a triangle with a single peak and nonempty support
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()
    assert (fb.sum(axis=0) > 0).all()
    # htk mel centre of filter 0 is near mel spacing of 2595*log10(1+f/700)
    def hz2mel(f):
        return 2595 * np.log10(1 + f / 700)
    mels = np.linspace(hz2mel(0), hz2mel(8000), 82)
    centers_hz = 700 * (10 ** (mels[1:-1] / 2595) - 1)
    freqs = np.linspace(0, 8000, 257)
    np.testing.assert_allclose(freqs[peaks], centers_hz, atol=8000 / 256 + 1e-6)


def test_log_guard_and_normalize():
    x = jnp.zeros((1, 1600))
    out, _ = log_mel_spectrogram(x, None)
    assert np.all(np.isfinite(np.asarray(out)))
    out2, _ = log_mel_spectrogram(x, None, normalize=True, mean=-5.0, std=2.0)
    np.testing.assert_allclose(np.asarray(out2), (np.asarray(out) + 5.0) / 2.0, rtol=1e-6)
