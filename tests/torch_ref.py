"""Shared helper: import the reference PyTorch model code (/root/reference)
with a *faithful* pure-torch torchaudio stub.

The image ships torch but not torchaudio. The reference's AudioPreprocessing
(models/modules.py:55-106) only uses torchaudio.transforms.Spectrogram and
MelScale with fixed settings (power-2 reflect-centred STFT, periodic Hann,
HTK-scale mel filterbank with no norm) — both are reimplemented here on top of
torch.stft / plain matmul so that full-model forward parity (audio in, logits
out) can be asserted against the JAX framework. FrequencyMasking/TimeMasking
are eval-time no-ops (SpecAugment only runs in training mode).
"""

from __future__ import annotations

import math
import sys
import types

import torch


class _Spectrogram(torch.nn.Module):
    """torchaudio.transforms.Spectrogram(n_fft, win_length, hop_length) with
    torchaudio defaults: power=2, center=True, pad_mode='reflect',
    periodic Hann window of win_length (zero-padded to n_fft by torch.stft)."""

    def __init__(self, n_fft=400, win_length=None, hop_length=None, **kw):
        super().__init__()
        self.n_fft = n_fft
        self.win_length = win_length or n_fft
        self.hop_length = hop_length or self.win_length // 2
        self.register_buffer(
            "window", torch.hann_window(self.win_length, periodic=True)
        )

    def forward(self, x):
        spec = torch.stft(
            x,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            window=self.window,
            center=True,
            pad_mode="reflect",
            normalized=False,
            onesided=True,
            return_complex=True,
        )
        return spec.abs().pow(2.0)


def _hz_to_mel(f):
    return 2595.0 * math.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


class _MelScale(torch.nn.Module):
    """torchaudio.transforms.MelScale(n_mels, sample_rate, f_min, f_max, n_stft)
    with defaults norm=None, mel_scale='htk'."""

    def __init__(self, n_mels=128, sample_rate=16000, f_min=0.0, f_max=None,
                 n_stft=201, **kw):
        super().__init__()
        f_max = f_max if f_max is not None else sample_rate / 2
        all_freqs = torch.linspace(0, sample_rate // 2, n_stft)
        m_pts = torch.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
        f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
        f_diff = f_pts[1:] - f_pts[:-1]
        slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
        down = -slopes[:, :-2] / f_diff[:-1]
        up = slopes[:, 2:] / f_diff[1:]
        fb = torch.clamp(torch.min(down, up), min=0.0)
        self.register_buffer("fb", fb)  # (n_stft, n_mels)

    def forward(self, x):
        # x (..., n_stft, time) -> (..., n_mels, time)
        return torch.matmul(x.transpose(-1, -2), self.fb).transpose(-1, -2)


class _Identity(torch.nn.Module):
    def __init__(self, *a, **k):
        super().__init__()

    def forward(self, x, *a, **k):
        return x


def install_torchaudio_stub():
    """Install (or upgrade) the torchaudio stub in sys.modules."""
    ta = types.ModuleType("torchaudio")
    tr = types.ModuleType("torchaudio.transforms")
    tr.Spectrogram = _Spectrogram
    tr.MelScale = _MelScale
    tr.FrequencyMasking = _Identity
    tr.TimeMasking = _Identity
    ta.transforms = tr
    ta.__faithful__ = True
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.transforms"] = tr
    return ta


def import_reference():
    """Import the reference model modules (torch side). Returns the package
    namespace 'models' or raises ImportError if unavailable."""
    install_torchaudio_stub()
    if "/root/reference" not in sys.path:
        # append, not insert(0): the reference also has a top-level main.py
        # whose DDP-style main(rank, args) would otherwise shadow the repo's
        # main module for any test importing it afterwards
        sys.path.append("/root/reference")
    import models.encoders  # noqa: F401
    import models.decoders  # noqa: F401
    import models.joint_networks  # noqa: F401
    import models  # noqa: F401

    return sys.modules["models"]


def import_reference_full():
    """Import the reference's *task-model* modules (models.model_ctc,
    models.transducer) so its own decode paths can be driven in-tree.

    Beyond the torchaudio stub this needs placeholder modules for the native
    deps the image lacks — ctcdecode / kenlm / warp_rnnt / jiwer — which the
    reference imports at module scope but greedy decoding never calls
    (reference model_ctc.py:35, transducer.py:50, losses.py:20,
    model.py:29) — plus our sentencepiece shim so reference models/model.py:50
    loads real tokenizers from .model files.
    """
    from efficientconformer_tpu.utils import spm_shim

    spm_shim.install()

    def _stub_module(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    class _UnavailableBeamDecoder:
        def __init__(self, *a, **k):
            raise RuntimeError("ctcdecode stub: beam search unavailable")

    _stub_module("ctcdecode", CTCBeamDecoder=_UnavailableBeamDecoder)
    _stub_module("kenlm", Model=None)
    _stub_module(
        "warp_rnnt",
        rnnt_loss=lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("warp_rnnt stub")),
    )
    _stub_module("jiwer", wer=lambda t, p: 0.0)

    ref = import_reference()
    import models.model_ctc  # noqa: F401
    import models.transducer  # noqa: F401

    return ref
