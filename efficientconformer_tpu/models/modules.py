"""Conformer building modules (flax.linen), channels-last layouts.

Counterparts of reference models/modules.py. Differences driven by TPU:
features are (B, T, M) / NHWC everywhere (XLA-native layouts), subsampling uses
explicit torch-equivalent padding so sequence-length formulas match exactly,
and the frontend/SpecAugment are device ops from ``ops.audio`` /
``ops.specaugment`` fused into the encoder's jit program.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficientconformer_tpu.models.layers import (
    Conv1d,
    Conv2d,
    Dense,
    LayerNorm,
    batch_norm,
    glu,
    swish,
)
from efficientconformer_tpu.models.attentions import MultiHeadSelfAttention
from efficientconformer_tpu.ops.audio import log_mel_spectrogram
from efficientconformer_tpu.ops.specaugment import spec_augment


def _act(name: str):
    if name == "relu":
        return jax.nn.relu
    if name == "swish":
        return swish
    if name == "none":
        return lambda x: x
    raise ValueError(f"unknown activation {name}")


class AudioPreprocessing(nn.Module):
    """Log-mel frontend (see ops/audio.py). Stateless; lives inside the encoder
    like the reference (models/encoders.py:50) so the DataLoader ships raw
    waveforms and the STFT/mel matmuls run on the MXU."""

    sample_rate: int = 16000
    n_fft: int = 512
    win_length_ms: int = 25
    hop_length_ms: int = 10
    n_mels: int = 80
    normalize: bool = False
    mean: float = 0.0
    std: float = 1.0

    def __call__(self, x, x_len):
        return log_mel_spectrogram(
            x,
            x_len,
            sample_rate=self.sample_rate,
            n_fft=self.n_fft,
            win_length_ms=self.win_length_ms,
            hop_length_ms=self.hop_length_ms,
            n_mels=self.n_mels,
            normalize=self.normalize,
            mean=self.mean,
            std=self.std,
        )


class SpecAugment(nn.Module):
    spec_augment: bool
    mF: int
    F: int
    mT: int
    pS: float

    @nn.compact
    def __call__(self, x, x_len, train: bool):
        if not (self.spec_augment and train):
            return x
        key = self.make_rng("augment")
        return spec_augment(key, x, x_len, mF=self.mF, F=self.F, mT=self.mT, pS=self.pS)


# ---------------------------------------------------------------------------
# Subsampling
# ---------------------------------------------------------------------------


class Conv1dSubsampling(nn.Module):
    """Stack of stride-2 Conv1d layers over (B, T, M)."""

    num_layers: int
    filters: Sequence[int]
    kernel_size: int
    norm: str
    act: str

    @nn.compact
    def __call__(self, x, x_len, train: bool):
        act = _act(self.act)
        for i in range(self.num_layers):
            x = Conv1d(
                self.filters[i], self.kernel_size, stride=2, padding="same",
                name=f"conv_{i}",
            )(x)
            if self.norm == "batch":
                x = batch_norm(train, name=f"bn_{i}")(x)
            elif self.norm == "layer":
                x = LayerNorm(name=f"ln_{i}")(x)
            x = act(x)
            if x_len is not None:
                x_len = (x_len - 1) // 2 + 1
        return x, x_len


class Conv2dSubsampling(nn.Module):
    """Stack of stride-2 3x3 Conv2d layers over (B, T, M, C), torch-equivalent
    explicit padding (k-1)//2 so out_len = (in_len - 1)//2 + 1 exactly
    (reference models/modules.py:201-249)."""

    num_layers: int
    filters: Sequence[int]
    kernel_size: int
    norm: str
    act: str
    flatten: bool = True

    @nn.compact
    def __call__(self, x, x_len, train: bool):
        act = _act(self.act)
        x = x[..., None]  # (B, T, M, 1)
        k = self.kernel_size
        p = (k - 1) // 2
        for i in range(self.num_layers):
            x = Conv2d(
                self.filters[i], (k, k), stride=(2, 2), padding=(p, p),
                name=f"conv_{i}",
            )(x)
            if self.norm == "batch":
                x = batch_norm(train, name=f"bn_{i}")(x)
            elif self.norm == "layer":
                x = LayerNorm(name=f"ln_{i}")(x)
            x = act(x)
            if x_len is not None:
                x_len = (x_len - 1) // 2 + 1
        if not self.flatten:
            return x, x_len      # (B, T, M, C): see layers.FlattenDense
        b, t, m, c = x.shape
        return x.reshape(b, t, m * c), x_len


def _max_pool_2d(x, window: Tuple[int, int], stride: Tuple[int, int], padding):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, window[0], window[1], 1),
        (1, stride[0], stride[1], 1),
        [(0, 0), padding[0], padding[1], (0, 0)],
    )


class Conv2dPoolSubsampling(nn.Module):
    """Conv2d (stride 1) + 3x3/2 max-pool per layer (reference
    models/modules.py:251-300)."""

    num_layers: int
    filters: Sequence[int]
    kernel_size: int
    norm: str
    act: str
    flatten: bool = True

    @nn.compact
    def __call__(self, x, x_len, train: bool):
        act = _act(self.act)
        x = x[..., None]
        k = self.kernel_size
        p = (k - 1) // 2
        for i in range(self.num_layers):
            x = Conv2d(self.filters[i], (k, k), stride=(1, 1), padding=(p, p),
                       name=f"conv_{i}")(x)
            x = _max_pool_2d(x, (3, 3), (2, 2), ((1, 1), (1, 1)))
            if self.norm == "batch":
                x = batch_norm(train, name=f"bn_{i}")(x)
            elif self.norm == "layer":
                x = LayerNorm(name=f"ln_{i}")(x)
            x = act(x)
            if x_len is not None:
                x_len = (x_len - 1) // 2 + 1
        if not self.flatten:
            return x, x_len      # (B, T, M, C): see layers.FlattenDense
        b, t, m, c = x.shape
        return x.reshape(b, t, m * c), x_len


class VGGSubsampling(nn.Module):
    """Two 3x3 convs + 2x2 max-pool per stage (reference models/modules.py:302-356).
    Note the VGG length formula is x_len // 2 per stage."""

    num_layers: int
    filters: Sequence[int]
    kernel_size: int
    norm: str
    act: str
    flatten: bool = True

    @nn.compact
    def __call__(self, x, x_len, train: bool):
        act = _act(self.act)
        x = x[..., None]
        k = self.kernel_size
        p = (k - 1) // 2
        for i in range(self.num_layers):
            for j in range(2):
                x = Conv2d(self.filters[i], (k, k), stride=(1, 1), padding=(p, p),
                           name=f"conv_{i}_{j}")(x)
                if self.norm == "batch":
                    x = batch_norm(train, name=f"bn_{i}_{j}")(x)
                elif self.norm == "layer":
                    x = LayerNorm(name=f"ln_{i}_{j}")(x)
                x = act(x)
            x = _max_pool_2d(x, (2, 2), (2, 2), ((0, 0), (0, 0)))
            if x_len is not None:
                x_len = x_len // 2
        if not self.flatten:
            return x, x_len      # (B, T, M, C): see layers.FlattenDense
        b, t, m, c = x.shape
        return x.reshape(b, t, m * c), x_len


SUBSAMPLING = {
    "Conv1d": Conv1dSubsampling,
    "Conv2d": Conv2dSubsampling,
    "Conv2dPool": Conv2dPoolSubsampling,
    "VGG": VGGSubsampling,
}


# ---------------------------------------------------------------------------
# Conformer modules
# ---------------------------------------------------------------------------


class FeedForwardModule(nn.Module):
    """LN -> Dense(ffn) -> act -> [drop] -> Dense(dim) -> drop
    (reference models/modules.py:362-395)."""

    dim_model: int
    dim_ffn: int
    dropout: float
    act: str = "swish"
    inner_dropout: bool = True
    vn_std: Optional[float] = None

    @nn.compact
    def __call__(self, x, train: bool):
        act = _act(self.act)
        y = LayerNorm(name="ln")(x)
        y = Dense(self.dim_ffn, name="fc1", vn_std=self.vn_std)(y)
        y = act(y)
        if self.inner_dropout:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = Dense(self.dim_model, name="fc2", vn_std=self.vn_std)(y)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class MultiHeadSelfAttentionModule(nn.Module):
    """Pre-LN + attention-variant selection + dropout
    (reference models/modules.py:397-488)."""

    dim_model: int
    num_heads: int
    dropout: float
    relative_pos_enc: bool = False
    causal: bool = False
    group_size: int = 1
    kernel_size: Optional[int] = None
    stride: int = 1
    linear_att: bool = False
    vn_std: Optional[float] = None

    @nn.compact
    def __call__(self, x, mask=None, hidden=None, train: bool = False):
        assert not (self.group_size > 1 and self.kernel_size is not None), (
            "Local grouped attention not implemented"
        )
        assert not (self.group_size > 1 and self.stride > 1), (
            "Strided grouped attention not implemented"
        )
        assert not (self.linear_att and self.relative_pos_enc), (
            "Linear attention requires absolute positional encodings"
        )
        y = LayerNorm(name="ln")(x)
        y, hidden = MultiHeadSelfAttention(
            dim_model=self.dim_model,
            num_heads=self.num_heads,
            causal=self.causal,
            group_size=self.group_size,
            kernel_size=self.kernel_size,
            stride=self.stride,
            linear_att=self.linear_att,
            relative_pos_enc=self.relative_pos_enc,
            vn_std=self.vn_std,
            name="mhsa",
        )(y, mask, hidden)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y, hidden


class ConvolutionModule(nn.Module):
    """LN -> pointwise(2E) -> GLU -> depthwise(k, stride) -> BN -> swish ->
    pointwise(E) -> drop (reference models/modules.py:490-525). The depthwise
    conv carries both the stage stride and the dim_model -> dim_expand width
    change of progressive downsampling."""

    dim_model: int
    dim_expand: int
    kernel_size: int
    dropout: float
    stride: int = 1
    causal: bool = False
    vn_std: Optional[float] = None

    @nn.compact
    def __call__(self, x, train: bool):
        y = LayerNorm(name="ln")(x)
        y = Dense(2 * self.dim_expand, name="pw1", vn_std=self.vn_std)(y)
        y = glu(y, axis=-1)
        y = Conv1d(
            self.dim_expand,
            self.kernel_size,
            stride=self.stride,
            padding="causal" if self.causal else "same",
            groups=self.dim_expand,
            name="dw",
            vn_std=self.vn_std,
        )(y)
        y = batch_norm(train, name="bn")(y)
        y = swish(y)
        y = Dense(self.dim_expand, name="pw2", vn_std=self.vn_std)(y)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


# ---------------------------------------------------------------------------
# SE / ContextNet extras (reference models/modules.py:531-647)
# ---------------------------------------------------------------------------


class SqueezeAndExcitationModule(nn.Module):
    reduction_ratio: int
    inner_act: str = "relu"

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = jnp.mean(x, axis=1, keepdims=True)
        scale = Dense(dim // self.reduction_ratio, name="fc1")(scale)
        scale = _act(self.inner_act)(scale)
        scale = Dense(dim, name="fc2")(scale)
        return x * jax.nn.sigmoid(scale)


class DepthwiseSeparableConv1d(nn.Module):
    features: int
    kernel_size: int
    stride: int = 1
    causal: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        in_ch = x.shape[-1]
        y = Conv1d(
            in_ch, self.kernel_size, stride=self.stride,
            padding="causal" if self.causal else "same",
            groups=in_ch, name="dw",
        )(x)
        y = Dense(self.features, name="pw")(y)
        y = batch_norm(train, name="bn")(y)
        return swish(y)


class ContextNetBlock(nn.Module):
    num_layers: int
    features: int
    kernel_size: int
    stride: int = 1
    causal: bool = False
    se_ratio: Optional[int] = None
    residual: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        y = x
        for i in range(self.num_layers):
            y = DepthwiseSeparableConv1d(
                self.features,
                self.kernel_size,
                stride=self.stride if i == self.num_layers - 1 else 1,
                causal=self.causal,
                name=f"conv_{i}",
            )(y, train)
        if self.se_ratio is not None:
            y = SqueezeAndExcitationModule(self.se_ratio, "swish", name="se")(y)
        if self.residual:
            r = Conv1d(self.features, 1, stride=self.stride, name="res")(x)
            r = batch_norm(train, name="res_bn")(r)
            y = swish(y + r)
        return y


class ContextNetSubsampling(nn.Module):
    """8-block SE-conv stack, blocks 3 and 7 strided (reference
    models/modules.py:568-595)."""

    dim_model: int
    kernel_size: int
    causal: bool = False

    @nn.compact
    def __call__(self, x, x_len, train: bool):
        for block_id in range(8):
            x = ContextNetBlock(
                num_layers=1 if block_id == 0 else 5,
                features=self.dim_model,
                kernel_size=self.kernel_size,
                stride=2 if block_id in (3, 7) else 1,
                causal=self.causal,
                se_ratio=None if block_id == 0 else 8,
                residual=block_id != 0,
                name=f"block_{block_id}",
            )(x, train)
        if x_len is not None:
            x_len = (x_len - 1) // 2 + 1
            x_len = (x_len - 1) // 2 + 1
        return x, x_len
