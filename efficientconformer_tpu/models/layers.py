"""Primitive layers (flax.linen) with variational-noise support.

Counterparts of reference models/layers.py and models/activations.py. Every
weight-bearing layer accepts an optional ``vn_std``; when the caller provides a
``vn`` PRNG collection at apply time, N(0,1) noise scaled by vn_std is added to
the weights (variational/synaptic noise regularisation). On TPU the per-replica
PRNG key is identical by construction (same key on every shard of the jit
program), which replaces the reference's rank-0 broadcast
(models/layers.py:48-55).

Initialisation matches PyTorch defaults (kaiming-uniform kernels with
1/sqrt(fan_in) bias bounds) so that training dynamics are comparable.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


def glu(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def _maybe_add_vn(mdl: nn.Module, w: jnp.ndarray, vn_std: Optional[float], name: str) -> jnp.ndarray:
    """Add variational noise to a weight if a 'vn' rng is provided."""
    if vn_std and mdl.has_rng("vn"):
        noise = jax.random.normal(mdl.make_rng("vn"), w.shape, w.dtype)
        w = w + jnp.asarray(vn_std, w.dtype) * noise
    return w


class Dense(nn.Module):
    """Linear layer, y = x W + b, torch-default init, optional VN."""

    features: int
    use_bias: bool = True
    vn_std: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param("kernel", _uniform_init(bound), (fan_in, self.features))
        kernel = _maybe_add_vn(self, kernel, self.vn_std, "kernel")
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", _uniform_init(bound), (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class FlattenDense(nn.Module):
    """Dense over the flattened trailing (freq, channel) axes of a 4-D
    subsampling output, applied as a 1xM VALID convolution on the
    UNFLATTENED (B, T, M, C) tensor.

    Parameters are identical to ``Dense(features)`` on ``reshape(b, t, m*c)``
    — kernel (M*C, features) with flatten index m*C + c, same init, same
    checkpoint tree — and so is the math (the conv kernel is the Dense kernel
    reshaped (1, M, C, features)). The difference is purely physical: on TPU
    the explicit (B,T,M,C)->(B,T,M*C) reshape between a conv output layout
    and a matmul operand lowered to ~1.5 GB/step of layout copies at the
    encoder input boundary (CTC Large b=8x16s, HLO attribution
    'encoder/subsampling/reshape'); feeding the conv layout straight into
    another conv avoids the round trip."""

    features: int
    use_bias: bool = True
    vn_std: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, m, c = x.shape
        fan_in = m * c
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param("kernel", _uniform_init(bound), (fan_in, self.features))
        kernel = _maybe_add_vn(self, kernel, self.vn_std, "kernel")
        k4 = kernel.reshape(1, m, c, self.features).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, k4, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[:, :, 0, :]
        if self.use_bias:
            bias = self.param("bias", _uniform_init(bound), (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class Conv1d(nn.Module):
    """1D convolution over (B, T, C), with 'same'/'causal'/'valid' pre-padding
    (reference models/layers.py:69-136) and optional VN."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: str = "same"  # same | causal | valid
    groups: int = 1
    use_bias: bool = True
    vn_std: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * self.kernel_size
        bound = 1.0 / math.sqrt(fan_in)
        # kernel layout: (width, in_ch/groups, out_ch)
        kernel = self.param(
            "kernel", _uniform_init(bound), (self.kernel_size, in_ch // self.groups, self.features)
        )
        kernel = _maybe_add_vn(self, kernel, self.vn_std, "kernel")
        if self.padding == "same":
            pad = [((self.kernel_size - 1) // 2, (self.kernel_size - 1) // 2)]
        elif self.padding == "causal":
            pad = [(self.kernel_size - 1, 0)]
        else:
            pad = [(0, 0)]
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.stride,),
            padding=pad,
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            bias = self.param("bias", _uniform_init(bound), (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class Conv2d(nn.Module):
    """2D convolution over (B, H, W, C) with explicit torch-style padding."""

    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    vn_std: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        fan_in = in_ch * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param("kernel", _uniform_init(bound), (kh, kw, in_ch, self.features))
        kernel = _maybe_add_vn(self, kernel, self.vn_std, "kernel")
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=self.stride,
            padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", _uniform_init(bound), (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class Embedding(nn.Module):
    """Token embedding with padding_idx=0 semantics (index 0 embeds to zeros,
    like torch's padding_idx which pins that row at its zero init)."""

    num_embeddings: int
    features: int
    pad_idx: Optional[int] = 0
    vn_std: Optional[float] = None

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding", nn.initializers.normal(stddev=1.0), (self.num_embeddings, self.features)
        )
        table = _maybe_add_vn(self, table, self.vn_std, "embedding")
        y = jnp.take(table, ids, axis=0)
        if self.pad_idx is not None:
            y = y * (ids != self.pad_idx)[..., None].astype(y.dtype)
        return y


class LSTM(nn.Module):
    """Multi-layer unidirectional LSTM over (B, T, D) with torch gate order
    (i, f, g, o) and per-layer (w_ih, w_hh, b_ih, b_hh) parameters, optional VN
    on the two weight matrices (reference models/layers.py:184-266).

    Exposes both a full-sequence scan and a single-step API through the carry:
    carry is a tuple (h, c) each (num_layers, B, H).
    """

    hidden_size: int
    num_layers: int = 1
    vn_std: Optional[float] = None

    def _params(self, layer: int, input_size: int):
        h = self.hidden_size
        bound = 1.0 / math.sqrt(h)
        w_ih = self.param(f"w_ih_l{layer}", _uniform_init(bound), (input_size, 4 * h))
        w_hh = self.param(f"w_hh_l{layer}", _uniform_init(bound), (h, 4 * h))
        b_ih = self.param(f"b_ih_l{layer}", _uniform_init(bound), (4 * h,))
        b_hh = self.param(f"b_hh_l{layer}", _uniform_init(bound), (4 * h,))
        w_ih = _maybe_add_vn(self, w_ih, self.vn_std, "w_ih")
        w_hh = _maybe_add_vn(self, w_hh, self.vn_std, "w_hh")
        return w_ih, w_hh, b_ih, b_hh

    @staticmethod
    def _cell(w_ih, w_hh, b_ih, b_hh, x, h, c):
        gates = x @ w_ih + h @ w_hh + b_ih + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return h, c

    def init_carry(self, batch: int, dtype=jnp.float32):
        shape = (self.num_layers, batch, self.hidden_size)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray, carry=None):
        """x (B, T, D) -> (out (B, T, H), (h, c))."""
        b, t, _ = x.shape
        if carry is None:
            carry = self.init_carry(b, x.dtype)
        h0, c0 = carry
        params = []
        input_size = x.shape[-1]
        for l in range(self.num_layers):
            params.append(tuple(p.astype(x.dtype) for p in self._params(l, input_size)))
            input_size = self.hidden_size

        def step(carry, x_t):
            hs, cs = carry
            new_h, new_c = [], []
            inp = x_t
            for l, (w_ih, w_hh, b_ih, b_hh) in enumerate(params):
                h, c = self._cell(w_ih, w_hh, b_ih, b_hh, inp, hs[l], cs[l])
                new_h.append(h)
                new_c.append(c)
                inp = h
            return (jnp.stack(new_h), jnp.stack(new_c)), inp

        (hT, cT), out = jax.lax.scan(step, (h0, c0), jnp.moveaxis(x, 1, 0))
        return jnp.moveaxis(out, 0, 1), (hT, cT)


class IdentityProjection(nn.Module):
    """Project by concatenating the input with a learned projection of itself
    (reference models/layers.py:307-323; ContextNet helper)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_f = x.shape[-1]
        assert self.features > in_f
        proj = Dense(self.features - in_f, name="linear")(x)
        return jnp.concatenate([x, proj], axis=-1)


class LayerNorm(nn.LayerNorm):
    """LayerNorm with the reference epsilon (1e-6).

    The output is cast back to the INPUT dtype: flax's default dtype=None
    promotes bf16 activations against the f32 scale/bias to an f32 output,
    which silently re-upcasts the whole residual stream (and with it the
    entire backward pass) after every norm under the bf16 mixed-precision
    policy. Mean/variance are still computed in f32 (flax always promotes
    the statistics), so this only rounds the normalised output — and keeps
    the step HBM traffic in bf16, which is what mixed_precision is for.
    In full fp32 the cast is a no-op, so torch parity is unaffected.
    """

    epsilon: float = 1e-6

    def __call__(self, x):
        return super().__call__(x).astype(x.dtype)


class BatchNorm(nn.BatchNorm):
    """BatchNorm whose output follows the input dtype (see LayerNorm)."""

    def __call__(self, x, use_running_average=None):
        return super().__call__(x, use_running_average).astype(x.dtype)


def batch_norm(train: bool, name: str = None, momentum: float = 0.9, epsilon: float = 1e-5):
    """BatchNorm matching torch defaults. Under jit with a batch-sharded mesh the
    statistics are global means over the full logical batch, which subsumes the
    reference's SyncBatchNorm (reference model_ctc.py:73)."""
    return BatchNorm(
        use_running_average=not train, momentum=momentum, epsilon=epsilon, name=name
    )
