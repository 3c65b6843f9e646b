"""Attention math as pure jnp functions.

The projection layers live in ``models.attentions``; everything here operates on
already-projected tensors, so each piece is unit-testable against a naive gather
implementation and swappable for a Pallas kernel.

Score convention: additive float masks (1.0 = masked) applied as
``scores + mask * -1e9`` before softmax, matching reference
models/attentions.py throughout.

rel_to_abs: relative-by-query indexed scores -> absolute-by-absolute, via the
pad/flatten/reshape/slice skewing trick (Music Transformer for causal, Bello et
al. for full context). Reference: models/attentions.py:483-547 (plain),
742-801 (local), 884-939 (strided), 1033-1087 (strided local). The local
variants in the reference reshape (B, H, T, L) directly to (B, T/K, H, K, L),
which scrambles the head and block axes for H > 1; we implement the intended
semantics (reshape the T axis, then transpose) instead of replicating that bug.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

NEG_INF = -1e9


# ---------------------------------------------------------------------------
# rel_to_abs skewing
# ---------------------------------------------------------------------------


def rel_to_abs_full(scores: jnp.ndarray) -> jnp.ndarray:
    """(..., T, Th + 2T - 1) rel-indexed -> (..., T, Th + T) abs-indexed.

    Column l of the input corresponds to relative offset (T - 1 + Th) - l
    (most-distant-past first). Output column j is the score for absolute key
    position j.
    """
    *lead, t, l = scores.shape
    s = jnp.pad(scores, [(0, 0)] * len(lead) + [(0, 0), (0, 1)])
    s = s.reshape(*lead, t * (l + 1))
    s = jnp.pad(s, [(0, 0)] * len(lead) + [(0, l - t)])
    s = s.reshape(*lead, t + 1, l)
    return s[..., :t, t - 1 :]


def rel_to_abs_causal(scores: jnp.ndarray) -> jnp.ndarray:
    """(..., T, Th + T) rel-indexed (causal) -> (..., T, Th + T) abs-indexed."""
    *lead, t, l = scores.shape
    s = jnp.pad(scores, [(0, 0)] * len(lead) + [(0, 0), (1, 0)])
    s = s.reshape(*lead, t * (l + 1))
    s = jnp.pad(s, [(0, 0)] * len(lead) + [(l - t, 0)])
    s = s.reshape(*lead, t + 1, l)
    return s[..., 1:, :]


def rel_to_abs_strided_full(scores: jnp.ndarray, stride: int) -> jnp.ndarray:
    """(..., T//S, Th + 2T - 1) -> (..., T//S, Th + T) for strided queries.

    Query q sits at absolute position q*S; consecutive query rows shift by S
    key positions, so the skew advances S columns per row.
    """
    *lead, tq, l = scores.shape
    s = jnp.pad(scores, [(0, 0)] * len(lead) + [(0, 0), (0, stride)])
    s = s.reshape(*lead, tq * (l + stride))
    s = jnp.pad(s, [(0, 0)] * len(lead) + [(0, l - tq * stride)])
    s = s.reshape(*lead, tq + 1, l)
    return s[..., :tq, tq * stride - 1 :]


def rel_to_abs_strided_causal(scores: jnp.ndarray, stride: int) -> jnp.ndarray:
    """(..., T//S, Th + T) -> (..., T//S, Th + T), causal strided queries."""
    *lead, tq, l = scores.shape
    s = jnp.pad(scores, [(0, 0)] * len(lead) + [(0, 0), (1, stride - 1)])
    s = s.reshape(*lead, tq * (l + stride))
    s = jnp.pad(s, [(0, 0)] * len(lead) + [(l - stride * tq, 0)])
    s = s.reshape(*lead, tq + 1, l)
    return s[..., 1:, :]


def rel_to_abs_local_full(scores: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """(B, H, T, 2K - 1) -> (B, T//K, H, K, K) for block-local attention.

    Each query attends within its own block of K keys; rel offsets span
    (K-1 ... -(K-1)).
    """
    b, h, t, l = scores.shape
    k = kernel_size
    n = t // k
    # (B, H, N, K, 2K-1) -> (B, N, H, K, 2K-1)
    s = scores.reshape(b, h, n, k, l).transpose(0, 2, 1, 3, 4)
    s = jnp.pad(s, ((0, 0), (0, 0), (0, 0), (0, 0), (0, 1)))
    s = s.reshape(b, n, h, k * 2 * k)
    s = jnp.pad(s, ((0, 0), (0, 0), (0, 0), (0, k - 1)))
    s = s.reshape(b, n, h, k + 1, l)
    return s[:, :, :, :k, k - 1 :]


def rel_to_abs_local_causal(scores: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """(B, H, T, K) -> (B, T//K, H, K, K), causal block-local."""
    b, h, t, l = scores.shape
    k = kernel_size
    n = t // k
    s = scores.reshape(b, h, n, k, l).transpose(0, 2, 1, 3, 4)
    s = jnp.pad(s, ((0, 0), (0, 0), (0, 0), (0, 0), (1, 0)))
    s = s.reshape(b, n, h, k + 1, k)
    return s[:, :, :, 1:]


def rel_to_abs_strided_local_full(
    scores: jnp.ndarray, kernel_size: int, stride: int
) -> jnp.ndarray:
    """(B, H, T//S, 2K - 1) -> (B, T//K, H, K//S, K), strided block-local."""
    b, h, tq, l = scores.shape
    k, s_ = kernel_size, stride
    kq = k // s_
    n = tq // kq
    s = scores.reshape(b, h, n, kq, l).transpose(0, 2, 1, 3, 4)
    s = jnp.pad(s, ((0, 0), (0, 0), (0, 0), (0, 0), (0, s_)))
    s = s.reshape(b, n, h, kq * (l + s_))
    s = jnp.pad(s, ((0, 0), (0, 0), (0, 0), (0, k - 1)))
    s = s.reshape(b, n, h, kq + 1, l)
    return s[:, :, :, :kq, k - 1 :]


def rel_to_abs_strided_local_causal(
    scores: jnp.ndarray, kernel_size: int, stride: int
) -> jnp.ndarray:
    """(B, H, T//S, K) -> (B, T//K, H, K//S, K), causal strided block-local."""
    b, h, tq, l = scores.shape
    k, s_ = kernel_size, stride
    kq = k // s_
    n = tq // kq
    s = scores.reshape(b, h, n, kq, l).transpose(0, 2, 1, 3, 4)
    s = jnp.pad(s, ((0, 0), (0, 0), (0, 0), (0, 0), (1, s_ - 1)))
    s = s.reshape(b, n, h, kq + 1, k)
    return s[:, :, :, 1:]


# ---------------------------------------------------------------------------
# Attention primitives
# ---------------------------------------------------------------------------


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, T, D) -> (B, H, T, D/H)."""
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, d) -> (B, T, H*d)."""
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def group_time(x: jnp.ndarray, num_heads: int, group_size: int) -> jnp.ndarray:
    """(B, T, D) -> (B, H, T/G, G*D/H): fold G neighbouring frames into the
    head dimension (grouped attention, reference models/attentions.py:176-178)."""
    b, t, d = x.shape
    dim_head = group_size * d // num_heads
    return x.reshape(b, t * d // (num_heads * dim_head), num_heads, dim_head).transpose(
        0, 2, 1, 3
    )


def ungroup_time(x: jnp.ndarray, dim_model: int) -> jnp.ndarray:
    """(B, H, T/G, G*D/H) -> (B, T, D)."""
    b, h, tg, dg = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, (tg * h * dg) // dim_model, dim_model)


def softmax_attention(
    scores: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply additive mask, softmax in fp32, weight values.

    scores (..., Tq, Tk), v (..., Tk, d), mask broadcastable to scores.
    Returns (output (..., Tq, d), weights).
    """
    if mask is not None:
        scores = scores + mask * NEG_INF
    dtype = scores.dtype
    w = jnp.asarray(
        jnp.exp(
            jnp.asarray(scores, jnp.float32)
            - jnp.max(jnp.asarray(scores, jnp.float32), axis=-1, keepdims=True)
        )
    )
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    w = w.astype(dtype)
    return jnp.matmul(w, v), w
