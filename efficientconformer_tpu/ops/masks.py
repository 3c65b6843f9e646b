"""Attention masks, computed from sequence lengths with static shapes.

Convention (shared with the reference, models/attentions.py:1321-1403): masks are
float tensors where 1.0 marks a *masked* (disallowed) position and 0.0 an
attendable one; they are applied additively as ``scores += mask * -1e9``.

The reference builds padding masks with a per-sample Python loop; here everything
is broadcasted iota comparisons so the mask generation itself fuses into the
attention kernel under jit.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def padding_mask(seq_len: int, x_len: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """(B,) lengths -> (B, 1, 1, T) float mask, 1.0 at padded key positions."""
    if x_len is None:
        return None
    idx = jnp.arange(seq_len)
    mask = (idx[None, :] >= x_len[:, None]).astype(jnp.float32)
    return mask[:, None, None, :]


def look_ahead_mask(seq_len: int, x_len: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Causal + padding mask: (B or 1, 1, T, T)."""
    return streaming_mask(seq_len, x_len, left_context=seq_len, right_context=0)


def streaming_mask(
    seq_len: int,
    x_len: Optional[jnp.ndarray],
    left_context: int,
    right_context: int,
) -> jnp.ndarray:
    """Window + padding mask: (B or 1, 1, T, T).

    Query position i may attend keys j with i - left_context <= j <= i +
    right_context (and j < x_len). With left = right = max_pos_encoding this
    degenerates to a pure padding mask, which is the encoder default
    (reference models/encoders.py:68).
    """
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    window = (j > i + right_context) | (j < i - left_context)
    window = window.astype(jnp.float32)[None, None, :, :]
    pad = padding_mask(seq_len, x_len)
    if pad is None:
        return window
    return jnp.maximum(window, pad)


def local_block_diagonal(mask: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Extract the diagonal K x K blocks of a (B, 1, T, T) mask.

    Returns (B, T // K, 1, K, K) — the per-block masks used by local attention
    (reference models/attentions.py:259-263 does this with a Python loop + stack).
    """
    b, h, tq, tk = mask.shape
    n = tk // kernel_size
    if tq == 1:
        # padding-only mask: block along keys, broadcast over in-block queries
        return mask.reshape(b, h, 1, n, kernel_size).transpose(0, 3, 1, 2, 4)
    blocks = mask.reshape(b, h, n, kernel_size, n, kernel_size)
    # diagonal over the two block axes -> (B, H, K, K, N)
    diag = jnp.diagonal(blocks, axis1=2, axis2=4)
    # -> (B, N, H, K, K)
    return jnp.moveaxis(diag, -1, 1)


def pad_to_multiple(
    x: jnp.ndarray, chunk: int, axis: int = 1
) -> tuple[jnp.ndarray, int]:
    """Zero-pad ``axis`` of x up to the next multiple of ``chunk``.

    Returns (padded, padding_amount). Static-shape equivalent of the reference's
    ``MultiHeadAttention.pad`` (models/attentions.py:107-138).
    """
    length = x.shape[axis]
    pad = (-length) % chunk
    if pad == 0:
        return x, 0
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), pad


def pad_mask_to_multiple(mask: Optional[jnp.ndarray], chunk: int) -> Optional[jnp.ndarray]:
    """Pad the last (and, if square, second-to-last) axis of an attention mask to
    a multiple of ``chunk`` with 1.0 (masked)."""
    if mask is None:
        return None
    t_k = mask.shape[-1]
    pad_k = (-t_k) % chunk
    if pad_k == 0:
        return mask
    if mask.shape[-2] == 1:
        return jnp.pad(mask, ((0, 0), (0, 0), (0, 0), (0, pad_k)), constant_values=1.0)
    pad_q = (-mask.shape[-2]) % chunk
    return jnp.pad(
        mask, ((0, 0), (0, 0), (0, pad_q), (0, pad_k)), constant_values=1.0
    )
