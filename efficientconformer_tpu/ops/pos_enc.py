"""Sinusoidal positional encodings: absolute, relative, grouped-relative.

Reference semantics: models/attentions.py:1163-1315. Instead of materialising a
(2*max_len-1, D) table and slicing it, we compute the relative *position values*
for the requested window directly and evaluate sin/cos on just that window —
equivalent by construction, and avoids baking a 20k x 720 constant into every
compiled program.
"""

from __future__ import annotations

import jax.numpy as jnp


def _sinusoid(pos: jnp.ndarray, dim: int) -> jnp.ndarray:
    """pos (L,) -> (L, dim): interleaved sin/cos of pos / 10000^(2i/dim)."""
    i = jnp.arange(dim // 2, dtype=jnp.float32)
    angles = pos[:, None].astype(jnp.float32) / (10000.0 ** (2.0 * i[None, :] / dim))
    pe = jnp.zeros((pos.shape[0], dim), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles))
    return pe


def absolute_encoding(seq_len: int, dim: int) -> jnp.ndarray:
    """(T, dim) absolute sinusoidal encoding (Vaswani et al.)."""
    return _sinusoid(jnp.arange(seq_len, dtype=jnp.float32), dim)


def relative_encoding(
    seq_len: int, dim: int, hidden_len: int = 0, causal: bool = False
) -> jnp.ndarray:
    """Relative sinusoidal encoding window.

    Full context: positions seq_len-1+hidden_len ... -(seq_len-1), shape
    (hidden_len + 2*seq_len - 1, dim). Causal: positions
    seq_len-1+hidden_len ... 0, shape (hidden_len + seq_len, dim).
    Matches slicing of the reference's RelativeSinusoidalPositionalEncoding
    (models/attentions.py:1233-1257).
    """
    start = seq_len - 1 + hidden_len
    stop = 0 if causal else -(seq_len - 1)
    pos = jnp.arange(start, stop - 1, -1, dtype=jnp.float32)
    return _sinusoid(pos, dim)


def grouped_relative_encoding(
    seq_len: int,
    dim: int,
    group_size: int,
    hidden_len: int = 0,
    causal: bool = False,
) -> jnp.ndarray:
    """Grouped relative sinusoidal encoding window.

    Full context covers hidden_len + 2*seq_len - group_size positions: from
    seq_len - 1 - G//2 + hidden_len down to -(seq_len - G//2 - (1 - G%2)).
    After the G-fold feature grouping in grouped attention this yields
    hidden_len//G + 2*(seq_len//G) - 1 grouped positions. Matches the
    reference's GroupedRelativeSinusoidalPositionalEncoding slice
    (models/attentions.py:1293-1315).
    """
    g = group_size
    # Build the same (2L - G%2)-entry position table as the reference, with the
    # table half-width L shrunk to the window actually needed. NB for even G the
    # table contains position 0 twice (once in each half), so this is not a
    # plain arange.
    lmax = seq_len + hidden_len
    pos = jnp.concatenate(
        [
            jnp.arange(lmax - 1, g % 2 - 1, -1, dtype=jnp.float32),
            jnp.arange(0, -lmax, -1, dtype=jnp.float32),
        ]
    )
    if causal:
        window = pos[lmax - seq_len - hidden_len : lmax]
    else:
        window = pos[
            lmax - seq_len + g // 2 - hidden_len : lmax - g % 2 + seq_len - g // 2
        ]
    return _sinusoid(window, dim)
