"""CTC loss as a log-space alpha recursion under lax.scan.

Replaces torch.nn.CTCLoss (reference models/losses.py:48-71). Blank id 0.
Returns the per-sample negative log likelihood (sum over the alignment
lattice); the caller takes the batch mean like the reference.

Shapes: log_probs (B, T, V) float; labels (B, U) int (0-padded);
f_len (B,), y_len (B,).

The per-state emission table emit[b, t, s] = log_probs[b, t, ext[b, s]] is
built as a one-hot MATMUL rather than take_along_axis: the gather lowers to
a slow per-element indexed load on TPU and — worse — its transpose is a
scatter-add back onto (B, T, V). Measured at the CTC Large training shape
(B=16, T=201, V=256, U=80) on v5e, the whole loss fwd+bwd is 13.0 ms with
the gather vs 2.1 ms with the one-hot matmul (the lax.scan lattice itself
was never the bottleneck: scan unroll made no difference). precision=
"highest" keeps the f32 dot exact-grade (each row has a single 1.0), at
negligible cost for this tiny contraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG_EPS = -1e30


def ctc_loss(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    f_len: jnp.ndarray,
    y_len: jnp.ndarray,
    blank: int = 0,
) -> jnp.ndarray:
    """Per-sample CTC negative log likelihood, shape (B,)."""
    b, t_max, v = log_probs.shape
    u_max = labels.shape[1]
    s = 2 * u_max + 1  # extended label states: blank y1 blank y2 ... blank

    # Extended label sequence per state: even states are blank, odd are labels.
    ext = jnp.full((b, s), blank, dtype=labels.dtype)
    ext = ext.at[:, 1::2].set(labels)

    # Skip-transition allowed from state s-2 when it is a label state with a
    # different label (standard CTC big-jump rule).
    prev2 = jnp.concatenate([jnp.full((b, 2), blank, labels.dtype), ext[:, :-2]], axis=1)
    can_skip = (jnp.arange(s) % 2 == 1)[None, :] & (ext != prev2)
    skip_mask = jnp.where(can_skip, 0.0, LOG_EPS)

    # Valid states: s < 2*y_len + 1
    state_valid = jnp.arange(s)[None, :] < (2 * y_len + 1)[:, None]

    # Emission log-probs per state per frame: (B, T, S) via one-hot matmul
    # (gather forward + scatter backward are ~6x slower on TPU; see module
    # docstring)
    onehot = jax.nn.one_hot(ext, v, dtype=log_probs.dtype)
    emit = jnp.einsum("btv,bsv->bts", log_probs, onehot, precision="highest")

    alpha0 = jnp.full((b, s), LOG_EPS)
    alpha0 = alpha0.at[:, 0].set(emit[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(jnp.where(y_len > 0, emit[:, 0, 1], LOG_EPS))

    def shift1(a):
        return jnp.concatenate([jnp.full((b, 1), LOG_EPS), a[:, :-1]], axis=1)

    def shift2(a):
        return jnp.concatenate([jnp.full((b, 2), LOG_EPS), a[:, :-2]], axis=1)

    def step(alpha, t):
        stay = alpha
        diag = shift1(alpha)
        skip = shift2(alpha) + skip_mask
        new = jnp.logaddexp(jnp.logaddexp(stay, diag), skip) + emit[:, t]
        new = jnp.where(state_valid, new, LOG_EPS)
        # freeze finished sequences
        new = jnp.where((t < f_len)[:, None], new, alpha)
        return new, None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, t_max))

    # Final probability: last blank state (2*y_len) + last label state (2*y_len - 1)
    idx_last = 2 * y_len
    final_blank = jnp.take_along_axis(alpha, idx_last[:, None], axis=1)[:, 0]
    idx_lab = jnp.maximum(2 * y_len - 1, 0)
    final_label = jnp.take_along_axis(alpha, idx_lab[:, None], axis=1)[:, 0]
    final_label = jnp.where(y_len > 0, final_label, LOG_EPS)
    return -jnp.logaddexp(final_blank, final_label)
