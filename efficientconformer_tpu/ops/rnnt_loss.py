"""RNN-T (transducer) loss as a diagonal-wavefront lattice scan.

TPU-native replacement for the warp_rnnt CUDA extension (reference
models/losses.py:22-46; blank id 0, gather formulation, mean over batch).

The (T, U+1) alpha recursion
    alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
                            alpha[t, u-1] + emit[t, u-1])
is sequential along both axes but constant along anti-diagonals d = t + u, so we
scan over the T+U diagonals with all states of a diagonal updated in one
vectorised step. The skewed coordinates beta[d, u] = alpha[d-u, u] turn the
recursion into
    beta[d, u] = logaddexp(beta[d-1, u] + blankS[d-1, u],
                           beta[d-1, u-1] + emitS[d-1, u-1])
with blankS/emitS the same skew of the gathered log-probs, built once by a
take_along_axis gather. Total log-likelihood: alpha[T-1, U] + blank[T-1, U].

Only the (blank, emit) pair (B, T, U+1, 2) is carried through the recursion —
the full (B, T, U+1, V) log-softmax is reduced immediately after gathering,
keeping HBM traffic down (the warp_rnnt ``gather=True`` trick).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG_EPS = -1e30


def _skew(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, U1) -> (B, T+U1-1, U1) with out[d, u] = x[d-u, u] (LOG_EPS outside)."""
    b, t, u1 = x.shape
    d = jnp.arange(t + u1 - 1)[:, None]
    u = jnp.arange(u1)[None, :]
    idx = d - u
    valid = (idx >= 0) & (idx < t)
    gathered = jnp.take_along_axis(
        x, jnp.broadcast_to(jnp.clip(idx, 0, t - 1)[None], (b, t + u1 - 1, u1)), axis=1
    )
    return jnp.where(valid[None], gathered, LOG_EPS)


def rnnt_loss_from_gathered(
    blank_lp: jnp.ndarray,   # (B, T, U+1) log P(blank | t, u)
    emit_lp: jnp.ndarray,    # (B, T, U+1) log P(y_{u+1} | t, u); last column unused
    f_len: jnp.ndarray,      # (B,)
    y_len: jnp.ndarray,      # (B,)
) -> jnp.ndarray:
    """Per-sample negative log likelihood, shape (B,)."""
    b, t_max, u1 = blank_lp.shape
    n_diag = t_max + u1 - 1

    blank_s = _skew(blank_lp)
    emit_s = _skew(emit_lp)

    beta0 = jnp.full((b, u1), LOG_EPS).at[:, 0].set(0.0)

    def step(beta, d):
        stay = beta + blank_s[:, d - 1]
        shifted = jnp.concatenate([jnp.full((b, 1), LOG_EPS), beta[:, :-1]], axis=1)
        emit_prev = jnp.concatenate(
            [jnp.full((b, 1), LOG_EPS), emit_s[:, d - 1, :-1]], axis=1
        )
        new = jnp.logaddexp(stay, shifted + emit_prev)
        # state (d, u) only exists for u <= d and d - u < T
        u = jnp.arange(u1)[None, :]
        valid = (u <= d) & (d - u < t_max)
        new = jnp.where(valid, new, LOG_EPS)
        return new, new

    _, betas = jax.lax.scan(step, beta0, jnp.arange(1, n_diag))
    # betas: (n_diag - 1, B, U1); prepend beta0 -> beta[d] for d in 0..n_diag-1
    betas = jnp.concatenate([beta0[None], betas], axis=0)

    # ll = alpha[f_len-1, y_len] + blank[f_len-1, y_len]
    d_final = f_len - 1 + y_len                          # (B,)
    alpha_final = betas[d_final, jnp.arange(b), y_len]
    last_blank = blank_lp[jnp.arange(b), f_len - 1, y_len]
    return -(alpha_final + last_blank)


def rnnt_loss(
    logits: jnp.ndarray,     # (B, T, U+1, V)
    labels: jnp.ndarray,     # (B, U) int, 0-padded
    f_len: jnp.ndarray,
    y_len: jnp.ndarray,
    blank: int = 0,
) -> jnp.ndarray:
    """Per-sample RNN-T negative log likelihood from raw joint logits.

    Only the log-normaliser (B, T, U+1) and the two gathered rows are formed —
    the full (B, T, U+1, V) log-softmax is never materialised (its gradient is,
    necessarily; XLA fuses that into one recompute pass in the backward).
    """
    logits = logits.astype(jnp.float32)
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1))
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m[..., None]), axis=-1))
    blank_lp = logits[..., blank] - lse
    # emit[t, u] = lp[t, u, y_{u+1}]; pad labels with a dummy for the last column
    lab = jnp.concatenate([labels, jnp.zeros_like(labels[:, :1])], axis=1)  # (B, U+1)
    emit_lp = (
        jnp.take_along_axis(logits, lab[:, None, :, None], axis=3)[..., 0] - lse
    )
    import os

    if os.environ.get("ECF_PALLAS_RNNT") == "1" and jax.default_backend() not in ("cpu",):
        # Pallas wavefront kernels (alpha fwd + beta/grad bwd), kept behind a
        # flag: measured on v5e they are perf-NEUTRAL to slightly slower than
        # the scan below (fwd 1.0-1.1x, grad 0.83-1.0x at B=16-64, T=126-201,
        # U=90-140 — scripts/rnnt_profile.py; both are dominated by fixed
        # per-diagonal costs), so the simpler XLA scan is the default.
        from efficientconformer_tpu.ops.pallas_rnnt import (
            rnnt_loss_from_gathered_pallas,
        )

        return rnnt_loss_from_gathered_pallas(blank_lp, emit_lp, f_len, y_len)
    return rnnt_loss_from_gathered(blank_lp, emit_lp, f_len, y_len)
