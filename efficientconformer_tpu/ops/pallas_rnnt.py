"""RNN-T lattice as Pallas wavefront kernels.

The (T, U+1) alpha/beta recursions are sequential along anti-diagonals; under
XLA's lax.scan each of the ~T+U diagonal updates is a separate loop iteration
with kernel-dispatch overhead. Here the whole wavefront runs inside a single
Pallas kernel: the diagonal state lives in VMEM registers, one fori_loop step
per diagonal, batch vectorised across sublanes and the U axis across lanes
(one VPU op per diagonal).

Coordinates are skewed like ops/rnnt_loss.py: xS[d, u] = x[d-u, u]. The
forward kernel emits all alpha diagonals (needed by the backward); the
backward kernel runs the beta recursion top-down and emits the analytic
gradients
    d ll / d blank[t,u] = exp(alpha[t,u] + blank[t,u] + beta[t+1,u] - ll)
    d ll / d emit[t,u]  = exp(alpha[t,u] + emit[t,u] + beta[t,u+1] - ll)
(the warp_rnnt formulation, reference models/losses.py:36-44), with
beta[t+1,u] := 0 at the terminal cell (t,u) = (f_len-1, y_len).

Used through ``rnnt_loss_from_gathered_pallas`` (a custom_vjp); ops/rnnt_loss
keeps the pure-jnp scan as the executable specification and CPU fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_EPS = -1e30
LANE = 128
SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _skew_t(x: jnp.ndarray, n_diag: int) -> jnp.ndarray:
    """(B, T, U1) -> (n_diag, B, U1) with out[d, :, u] = x[:, d-u, u]."""
    b, t, u1 = x.shape
    d = jnp.arange(n_diag)[:, None]
    u = jnp.arange(u1)[None, :]
    idx = d - u
    valid = (idx >= 0) & (idx < t)
    g = jnp.take_along_axis(
        x, jnp.broadcast_to(jnp.clip(idx, 0, t - 1)[None], (b, n_diag, u1)), axis=1
    )
    out = jnp.where(valid[None], g, LOG_EPS)
    return jnp.moveaxis(out, 1, 0)


def _unskew_t(xs: jnp.ndarray, t: int) -> jnp.ndarray:
    """(n_diag, B, U1) -> (B, T, U1) with out[:, t, u] = xs[t+u, :, u]."""
    n_diag, b, u1 = xs.shape
    xs = jnp.moveaxis(xs, 0, 1)  # (B, n_diag, U1)
    tt = jnp.arange(t)[:, None]
    u = jnp.arange(u1)[None, :]
    idx = tt + u  # < t + u1 - 1 + 1 = n_diag
    return jnp.take_along_axis(
        xs, jnp.broadcast_to(idx[None], (b, t, u1)), axis=1
    )


def _row_iota(b: int, u1p: int):
    # Mosaic iota must be integer-typed; cast to f32 for the mask arithmetic
    return jax.lax.broadcasted_iota(jnp.int32, (b, u1p), 1).astype(jnp.float32)


def _fwd_kernel(blank_ref, emit_ref, alphas_ref, *, t_max: int, n_diag: int):
    b, u1p = blank_ref.shape[1], blank_ref.shape[2]
    u = _row_iota(b, u1p)
    init = jnp.where(u == 0, 0.0, LOG_EPS)
    alphas_ref[0] = init

    def body(d, prev):
        df = d.astype(jnp.float32)
        stay = prev + blank_ref[d - 1]
        shifted = pltpu.roll(prev, 1, axis=1)
        emit_prev = pltpu.roll(emit_ref[d - 1], 1, axis=1)
        col0 = u == 0
        shifted = jnp.where(col0, LOG_EPS, shifted)
        emit_prev = jnp.where(col0, LOG_EPS, emit_prev)
        new = jnp.logaddexp(stay, shifted + emit_prev)
        valid = (u <= df) & (df - u < t_max)
        new = jnp.where(valid, new, LOG_EPS)
        alphas_ref[d] = new
        return new

    jax.lax.fori_loop(1, n_diag, body, init)


def _bwd_kernel(
    blank_ref, emit_ref, alphas_ref, flen_ref, ylen_ref, ll_ref,
    gblank_ref, gemit_ref, *, t_max: int, n_diag: int,
):
    b, u1p = blank_ref.shape[1], blank_ref.shape[2]
    u = _row_iota(b, u1p)
    flen = flen_ref[0]
    ylen = ylen_ref[0]
    ll = ll_ref[0]
    last_col = u == (u1p - 1)

    beta_init = jnp.full((b, u1p), LOG_EPS)

    def body(i, beta_next):
        d = n_diag - 1 - i
        df = d.astype(jnp.float32)
        is_final = (df == flen + ylen - 1.0) & (u == ylen)

        # gradients for diagonal d (use beta at d+1 = beta_next)
        bn_eff = jnp.where(is_final, 0.0, beta_next)
        galpha = alphas_ref[d]
        gblank_ref[d] = jnp.exp(galpha + blank_ref[d] + bn_eff - ll)
        # circular left-shift by one lane (pltpu.roll requires shift >= 0)
        beta_up = pltpu.roll(beta_next, u1p - 1, axis=1)
        beta_up = jnp.where(last_col, LOG_EPS, beta_up)
        gemit_ref[d] = jnp.exp(galpha + emit_ref[d] + beta_up - ll)

        # beta recursion
        stay = blank_ref[d] + beta_next
        move = emit_ref[d] + beta_up
        new = jnp.logaddexp(stay, move)
        new = jnp.where(is_final, blank_ref[d], new)
        valid = (u <= df) & (df - u < t_max) & (u <= ylen) & (df - u <= flen - 1.0)
        new = jnp.where(valid, new, LOG_EPS)
        return new

    jax.lax.fori_loop(0, n_diag, body, beta_init)


def _prep(blank_lp, emit_lp):
    b, t, u1 = blank_lp.shape
    n_diag = t + u1 - 1
    u1p = _round_up(u1, LANE)
    bp = _round_up(b, SUBLANE)

    def pad_skew(x):
        xs = _skew_t(x.astype(jnp.float32), n_diag)
        return jnp.pad(
            xs, ((0, 0), (0, bp - b), (0, u1p - u1)), constant_values=LOG_EPS
        )

    return pad_skew(blank_lp), pad_skew(emit_lp), (b, t, u1, n_diag, u1p, bp)


def _alphas(blank_lp, emit_lp):
    blank_s, emit_s, (b, t, u1, n_diag, u1p, bp) = _prep(blank_lp, emit_lp)
    alphas = pl.pallas_call(
        functools.partial(_fwd_kernel, t_max=t, n_diag=n_diag),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_diag, bp, u1p), jnp.float32),
    )(blank_s, emit_s)
    return alphas, blank_s, emit_s, (b, t, u1, n_diag, u1p, bp)


def _loss_from_alphas(alphas, blank_lp, f_len, y_len):
    b = blank_lp.shape[0]
    d_final = f_len - 1 + y_len
    alpha_final = alphas[d_final, jnp.arange(b), y_len]
    last_blank = blank_lp[jnp.arange(b), f_len - 1, y_len]
    return -(alpha_final + last_blank)


@jax.custom_vjp
def rnnt_loss_from_gathered_pallas(blank_lp, emit_lp, f_len, y_len):
    """Per-sample RNN-T negative log likelihood; Pallas wavefront kernels."""
    alphas, _, _, _ = _alphas(blank_lp, emit_lp)
    return _loss_from_alphas(alphas, blank_lp, f_len, y_len)


def _vjp_fwd(blank_lp, emit_lp, f_len, y_len):
    alphas, blank_s, emit_s, dims = _alphas(blank_lp, emit_lp)
    loss = _loss_from_alphas(alphas, blank_lp, f_len, y_len)
    return loss, (alphas, blank_s, emit_s, f_len, y_len, loss, dims)


def _vjp_bwd(res, g):
    alphas, blank_s, emit_s, f_len, y_len, loss, dims = res
    b, t, u1, n_diag, u1p, bp = dims
    ll = -loss  # per-sample log likelihood

    def pad_scalar(x):
        x = jnp.broadcast_to(x.astype(jnp.float32)[:, None], (b, u1p))
        return jnp.pad(x, ((0, bp - b), (0, 0)))[None]

    gblank_s, gemit_s = pl.pallas_call(
        functools.partial(_bwd_kernel, t_max=t, n_diag=n_diag),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((n_diag, bp, u1p), jnp.float32)] * 2,
    )(blank_s, emit_s, alphas, pad_scalar(f_len), pad_scalar(y_len), pad_scalar(ll))

    # unskew, crop padding, apply the loss sign and incoming cotangent
    scale = (-g.astype(jnp.float32))[:, None, None]
    gblank = _unskew_t(gblank_s, t)[:b, :, :u1] * scale
    gemit = _unskew_t(gemit_s, t)[:b, :, :u1] * scale
    return gblank, gemit, None, None


rnnt_loss_from_gathered_pallas.defvjp(_vjp_fwd, _vjp_bwd)
