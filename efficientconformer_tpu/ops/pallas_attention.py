"""Fused attention Pallas kernel.

Computes O = softmax(Q K^T * scale + bias) V per (batch, head) entirely in
VMEM, so the (N, N) score/probability matrices never round-trip through HBM —
the main memory-traffic cost of the encoder's self-attention stack at
Conformer sequence lengths (N <= ~1k after subsampling). The additive ``bias``
carries both the relative-position scores (precomputed by the skewing path in
ops/attention.py) and the padding/streaming mask, which makes one kernel serve
every rel-pos variant: plain and grouped attention only differ in how Q/K/V
and the bias were laid out beforehand.

Softmax runs in fp32 regardless of input dtype (bf16-safe). Head dim is
zero-padded to the 128-lane boundary outside the kernel (zeros contribute
nothing to the dot products); N is padded to the sublane boundary with
masked-out bias columns.

Falls back to the pure-jnp path for shapes that exceed the VMEM budget
(see ``fits_vmem``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

LANE = 128
SUBLANE = 8
VMEM_BUDGET = 12 * 1024 * 1024  # bytes, conservative vs the ~16MB/core VMEM


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fits_vmem(nq: int, nk: int, d: int, dtype_bytes: int = 4) -> bool:
    nqp = _round_up(nq, SUBLANE)
    nkp = _round_up(nk, SUBLANE)
    dp = _round_up(d, LANE)
    # q, k, v, o tiles + scores + probs (fp32)
    need = (
        2 * nqp * dp * dtype_bytes
        + 2 * nkp * dp * dtype_bytes
        + 2 * nqp * nkp * 4
        + nqp * nkp * dtype_bytes
    )
    return need < VMEM_BUDGET


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # bias block is (1, 1, Nq, Nk), or (1, 1, 1, Nk) for a pure key-padding
    # mask (broadcast over query rows)
    s = s * scale + bias_ref[0, 0].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_bias_attention(
    q: jnp.ndarray,      # (B, H, Nq, d)
    k: jnp.ndarray,      # (B, H, Nk, d)
    v: jnp.ndarray,      # (B, H, Nk, d)
    bias: jnp.ndarray,   # (B or 1, H or 1, Nq, Nk) additive (rel scores + mask)
    scale: float,
) -> jnp.ndarray:
    """softmax(q k^T * scale + bias) v, Pallas-fused forward.

    Backward pass recomputes the probabilities with plain XLA matmuls
    (flash-style: nothing from the forward's (N, N) intermediates is stored).
    """
    return _dispatch_forward(q, k, v, bias, scale)


def _dispatch_forward(q, k, v, bias, scale):
    """Single-block kernel when (Nq, Nk) fits VMEM; the key-tiled flash
    kernel beyond that (measured 1.5-1.6x vs XLA's jnp attention at
    B=8 H=8 N=2048 d=64 on v5e with TQ=256/TK=2048 — scripts/flash_sweep.py,
    NOTES_ROUND2.md)."""
    d = max(q.shape[3], v.shape[3])
    if fits_vmem(q.shape[2], k.shape[2], d):
        return _fused_forward(q, k, v, bias, scale)
    return _flash_forward(q, k, v, bias, scale)


def _fused_fwd(q, k, v, bias, scale):
    return _dispatch_forward(q, k, v, bias, scale), (q, k, v, bias)


def _fused_bwd(scale, res, g):
    q, k, v, bias = res
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * scale
    s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dp = jnp.einsum("bhnd,bhmd->bhnm", gf, vf)
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, gf).astype(v.dtype)
    ds = (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * p
    dq = (jnp.einsum("bhnm,bhmd->bhnd", ds, k.astype(jnp.float32)) * scale).astype(q.dtype)
    dk = (jnp.einsum("bhnm,bhnd->bhmd", ds, q.astype(jnp.float32)) * scale).astype(k.dtype)
    # reduce ds over the axes that were broadcast in bias
    dbias = ds
    for axis in range(bias.ndim):
        if bias.shape[axis] == 1 and ds.shape[axis] != 1:
            dbias = jnp.sum(dbias, axis=axis, keepdims=True)
    return dq, dk, dv, dbias.astype(bias.dtype)


fused_bias_attention.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.jit, static_argnames=("scale",))
def _fused_forward(
    q: jnp.ndarray,      # (B, H, Nq, d)
    k: jnp.ndarray,      # (B, H, Nk, d)
    v: jnp.ndarray,      # (B, H, Nk, d)
    bias: jnp.ndarray,   # (B or 1, H or 1, Nq, Nk) additive (rel scores + mask)
    scale: float,
) -> jnp.ndarray:
    """softmax(q k^T * scale + bias) v, fused per (b, h).

    q/k share a feature width; v may have a different one (the factorized
    rel-pos path augments q/k but not v)."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    dv = v.shape[3]
    nqp = _round_up(nq, SUBLANE)
    nkp = _round_up(nk, SUBLANE)
    dp = _round_up(d, LANE)
    dvp = _round_up(dv, LANE)

    def pad_to(x, np_, dp_):
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, np_ - x.shape[2]), (0, dp_ - x.shape[3]))
        )

    qp = pad_to(q, nqp, dp)
    kp = pad_to(k, nkp, dp)
    vp = pad_to(v, nkp, dvp)

    # A (Bb, Hb, 1, Nk) bias is a pure key mask: keep it un-broadcast (one row
    # per batch entry) so no (B, H, Nq, Nk) tensor ever reaches HBM. Anything
    # else is broadcast to the full score shape.
    keymask = bias.shape[-2] == 1 and bias.shape[1] == 1
    if keymask:
        bias_b = bias.shape[0]
        if bias.shape[-1] != nk:  # e.g. an all-zeros (.., 1) placeholder
            bias = jnp.broadcast_to(bias, bias.shape[:3] + (nk,))
        biasp = jnp.pad(
            bias, ((0, 0), (0, 0), (0, 0), (0, nkp - nk)),
            constant_values=NEG_INF,
        )
        bias_rows = 1
    else:
        bias = jnp.broadcast_to(bias, (b, h, nq, nk))
        # padded key columns must be masked; padded query rows are sliced off
        biasp = jnp.pad(
            bias, ((0, 0), (0, 0), (0, nqp - nq), (0, nkp - nk)),
            constant_values=NEG_INF,
        )
        bias_b = b
        bias_rows = nqp

    grid = (b, h)
    spec_q = pl.BlockSpec(
        (1, 1, nqp, dp), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    spec_k = pl.BlockSpec(
        (1, 1, nkp, dp), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    spec_v = pl.BlockSpec(
        (1, 1, nkp, dvp), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    spec_o = pl.BlockSpec(
        (1, 1, nqp, dvp), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    if keymask and bias_b > 1:
        bias_map = lambda i, j: (i, 0, 0, 0)
    elif keymask:
        bias_map = lambda i, j: (0, 0, 0, 0)
    else:
        bias_map = lambda i, j: (i, j, 0, 0)
    spec_bias = pl.BlockSpec(
        (1, 1, bias_rows, nkp), bias_map, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[spec_q, spec_k, spec_v, spec_bias],
        out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((b, h, nqp, dvp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * nqp * nkp * (dp + dvp),
            bytes_accessed=b * h * (2 * nqp * dp + nkp * (dp + dvp)) * 4,
            transcendentals=b * h * nqp * nkp,
        ),
    )(qp, kp, vp, biasp)
    return out[:, :, :nq, :dv]


FLASH_TQ = 256
FLASH_TK = 2048


def _flash_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, m_scr, l_scr, acc_scr,
    *, scale: float, nk_tiles: int,
):
    """Online-softmax attention: grid (B, H, q-tiles, k-tiles); the k-tile
    axis is innermost and sequential, carrying (running max, denom, weighted
    accumulator) in VMEM scratch. Removes the all-keys-in-VMEM requirement of
    the single-block kernel."""
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale + bias_ref[0, 0].astype(jnp.float32)

    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc_scr[:] * corr + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
    acc_scr[:] = acc

    @pl.when(ik == nk_tiles - 1)
    def _():
        o_ref[0, 0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


def _flash_forward(q, k, v, bias, scale):
    b, h, nq, d = q.shape
    nk = k.shape[2]
    dv = v.shape[3]
    nqp = _round_up(nq, FLASH_TQ)
    nkp = _round_up(nk, FLASH_TK)
    dp = _round_up(d, LANE)
    dvp = _round_up(dv, LANE)
    nq_tiles = nqp // FLASH_TQ
    nk_tiles = nkp // FLASH_TK

    def pad_to(x, np_, dp_):
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, np_ - x.shape[2]), (0, dp_ - x.shape[3]))
        )

    qp = pad_to(q, nqp, dp)
    kp = pad_to(k, nkp, dp)
    vp = pad_to(v, nkp, dvp)

    keymask = bias.shape[-2] == 1 and bias.shape[1] == 1
    if keymask:
        if bias.shape[-1] != nk:
            bias = jnp.broadcast_to(bias, bias.shape[:3] + (nk,))
        biasp = jnp.pad(
            bias, ((0, 0), (0, 0), (0, 0), (0, nkp - nk)), constant_values=NEG_INF
        )
        bias_b = bias.shape[0]
        if bias_b > 1:
            bias_map = lambda i, j, iq, ik: (i, 0, 0, ik)
        else:
            bias_map = lambda i, j, iq, ik: (0, 0, 0, ik)
        spec_bias = pl.BlockSpec(
            (1, 1, 1, FLASH_TK), bias_map, memory_space=pltpu.VMEM
        )
    else:
        bias = jnp.broadcast_to(bias, (b, h, nq, nk))
        biasp = jnp.pad(
            bias, ((0, 0), (0, 0), (0, nqp - nq), (0, nkp - nk)),
            constant_values=NEG_INF,
        )
        spec_bias = pl.BlockSpec(
            (1, 1, FLASH_TQ, FLASH_TK),
            lambda i, j, iq, ik: (i, j, iq, ik),
            memory_space=pltpu.VMEM,
        )

    grid = (b, h, nq_tiles, nk_tiles)
    spec_q = pl.BlockSpec(
        (1, 1, FLASH_TQ, dp), lambda i, j, iq, ik: (i, j, iq, 0),
        memory_space=pltpu.VMEM,
    )
    spec_kv_k = pl.BlockSpec(
        (1, 1, FLASH_TK, dp), lambda i, j, iq, ik: (i, j, ik, 0),
        memory_space=pltpu.VMEM,
    )
    spec_v = pl.BlockSpec(
        (1, 1, FLASH_TK, dvp), lambda i, j, iq, ik: (i, j, ik, 0),
        memory_space=pltpu.VMEM,
    )
    spec_o = pl.BlockSpec(
        (1, 1, FLASH_TQ, dvp), lambda i, j, iq, ik: (i, j, iq, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, nk_tiles=nk_tiles),
        grid=grid,
        in_specs=[spec_q, spec_kv_k, spec_v, spec_bias],
        out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((b, h, nqp, dvp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((FLASH_TQ, LANE), jnp.float32),
            pltpu.VMEM((FLASH_TQ, LANE), jnp.float32),
            pltpu.VMEM((FLASH_TQ, dvp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET,
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(qp, kp, vp, biasp)
    return out[:, :, :nq, :dv]


def reference_bias_attention(q, k, v, bias, scale):
    """jnp reference with identical semantics (used in tests/fallback)."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * scale
    s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)
