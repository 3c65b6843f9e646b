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


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, scale: float):
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
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)
    # log-sum-exp per query row, lane-replicated (residual for the Pallas
    # backward; layout follows jax's TPU flash kernel: (.., Nq, LANE))
    lse_ref[0, 0] = jnp.broadcast_to(m + jnp.log(l), lse_ref.shape[2:])


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


def _is_keymask(bias) -> bool:
    """True when bias is a pure key mask (1 row, 1 head): constant w.r.t.
    parameters, broadcast over query rows."""
    return bias.shape[-2] == 1 and bias.shape[1] == 1


PALLAS_BWD = None  # None = auto; True/False forces the Pallas backward


def _pallas_bwd_enabled(nq: int, nk: int, d: int) -> bool:
    """Auto policy mirrors the forward dispatch: the tiled Pallas backward
    only pays beyond the VMEM budget, where XLA's recompute backward has to
    round-trip (Nq, Nk) score/probability tensors through HBM (measured
    1.09x vs XLA recompute at B=8 H=8 N=2048 d=64 bf16-precision on v5e,
    scripts/flash_bwd_check.py). At in-VMEM training shapes XLA's fused
    recompute is already at parity or better (131 vs 134 ms/step for CTC
    Large 8x16 s bf16, scripts/train_bench.py), so it keeps the default."""
    if PALLAS_BWD is not None:
        return PALLAS_BWD
    if jax.default_backend() != "tpu":
        return False
    return not fits_vmem(nq, nk, d)


def _dispatch_forward(q, k, v, bias, scale, with_lse: bool = False):
    """Single-block kernel when (Nq, Nk) fits VMEM; the key-tiled flash
    kernel beyond that (measured 1.5-1.6x vs XLA's jnp attention at
    B=8 H=8 N=2048 d=64 on v5e with TQ=256/TK=2048 — scripts/flash_sweep.py,
    NOTES_ROUND2.md)."""
    d = max(q.shape[3], v.shape[3])
    if fits_vmem(q.shape[2], k.shape[2], d):
        o, lse = _fused_forward(q, k, v, bias, scale)
    else:
        o, lse = _flash_forward(q, k, v, bias, scale)
    return (o, lse) if with_lse else o


def _fused_fwd(q, k, v, bias, scale):
    o, lse = _dispatch_forward(q, k, v, bias, scale, with_lse=True)
    return o, (q, k, v, bias, o, lse)


def _fused_bwd(scale, res, g):
    """Backward dispatch. For a key-mask bias (the hot path: the factorized
    rel-pos variants pass only the padding mask) the tiled Pallas backward
    recomputes probabilities per (q-tile, k-tile) from the saved LSE, so no
    (Nq, Nk) tensor ever reaches HBM; the mask is a length-derived constant,
    so its gradient is returned as zeros. Full-bias shapes (causal/streaming/
    skewing paths, which need a real dbias) use the XLA recompute path."""
    q, k, v, bias, o, lse = res
    d = max(q.shape[3], v.shape[3])
    if _is_keymask(bias) and _pallas_bwd_enabled(q.shape[2], k.shape[2], d):
        dq, dk, dv = _flash_backward(q, k, v, bias, o, lse, g, scale)
        return dq, dk, dv, jnp.zeros_like(bias)
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
    spec_lse = pl.BlockSpec(
        (1, 1, nqp, LANE), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    out, lse = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[spec_q, spec_k, spec_v, spec_bias],
        out_specs=[spec_o, spec_lse],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nqp, dvp), q.dtype),
            jax.ShapeDtypeStruct((b, h, nqp, LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * nqp * nkp * (dp + dvp),
            bytes_accessed=b * h * (2 * nqp * dp + nkp * (dp + dvp)) * 4,
            transcendentals=b * h * nqp * nkp,
        ),
    )(qp, kp, vp, biasp)
    return out[:, :, :nq, :dv], lse[:, :, :nq, 0]


FLASH_TQ = 256
FLASH_TK = 2048


def _flash_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
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
        lse_ref[0, 0] = jnp.broadcast_to(
            m_scr[:, :1] + jnp.log(l_scr[:, :1]), lse_ref.shape[2:]
        )


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
    spec_lse = pl.BlockSpec(
        (1, 1, FLASH_TQ, LANE), lambda i, j, iq, ik: (i, j, iq, 0),
        memory_space=pltpu.VMEM,
    )
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, nk_tiles=nk_tiles),
        grid=grid,
        in_specs=[spec_q, spec_kv_k, spec_v, spec_bias],
        out_specs=[spec_o, spec_lse],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nqp, dvp), q.dtype),
            jax.ShapeDtypeStruct((b, h, nqp, LANE), jnp.float32),
        ],
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
    return out[:, :, :nq, :dv], lse[:, :, :nq, 0]


BWD_TQ = 256
BWD_TK = 1024


def _bwd_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, di_ref,
                   dq_ref, acc_scr, *, scale: float, nk_tiles: int):
    """dq = (p * (do v^T - D)) k * scale, accumulated over k-tiles; p is
    recomputed per tile from the saved row log-sum-exp (flash style: no
    (Nq, Nk) intermediate ever leaves VMEM)."""
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale + bias_ref[0, 0].astype(jnp.float32)
    p = jnp.exp(s - lse_ref[0, 0][:, :1])
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - di_ref[0, 0][:, :1])
    acc_scr[:] += scale * jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == nk_tiles - 1)
    def _():
        dq_ref[0, 0] = acc_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, di_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr,
                    *, scale: float, nq_tiles: int):
    """dv = p^T do and dk = (p * (do v^T - D))^T q * scale, accumulated over
    q-tiles."""
    iq = pl.program_id(3)

    @pl.when(iq == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale + bias_ref[0, 0].astype(jnp.float32)
    p = jnp.exp(s - lse_ref[0, 0][:, :1])
    dv_scr[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - di_ref[0, 0][:, :1])
    dk_scr[:] += scale * jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(iq == nq_tiles - 1)
    def _():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, bias, o, lse, do, scale):
    """Tiled Pallas backward for the key-mask bias case.

    Uses the forward's saved per-row log-sum-exp to recompute probabilities
    tile-by-tile; two passes (dq over k-tiles; dk/dv over q-tiles). Per-row
    stats are stored lane-replicated ((.., Nq, LANE)) like jax's TPU flash
    kernel."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    dvw = v.shape[3]
    tq = min(BWD_TQ, _round_up(nq, SUBLANE))
    tk = min(BWD_TK, _round_up(nk, SUBLANE))
    nqp = _round_up(nq, tq)
    nkp = _round_up(nk, tk)
    dp_ = _round_up(d, LANE)
    dvp = _round_up(dvw, LANE)
    nq_tiles = nqp // tq
    nk_tiles = nkp // tk

    def pad4(x, n_, d_):
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, n_ - x.shape[2]), (0, d_ - x.shape[3]))
        )

    qp = pad4(q, nqp, dp_)
    kp = pad4(k, nkp, dp_)
    vp = pad4(v, nkp, dvp)
    dop = pad4(do, nqp, dvp)
    op = pad4(o, nqp, dvp)

    # padded query rows get lse = +1e9 so p = exp(s - 1e9) = 0: they
    # contribute nothing to dk/dv, and their dq rows are sliced off
    lsep = jnp.pad(
        lse, ((0, 0), (0, 0), (0, nqp - nq)), constant_values=1e9
    )
    di = jnp.sum(op.astype(jnp.float32) * dop.astype(jnp.float32), axis=-1)
    lse4 = jnp.broadcast_to(lsep[..., None], (b, h, nqp, LANE))
    di4 = jnp.broadcast_to(di[..., None], (b, h, nqp, LANE))

    if bias.shape[-1] != nk:  # all-zeros (.., 1) placeholder
        bias = jnp.broadcast_to(bias, bias.shape[:3] + (nk,))
    biasp = jnp.pad(
        bias, ((0, 0), (0, 0), (0, 0), (0, nkp - nk)),
        constant_values=NEG_INF,
    )
    bias_b = biasp.shape[0]

    def q_map(i, j, iq, ik):
        return (i, j, iq, 0)

    def kv_map(i, j, iq, ik):
        return (i, j, ik, 0)

    def bias_map(i, j, iq, ik):
        return (i if bias_b > 1 else 0, 0, 0, ik)

    spec_q = pl.BlockSpec((1, 1, tq, dp_), q_map, memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, 1, tk, dp_), kv_map, memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((1, 1, tk, dvp), kv_map, memory_space=pltpu.VMEM)
    spec_bias = pl.BlockSpec((1, 1, 1, tk), bias_map, memory_space=pltpu.VMEM)
    spec_do = pl.BlockSpec((1, 1, tq, dvp), q_map, memory_space=pltpu.VMEM)
    spec_row = pl.BlockSpec((1, 1, tq, LANE), q_map, memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, nk_tiles=nk_tiles),
        grid=(b, h, nq_tiles, nk_tiles),
        in_specs=[spec_q, spec_k, spec_v, spec_bias, spec_do, spec_row,
                  spec_row],
        out_specs=pl.BlockSpec((1, 1, tq, dp_), q_map,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, nqp, dp_), q.dtype),
        scratch_shapes=[pltpu.VMEM((tq, dp_), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET,
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(qp, kp, vp, biasp, dop, lse4, di4)

    def q_map_t(i, j, ik, iq):
        return (i, j, iq, 0)

    def kv_map_t(i, j, ik, iq):
        return (i, j, ik, 0)

    def bias_map_t(i, j, ik, iq):
        return (i if bias_b > 1 else 0, 0, 0, ik)

    spec_q_t = pl.BlockSpec((1, 1, tq, dp_), q_map_t, memory_space=pltpu.VMEM)
    spec_k_t = pl.BlockSpec((1, 1, tk, dp_), kv_map_t, memory_space=pltpu.VMEM)
    spec_v_t = pl.BlockSpec((1, 1, tk, dvp), kv_map_t, memory_space=pltpu.VMEM)
    spec_bias_t = pl.BlockSpec((1, 1, 1, tk), bias_map_t,
                               memory_space=pltpu.VMEM)
    spec_do_t = pl.BlockSpec((1, 1, tq, dvp), q_map_t, memory_space=pltpu.VMEM)
    spec_row_t = pl.BlockSpec((1, 1, tq, LANE), q_map_t,
                              memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, nq_tiles=nq_tiles),
        grid=(b, h, nk_tiles, nq_tiles),
        in_specs=[spec_q_t, spec_k_t, spec_v_t, spec_bias_t, spec_do_t,
                  spec_row_t, spec_row_t],
        out_specs=[
            pl.BlockSpec((1, 1, tk, dp_), kv_map_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, dvp), kv_map_t, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nkp, dp_), k.dtype),
            jax.ShapeDtypeStruct((b, h, nkp, dvp), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tk, dp_), jnp.float32),
            pltpu.VMEM((tk, dvp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_BUDGET,
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(qp, kp, vp, biasp, dop, lse4, di4)

    return (dq[:, :, :nq, :d], dk[:, :, :nk, :d], dv[:, :, :nk, :dvw])


def reference_bias_attention(q, k, v, bias, scale):
    """jnp reference with identical semantics (used in tests/fallback)."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * scale
    s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)
