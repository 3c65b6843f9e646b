"""Fused factorized rel-pos attention Pallas kernel.

The factorized rel-pos path (ops/rel_factorize.py) turns Transformer-XL /
grouped relative-position scores (reference models/attentions.py:451-718)
into plain attention over augmented features:

    S[i, j] = qu_i . k_j  +  A_i . C_j
    A_i = [ sin_i * P_i + cos_i * Q_i  |  sin_i * Q_i - cos_i * P_i ]
    C_j = [ cos(pos_j w)               |  sin(pos_j w)              ]
    [P | Q]_i = qv_i @ W_h,   qv_i = qu_i + delta_h  (delta = vbias - u)

The XLA path materializes A (B, H, N, D), concatenates it onto qu, and
broadcasts C over (B, H) — three D-wide per-token HBM tensors per block, the
top non-matmul traffic of the training step at shipped sizes (HLO
attribution, NOTES_ROUND3.md). This kernel instead receives the TINY
per-head folded weights W (H, dh, 2*hd) and bias delta (H, dh) and computes
the P/Q accumulators, A, the rel scores, the softmax, and the output
entirely in VMEM: per (h, b) the only HBM traffic is qu/k/v in and o out —
no pq accumulators (round 4: previously a (B, H, N, 2*hd) HBM tensor plus
its gradient), no augmented features, no broadcast key table, and no (N, N)
score/probability tensor in either direction (the backward recomputes
probabilities from the saved row log-sum-exp, flash style). The weight
gradient dW and bias-delta gradient are reduced over the batch INSIDE the
backward kernel: the grid is (H, B) with B fastest, so each head's
accumulator block stays VMEM-resident across its batch sweep (the standard
Pallas revisiting-reduction pattern — blocks are only revisited
consecutively).

Layout contract (all enforced by the launcher):
  qu:     (B, H, N,  dh)    content query (+u bias), head-split
  delta:  (H, dh)           per-head constant with qu + delta = qv (v-biased
                            query): split(vbias - u) plain, tile-G grouped
  w:      (H, dh, 2*hd)     folded pos-projection weights, hd = D/2 padded to
                            the lane size ([P | Q] halves)
  k, v:   (B, H, Nk, dh)
  rowtab: (N,  2*hd)        [sin | cos](pos_q w_k) halves
  keytab: (Nk, 2*hd)        [cos | sin](pos_k w_k) halves
  bias:   (B or 1, 1, 1, Nk) additive key mask (the factorized branches are
          always key-only-masked; full (N, N) masks take the skewing path)

Half-separated (not interleaved) layouts keep every slice lane-aligned; the
prep helpers in ops/rel_factorize.py emit W and the tables pre-padded by
folding zero columns into the (tiny) weight-side tensors, so no relayout of
per-token data happens outside the kernel either.

Shapes beyond the single-block VMEM budget fall back to the augmented-feature
XLA/flash path in models/attentions.py (shipped configs are all in-budget:
N <= ~1k after progressive downsampling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from efficientconformer_tpu.ops.pallas_attention import (
    LANE,
    NEG_INF,
    SUBLANE,
    VMEM_BUDGET,
    _round_up,
)


def lane_half(d: int) -> int:
    """Lane-padded half-width: hd = round_up(d // 2, LANE). The prep helpers
    and the dispatch sites in models/attentions.py must agree on this."""
    return _round_up(d // 2, LANE)


def fits_vmem(n: int, nk: int, dh: int, hd2: int) -> bool:
    """Single-block VMEM need, sized on the BACKWARD kernel's live set (the
    larger of the two passes): q-side tokens (qu, do, dqu + qv working),
    k-side tokens (k, v, dk, dv), pq/dpq/A/dA working copies, W + dW
    accumulator, tables, and four (N, Nk) fp32 tensors (scores, probs, dpmat,
    ds). Over-counting here only costs a fallback to the XLA factorized path;
    under-counting is a compile error (ADVICE r4)."""
    np_ = _round_up(n, SUBLANE)
    nkp = _round_up(nk, SUBLANE)
    dhp = _round_up(dh, LANE)
    need = (
        4 * np_ * dhp * 4                 # qu, do, dqu, qv
        + 4 * nkp * dhp * 4               # k, v, dk, dv
        + 4 * np_ * hd2 * 4               # pq, dpq, A, dA (fp32 working)
        + 2 * dhp * hd2 * 4               # W + dW accumulator
        + (np_ + nkp) * hd2 * 4           # rowtab + keytab
        + 4 * np_ * nkp * 4               # scores, probs, dpmat, ds (fp32)
    )
    return need < VMEM_BUDGET


def _rel_scores(qu, k, delta, w, rowtab, keytab, scale):
    """(N, Nk) fp32 scores: content + factorized rel-pos, all in VMEM.
    Returns (scores, qv, pq) — the working tensors the backward reuses."""
    s = jax.lax.dot_general(
        qu, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    qv = qu + delta  # (N, dh) + (1, dh): broadcast row constant (kept 2-D
    # end-to-end — Mosaic lowers rank-2 broadcasts reliably)
    pq = jax.lax.dot_general(
        qv, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    hd = pq.shape[-1] // 2
    p_acc = pq[:, :hd]
    q_acc = pq[:, hd:]
    sin = rowtab[:, :hd].astype(jnp.float32)
    cos = rowtab[:, hd:].astype(jnp.float32)
    a = jnp.concatenate(
        [sin * p_acc + cos * q_acc, sin * q_acc - cos * p_acc], axis=-1
    )
    s = s + jax.lax.dot_general(
        a.astype(keytab.dtype), keytab, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return s * scale, qv, pq


def _fwd_kernel(qu_ref, k_ref, v_ref, delta_ref, w_ref, rowtab_ref,
                keytab_ref, bias_ref, o_ref, lse_ref, *, scale: float):
    s, _, _ = _rel_scores(qu_ref[0, 0], k_ref[0, 0], delta_ref[0],
                          w_ref[0], rowtab_ref[:], keytab_ref[:], scale)
    s = s + bias_ref[0, 0].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0, 0]
    o = jax.lax.dot_general(
        (p / l).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)
    lse_ref[0, 0] = jnp.broadcast_to(m + jnp.log(l), lse_ref.shape[2:])


def _bwd_kernel(qu_ref, k_ref, v_ref, delta_ref, w_ref, rowtab_ref,
                keytab_ref, bias_ref, do_ref, lse_ref,
                dqu_ref, dk_ref, dv_ref, dw_ref, ddelta_ref, dbias_ref,
                *, scale: float):
    """One pass per (h, b): recompute p from the saved LSE, then all
    per-token gradients without any (N, Nk) tensor leaving VMEM. dW and
    ddelta reduce over the batch axis (grid axis 1, fastest) into
    VMEM-resident per-head accumulator blocks. dbias is the per-(h, b) row
    reduction of ds (the bias enters the softmax input additively broadcast
    over query rows); the launcher folds it back to the bias shape."""
    qu = qu_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    w = w_ref[0]
    s, qv, _ = _rel_scores(qu, k, delta_ref[0], w, rowtab_ref[:],
                           keytab_ref[:], scale)
    s = s + bias_ref[0, 0].astype(jnp.float32)
    p = jnp.exp(s - lse_ref[0, 0][:, :1])
    dpmat = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    di = jnp.sum(p * dpmat, axis=-1, keepdims=True)
    ds = p * (dpmat - di)
    dbias_ref[0, 0] = jnp.sum(ds, axis=0, keepdims=True)  # (1, Nkp)
    dsv = ds.astype(v.dtype)
    dk_ref[0, 0] = (scale * jax.lax.dot_general(
        dsv, qu, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )).astype(dk_ref.dtype)
    dv_ref[0, 0] = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    # dA = ds @ keytab (halves [dA_even | dA_odd]); fold back through the
    # A(P, Q) rotation to dpq, then through pq = qv @ W to dqv / dW / ddelta
    da = scale * jax.lax.dot_general(
        dsv, keytab_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    hd = da.shape[-1] // 2
    da_e = da[:, :hd]
    da_o = da[:, hd:]
    rowtab = rowtab_ref[:]
    sin = rowtab[:, :hd].astype(jnp.float32)
    cos = rowtab[:, hd:].astype(jnp.float32)
    dpq = jnp.concatenate(
        [sin * da_e - cos * da_o, cos * da_e + sin * da_o], axis=-1
    )
    dpq_l = dpq.astype(qu.dtype)
    dqv = jax.lax.dot_general(
        dpq_l, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dqu_ref[0, 0] = (scale * jax.lax.dot_general(
        dsv, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + dqv).astype(dqu_ref.dtype)
    dw_blk = jax.lax.dot_general(
        qv, dpq_l, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dd_blk = jnp.sum(dqv, axis=0, keepdims=True)   # (1, dhp)
    jb = pl.program_id(1)

    @pl.when(jb == 0)
    def _init():
        dw_ref[0] = dw_blk
        ddelta_ref[0] = dd_blk

    @pl.when(jb != 0)
    def _acc():
        dw_ref[0] = dw_ref[0] + dw_blk
        ddelta_ref[0] = ddelta_ref[0] + dd_blk


def _pad_tokens(x, n_, d_):
    return jnp.pad(
        x, ((0, 0), (0, 0), (0, n_ - x.shape[2]), (0, d_ - x.shape[3]))
    )


def _specs(b, h, np_, nkp, dhp, hd2, bias_b):
    # grid = (H, B): i = head, j = batch. Batch fastest so the per-head dW /
    # ddelta accumulator blocks (backward) are revisited consecutively.
    spec_q = pl.BlockSpec((1, 1, np_, dhp), lambda i, j: (j, i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_kv = pl.BlockSpec((1, 1, nkp, dhp), lambda i, j: (j, i, 0, 0),
                           memory_space=pltpu.VMEM)
    # delta rides as (H, 1, dhp) so the block's trailing dims (1, dhp) equal
    # the array's — Mosaic requires trailing block dims divisible by (8, 128)
    # OR equal to the array dims
    spec_delta = pl.BlockSpec((1, 1, dhp), lambda i, j: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((1, dhp, hd2), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_row = pl.BlockSpec((np_, hd2), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    spec_key = pl.BlockSpec((nkp, hd2), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    bias_map = (lambda i, j: (j, 0, 0, 0)) if bias_b > 1 else \
        (lambda i, j: (0, 0, 0, 0))
    spec_bias = pl.BlockSpec((1, 1, 1, nkp), bias_map, memory_space=pltpu.VMEM)
    return spec_q, spec_kv, spec_delta, spec_w, spec_row, spec_key, spec_bias


def _prepare(qu, k, v, delta, w, rowtab, keytab, bias):
    b, h, n, dh = qu.shape
    nk = k.shape[2]
    hd2 = w.shape[2]
    assert hd2 % (2 * LANE) == 0, hd2  # prep emits lane-padded halves
    assert delta.shape == (h, dh) and w.shape == (h, dh, hd2)
    assert rowtab.shape == (n, hd2) and keytab.shape == (nk, hd2)
    np_ = _round_up(n, SUBLANE)
    nkp = _round_up(nk, SUBLANE)
    dhp = _round_up(dh, LANE)
    qu_p = _pad_tokens(qu, np_, dhp)
    k_p = _pad_tokens(k, nkp, dhp)
    v_p = _pad_tokens(v, nkp, dhp)
    # zero feature-pad keeps qv/pq exact: padded qu lanes are zero, delta and
    # W rows there are zero, so padded lanes contribute nothing to pq
    delta_p = jnp.pad(delta, ((0, 0), (0, dhp - dh)))[:, None, :]
    w_p = jnp.pad(w, ((0, 0), (0, dhp - dh), (0, 0)))
    row_p = jnp.pad(rowtab, ((0, np_ - n), (0, 0)))
    key_p = jnp.pad(keytab, ((0, nkp - nk), (0, 0)))
    if bias is None:
        bias = jnp.zeros((1, 1, 1, nk), jnp.float32)
    if bias.shape[-1] != nk:
        bias = jnp.broadcast_to(bias, bias.shape[:3] + (nk,))
    # padded key columns masked out; padded query rows sliced off
    bias_p = jnp.pad(
        bias, ((0, 0), (0, 0), (0, 0), (0, nkp - nk)), constant_values=NEG_INF
    )
    return qu_p, k_p, v_p, delta_p, w_p, row_p, key_p, bias_p, (np_, nkp, dhp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_relpos_attention(qu, k, v, delta, w, rowtab, keytab, bias, scale,
                           d_sem=None):
    """softmax(qu k^T + A(pq) C^T + bias) v with pq = (qu + delta) @ W and
    the rel bias computed in-VMEM; see the module docstring for the layout
    contract. ``d_sem`` is the SEMANTIC rel-feature width (the model dim D;
    the padded half-layout width 2*hd is used when None) — it only affects
    the declared CostEstimate so MFU accounting stays on unpadded model
    FLOPs."""
    o, _ = _forward(qu, k, v, delta, w, rowtab, keytab, bias, scale, d_sem)
    return o


def _forward(qu, k, v, delta, w, rowtab, keytab, bias, scale, d_sem=None):
    b, h, n, dh = qu.shape
    nk = k.shape[2]
    hd2 = w.shape[2]
    d_rel = d_sem if d_sem is not None else hd2
    (qu_p, k_p, v_p, delta_p, w_p, row_p, key_p, bias_p,
     (np_, nkp, dhp)) = _prepare(qu, k, v, delta, w, rowtab, keytab, bias)
    spec_q, spec_kv, spec_delta, spec_w, spec_row, spec_key, spec_bias = (
        _specs(b, h, np_, nkp, dhp, hd2, bias_p.shape[0])
    )
    spec_lse = pl.BlockSpec((1, 1, np_, LANE), lambda i, j: (j, i, 0, 0),
                            memory_space=pltpu.VMEM)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(h, b),
        in_specs=[spec_q, spec_kv, spec_kv, spec_delta, spec_w, spec_row,
                  spec_key, spec_bias],
        out_specs=[spec_q, spec_lse],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, np_, dhp), qu.dtype),
            jax.ShapeDtypeStruct((b, h, np_, LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET),
        # semantic model FLOPs (unpadded): pq + qu.k + A.C + p.v per block
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * n * (nk * (2 * dh + d_rel) + dh * d_rel),
            bytes_accessed=b * h * (2 * np_ + nkp * 2) * dhp * 2,
            transcendentals=b * h * np_ * nkp,
        ),
    )(qu_p, k_p, v_p, delta_p, w_p, row_p, key_p, bias_p)
    return o[:, :, :n, :dh], lse


def _fwd_rule(qu, k, v, delta, w, rowtab, keytab, bias, scale, d_sem=None):
    o, lse = _forward(qu, k, v, delta, w, rowtab, keytab, bias, scale, d_sem)
    return o, (qu, k, v, delta, w, rowtab, keytab, bias, lse)


def _bwd_rule(scale, d_sem, res, g):
    qu, k, v, delta, w, rowtab, keytab, bias, lse = res
    b, h, n, dh = qu.shape
    nk = k.shape[2]
    hd2 = w.shape[2]
    (qu_p, k_p, v_p, delta_p, w_p, row_p, key_p, bias_p,
     (np_, nkp, dhp)) = _prepare(qu, k, v, delta, w, rowtab, keytab, bias)
    do_p = _pad_tokens(g, np_, dhp)
    spec_q, spec_kv, spec_delta, spec_w, spec_row, spec_key, spec_bias = (
        _specs(b, h, np_, nkp, dhp, hd2, bias_p.shape[0])
    )
    spec_lse = pl.BlockSpec((1, 1, np_, LANE), lambda i, j: (j, i, 0, 0),
                            memory_space=pltpu.VMEM)
    # padded query rows have lse from their all-masked softmax; their p rows
    # are a valid distribution but do is zero there, so ds/dv contributions
    # vanish... except dv/dk pick up p-row mass from PAD rows. Force p = 0 on
    # pad rows instead by lse = +inf surrogate. (Pad-row qv = delta is
    # nonzero, but with p = 0 every pad-row gradient path — ds, dpq, dqv,
    # dW, ddelta — is exactly zero.)
    lse_safe = jnp.concatenate(
        [lse[:, :, :n], jnp.full((b, h, np_ - n, LANE), 1e9, jnp.float32)],
        axis=2,
    ) if np_ > n else lse
    dqu, dk, dv, dw, ddelta, dbias_hb = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(h, b),
        in_specs=[spec_q, spec_kv, spec_kv, spec_delta, spec_w, spec_row,
                  spec_key, spec_bias, spec_q, spec_lse],
        out_specs=[spec_q, spec_kv, spec_kv,
                   pl.BlockSpec((1, dhp, hd2), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, dhp), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, 1, nkp), lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, np_, dhp), qu.dtype),
            jax.ShapeDtypeStruct((b, h, nkp, dhp), k.dtype),
            jax.ShapeDtypeStruct((b, h, nkp, dhp), v.dtype),
            jax.ShapeDtypeStruct((h, dhp, hd2), jnp.float32),
            jax.ShapeDtypeStruct((h, 1, dhp), jnp.float32),
            jax.ShapeDtypeStruct((h, b, 1, nkp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_BUDGET),
        # semantic model FLOPs: score recompute (2dh + d_rel + pq) + dpmat,
        # dqu, dk, dv (4dh) + dA (d_rel) + dqv/dW (2 pq-sized) per block
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * n
            * (nk * (6 * dh + 2 * (d_sem if d_sem is not None else hd2))
               + 3 * dh * (d_sem if d_sem is not None else hd2)),
            bytes_accessed=b * h * (4 * np_ + 4 * nkp) * dhp * 2,
            transcendentals=b * h * np_ * nkp,
        ),
    )(qu_p, k_p, v_p, delta_p, w_p, row_p, key_p, bias_p, do_p, lse_safe)
    # tables are position constants: no parameter gradient flows through
    # them. The bias cotangent is real (ADVICE r4): fold the per-(h, b) ds
    # row reductions back through the (B or 1, 1, 1, Nk) broadcast.
    if bias is None:
        dbias = None
    else:
        assert bias.ndim == 4 and bias.shape[1] == bias.shape[2] == 1, (
            "fused rel-pos bias layout contract is (B or 1, 1, 1, Nk)"
        )
        db = jnp.sum(dbias_hb[:, :, 0, :nk], axis=0)      # (B, Nk): sum heads
        if bias.shape[0] == 1:
            db = jnp.sum(db, axis=0, keepdims=True)        # broadcast batch
        if bias.shape[-1] == 1:
            db = jnp.sum(db, axis=-1, keepdims=True)       # broadcast keys
        dbias = db[:, None, None, :].astype(bias.dtype)
    return (
        dqu[:, :, :n, :dh], dk[:, :, :nk, :dh], dv[:, :, :nk, :dh],
        ddelta[:, 0, :dh].astype(delta.dtype),
        dw[:, :dh, :].astype(w.dtype),
        jnp.zeros_like(rowtab), jnp.zeros_like(keytab),
        dbias,
    )


fused_relpos_attention.defvjp(_fwd_rule, _bwd_rule)


def reference_relpos_attention(qu, k, v, delta, w, rowtab, keytab, bias,
                               scale):
    """jnp reference with identical semantics (tests/fallback)."""
    qv = qu + delta[None, :, None, :]
    pq = jnp.einsum(
        "bhnd,hdk->bhnk", qv, w, preferred_element_type=jnp.float32
    )
    s = jnp.einsum("bhnd,bhmd->bhnm", qu, k).astype(jnp.float32)
    hd = pq.shape[-1] // 2
    p_acc = pq[..., :hd]
    q_acc = pq[..., hd:]
    sin = rowtab[:, :hd].astype(jnp.float32)
    cos = rowtab[:, hd:].astype(jnp.float32)
    a = jnp.concatenate(
        [sin * p_acc + cos * q_acc, sin * q_acc - cos * p_acc], axis=-1
    )
    s = s + jnp.einsum("bhnd,md->bhnm", a, keytab.astype(jnp.float32))
    s = s * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)
