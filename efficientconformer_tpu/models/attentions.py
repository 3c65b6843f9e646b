"""Multi-head self-attention family.

One configurable module covers the reference's 11 attention classes
(models/attentions.py:29-1157): the variant is selected by the static attributes
(linear_att, group_size, kernel_size, stride, relative_pos_enc) exactly like the
reference's MultiHeadSelfAttentionModule selection table (models/modules.py:415-463).
Because the attributes are static, jit traces only the branch in use.

Differences from the reference (intentional, see SURVEY.md §7):
  * the StridedLocalRelPos Qu/Qv swap (reference models/attentions.py:1113-1115)
    is not replicated;
  * the local rel_to_abs reshape that scrambles head/block axes for H > 1 is
    replaced by the intended transpose (see ops/attention.py docstring);
  * relative encodings are computed for the needed window instead of slicing a
    max_pos_encoding-sized table (identical values).

KV-cache ``hidden`` states for streaming decode are dicts {"k": (B, Th, D),
"v": (B, Th, D)} with the same group-alignment semantics as the reference
(models/attentions.py:656-668).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from efficientconformer_tpu.models.layers import Dense
from efficientconformer_tpu.ops import attention as A
from efficientconformer_tpu.ops import pos_enc as P
from efficientconformer_tpu.ops import masks as M


def _xavier_bias_init(num_heads: int, dim_head: int):
    bound = math.sqrt(6.0 / (num_heads + dim_head))
    def init(key, shape, dtype=jnp.float32):
        import jax
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def _use_fused(fused: Optional[bool], q, k, v) -> bool:
    """Resolve the fused-kernel flag. None = auto, measured policy (v5e,
    scripts/train_bench.py + bench.py + scripts/flash_sweep.py):

    * within the single-block VMEM budget — the shipped-config regime after
      progressive downsampling (N <= ~1k) — XLA's fused attention wins on
      both paths (inference 25.2k vs 21.9k RT on CTC Small greedy; training
      115 vs 134 ms/step on CTC Large b=8, 514 vs 655 at b=32: XLA stores
      the softmax for backward instead of recomputing, the right trade at
      these sizes), so auto picks the jnp path;
    * beyond the VMEM budget (long-form audio, no-downsampling Conformers,
      N >= ~2k) the key-tiled flash kernel wins 1.5-2x, so auto dispatches
      to Pallas.

    ECF_FUSED_ATTENTION=0/1 overrides for A/B measurement."""
    if fused is False:
        return False
    if fused is True:
        return True
    import os

    env = os.environ.get("ECF_FUSED_ATTENTION")
    if env is not None:
        return env not in ("0", "false", "off")
    import jax

    # The kernels use pltpu.CompilerParams: TPU-only. Any other backend
    # (cpu, gpu, ...) takes the XLA path (ADVICE r4).
    if jax.default_backend() != "tpu":
        return False
    from efficientconformer_tpu.ops import pallas_attention as PA

    d = max(q.shape[-1], v.shape[-1])
    return not PA.fits_vmem(q.shape[-2], k.shape[-2], d)


def _factorize_on(structurally_ok: bool) -> bool:
    """ECF_REL_FACTORIZE=0 forces the skewing path for A/B measurement (it
    can only disable: factorization is invalid for causal/even-G/full-mask
    shapes regardless of the env)."""
    if not structurally_ok:
        return False
    import os

    return os.environ.get("ECF_REL_FACTORIZE") not in ("0", "false", "off")


def _use_fused_relpos(nq: int, nk: int, dh: int, hd2: int,
                      training: bool = True) -> bool:
    """Dispatch policy for the fused factorized rel-pos kernel
    (ops/pallas_rel_attention.py). Default: on TPU whenever the single-block
    kernel fits VMEM — measured faster than the augmented-feature XLA path at
    every shipped training size (see BENCH_DETAILS.md); the kernel keeps the
    A/C features and the (N, N) score/probability tensors out of HBM in both
    directions.

    At INFERENCE (no dropout rng) the backward-pass savings don't exist and
    the crossover moves: measured on v5e (scripts/infer_sweep.py --ab, CTC
    Small greedy), the kernel is -3..0% at 10 s audio (stage-1 N=250) and
    +5..13% at 16 s (N=400), so auto additionally requires nq >= 320 there.
    ECF_FUSED_RELPOS=0/1 overrides for A/B."""
    import os

    env = os.environ.get("ECF_FUSED_RELPOS")
    if env is not None:
        return env not in ("0", "false", "off")
    import jax

    if jax.default_backend() != "tpu":
        return False
    if not training and nq < 320:
        return False
    from efficientconformer_tpu.ops import pallas_rel_attention as PRA

    return PRA.fits_vmem(nq, nk, dh, hd2)


def _lane_half(d: int) -> int:
    """Lane-padded half-width for the fused rel-pos layout — single source
    of truth is ops/pallas_rel_attention.lane_half (ADVICE r4: the prep
    layout and the kernel must agree on the lane size)."""
    from efficientconformer_tpu.ops.pallas_rel_attention import lane_half

    return lane_half(d)


def _attend(q, k, v, bias, scale, fused: Optional[bool]):
    """softmax(q k^T * scale + bias) v with optional Pallas fusion.

    bias is the full additive term: rel-pos scores (already scaled) plus the
    mask contribution; None means no bias.
    """
    from efficientconformer_tpu.ops import pallas_attention as PA

    if bias is None:
        bias = jnp.zeros((1, 1, 1, k.shape[2]), jnp.float32)
    if _use_fused(fused, q, k, v):
        return PA.fused_bias_attention(q, k, v, bias, scale)
    s = jnp.matmul(q, jnp.swapaxes(k, -1, -2)) * scale
    o, _ = A.softmax_attention(s + bias.astype(s.dtype), v)
    return o


class MultiHeadSelfAttention(nn.Module):
    dim_model: int
    num_heads: int
    causal: bool = False
    group_size: int = 1
    kernel_size: Optional[int] = None   # local attention window
    stride: int = 1                     # query stride
    linear_att: bool = False
    relative_pos_enc: bool = False
    vn_std: Optional[float] = None
    fused: Optional[bool] = None        # None = auto (Pallas on TPU)

    def _rel_bias(self, name: str, dim_head: int) -> jnp.ndarray:
        return self.param(
            name, _xavier_bias_init(self.num_heads, dim_head), (self.dim_model,)
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask=None, hidden=None):
        d, h = self.dim_model, self.num_heads
        g, s = self.group_size, self.stride
        kw = self.kernel_size
        t_in = x.shape[1]

        q = Dense(d, name="query", vn_std=self.vn_std)(x)
        k = Dense(d, name="key", vn_std=self.vn_std)(x)
        v = Dense(d, name="value", vn_std=self.vn_std)(x)

        new_hidden = None

        # ---------------------------------------- fixed-capacity cache step
        # ``hidden`` = {"k": (B, L, D), "v": (B, L, D), "pos": (B,)} marks a
        # STATIC KV cache with a per-row write position: x is a single-token
        # query (B, 1, D). Unlike the growing-cache path below, the carry
        # shape never changes, so beam searches can stack/gather hypothesis
        # states freely (decoding/rnnt_beam_device.py). Per-row positions let
        # hypotheses of different lengths share one batch.
        if hidden is not None and isinstance(hidden, dict) and "pos" in hidden:
            assert g == 1 and kw is None and s == 1 and not self.linear_att
            assert x.shape[1] == 1, "fixed-cache path is a single-token step"
            import jax

            b = x.shape[0]
            cap = hidden["k"].shape[1]
            posn = hidden["pos"]
            kc = hidden["k"].at[jnp.arange(b), posn].set(k[:, 0])
            vc = hidden["v"].at[jnp.arange(b), posn].set(v[:, 0])
            dh = d // h
            kh = A.split_heads(kc, h)               # (B, H, L, dh)
            vh = A.split_heads(vc, h)
            if self.relative_pos_enc:
                u = self._rel_bias("u", dh)
                vbias = self._rel_bias("v", dh)
                pos_layer = Dense(d, name="pos")
                qu = A.split_heads(q + u.astype(x.dtype), h)[:, :, 0]
                qv = A.split_heads(q + vbias.astype(x.dtype), h)[:, :, 0]
                content = jnp.einsum("bhd,bhjd->bhj", qu, kh)
                # causal rel table for distances 0..cap-1; entry i holds
                # distance (cap-1 - i), so key j of row b indexes
                # j + (cap-1 - pos_b)
                table = pos_layer(
                    P.relative_encoding(1, d, hidden_len=cap - 1, causal=True)
                    .astype(x.dtype)
                ).reshape(cap, h, dh)
                idx = jnp.clip(
                    jnp.arange(cap)[None, :] + (cap - 1) - posn[:, None],
                    0, cap - 1,
                )
                e_sel = jnp.take(table, idx, axis=0)  # (B, L, H, dh)
                rel = jnp.einsum("bhd,bjhd->bhj", qv, e_sel)
                scores = (content + rel) / math.sqrt(dh)
            else:
                qh = A.split_heads(q, h)[:, :, 0]
                scores = jnp.einsum("bhd,bhjd->bhj", qh, kh) / math.sqrt(dh)
            invalid = jnp.arange(cap)[None, None, :] > posn[:, None, None]
            scores = jnp.where(invalid, A.NEG_INF, scores)
            p_att = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            o = jnp.einsum("bhj,bhjd->bhd", p_att.astype(vh.dtype), vh)
            o = o.reshape(b, 1, d)
            new_hidden = {"k": kc, "v": vc, "pos": posn + 1}
            return Dense(d, name="output", vn_std=self.vn_std)(o), new_hidden

        # ------------------------------------------------ linear attention
        if self.linear_att:
            dh = d // h
            qh = A.split_heads(q, h)
            kh = A.split_heads(k, h)
            vh = A.split_heads(v, h)
            scale = dh ** 0.25
            kv = jnp.einsum(
                "bhtd,bhte->bhde", nn.softmax(kh / scale, axis=-2), vh
            )
            o = jnp.einsum("bhtd,bhde->bhte", nn.softmax(qh / scale, axis=-1), kv)
            o = A.merge_heads(o)
            return Dense(d, name="output", vn_std=self.vn_std)(o), None

        # ------------------------------------------------ rel-pos variants
        if self.relative_pos_enc:
            u = self._rel_bias("u", (g * d) // h)
            vbias = self._rel_bias("v", (g * d) // h)
            pos_layer = Dense(d, name="pos")

            if g > 1:
                # grouped rel-pos (the Efficient Conformer signature op)
                if hidden is not None:
                    th = hidden["k"].shape[1]
                    k_att = jnp.concatenate([hidden["k"][:, th % g :], k], axis=1)
                    v_att = jnp.concatenate([hidden["v"][:, th % g :], v], axis=1)
                    new_hidden = {
                        "k": jnp.concatenate([hidden["k"], k], axis=1),
                        "v": jnp.concatenate([hidden["v"], v], axis=1),
                    }
                else:
                    k_att, v_att = k, v
                    new_hidden = {"k": k, "v": v}
                qp, pad_q = M.pad_to_multiple(q, g)
                kp, _ = M.pad_to_multiple(k_att, g)
                vp, _ = M.pad_to_multiple(v_att, g)
                mask_p = M.pad_mask_to_multiple(mask, g)
                t_pad = qp.shape[1]
                hid_len = kp.shape[1] - t_pad
                dh = g * d // h
                qu = A.group_time(qp + u.astype(x.dtype), h, g)
                qv = A.group_time(qp + vbias.astype(x.dtype), h, g)
                kg = A.group_time(kp, h, g)
                vg = A.group_time(vp, h, g)

                key_only = mask_p is None or mask_p.shape[-2] == 1
                # Factorisation requires the encoding values to be linear in
                # (p - q), which holds only for odd G (even-G tables duplicate
                # position 0, see ops/pos_enc.grouped_relative_encoding).
                if _factorize_on(not self.causal and key_only and g % 2 == 1):
                    # factorised grouped rel-pos: no (B, H, Ng, Ng) bias
                    from efficientconformer_tpu.ops import rel_factorize as RF

                    pos_layer(jnp.zeros((1, d), x.dtype))  # create params
                    w = pos_layer.variables["params"]["kernel"].astype(x.dtype)
                    nq_, nk_ = qu.shape[2], kg.shape[2]
                    bias = (
                        mask_p[:, :, ::g, ::g] * A.NEG_INF
                        if mask_p is not None else None
                    )
                    hdp = _lane_half(d)
                    if _use_fused_relpos(nq_, nk_, dh, 2 * hdp,
                                         training=self.has_rng("dropout")):
                        # fused kernel: per-head folded weights + bias delta
                        # in, P/Q accumulators and the rel bias formed in
                        # VMEM — no per-token rel tensor in HBM at all.
                        # qv_g = group_time(qp + vbias) = qu_g + delta with
                        # delta[h, l] = (vbias - u)[(h*dhg + l) % D] — a
                        # tile-G of the bias difference (group_time folds G
                        # frames into the head dim, ops/attention.py:159).
                        from efficientconformer_tpu.ops import (
                            pallas_rel_attention as PRA,
                        )

                        delta = jnp.tile(
                            (vbias - u).astype(x.dtype), g
                        ).reshape(h, dh)
                        w_h = RF.rel_w_grouped(h, dh, w, g, hdp, hid_len)
                        rowtab = RF.rel_rowtab(nq_, d, hdp, x.dtype, stride=g)
                        keytab = RF.rel_keytab_halves(
                            nk_, d, hdp, x.dtype, stride=g
                        )
                        o = PRA.fused_relpos_attention(
                            qu, kg, vg, delta, w_h, rowtab, keytab, bias,
                            1.0 / math.sqrt(dh), d,
                        )
                    else:
                        a_feat = RF.grouped_rel_query_features(
                            qv, w, g, hid_len
                        )
                        c_feat = RF.rel_key_features(
                            kg.shape[2], d, x.dtype, stride=g
                        )
                        q_aug = jnp.concatenate([qu, a_feat], axis=-1)
                        k_aug = jnp.concatenate(
                            [kg, jnp.broadcast_to(
                                c_feat[None, None],
                                (kg.shape[0], h) + c_feat.shape
                            )],
                            axis=-1,
                        )
                        o = _attend(q_aug, k_aug, vg, bias,
                                    1.0 / math.sqrt(dh), self.fused)
                else:
                    e = pos_layer(
                        P.grouped_relative_encoding(
                            t_pad, d, g, hidden_len=hid_len, causal=self.causal
                        ).astype(x.dtype)
                    )
                    eg = e.reshape(-1, h, dh)
                    att_e = jnp.einsum("bhqd,lhd->bhql", qv, eg)
                    att_e = (
                        A.rel_to_abs_causal(att_e)
                        if self.causal else A.rel_to_abs_full(att_e)
                    )
                    bias = att_e / math.sqrt(dh)
                    if mask_p is not None:
                        bias = bias + mask_p[:, :, ::g, ::g] * A.NEG_INF
                    o = _attend(qu, kg, vg, bias, 1.0 / math.sqrt(dh), self.fused)
                o = A.ungroup_time(o, d)[:, :t_in]
                return Dense(d, name="output", vn_std=self.vn_std)(o), new_hidden

            if kw is not None and s == 1:
                # local rel-pos: non-overlapping blocks of size kw
                qp, pad_q = M.pad_to_multiple(q, kw)
                kp, _ = M.pad_to_multiple(k, kw)
                vp, _ = M.pad_to_multiple(v, kw)
                mask_p = _ensure_kv_mask(mask, t_in, kw)
                dh = d // h
                e = pos_layer(
                    P.relative_encoding(kw, d, causal=self.causal).astype(x.dtype)
                ).reshape(-1, h, dh)
                qu = _split_blocks(qp + u.astype(x.dtype), kw, h)   # (B,N,H,K,dh)
                qv = A.split_heads(qp + vbias.astype(x.dtype), h)   # (B,H,T,dh)
                kb = _split_blocks(kp, kw, h)
                vb = _split_blocks(vp, kw, h)
                att_k = jnp.matmul(qu, kb.transpose(0, 1, 2, 4, 3))
                rel = jnp.einsum("bhtd,lhd->bhtl", qv, e)
                att_e = (
                    A.rel_to_abs_local_causal(rel, kw)
                    if self.causal
                    else A.rel_to_abs_local_full(rel, kw)
                )
                # both att_k and att_e are (B, N, H, K, K)
                scores = (att_k + att_e) / math.sqrt(dh)
                if mask_p is not None:
                    scores = scores + M.local_block_diagonal(mask_p, kw) * A.NEG_INF
                o, _ = A.softmax_attention(scores, vb)
                o = _merge_blocks(o, d)[:, :t_in]
                return Dense(d, name="output", vn_std=self.vn_std)(o), new_hidden

            if kw is None and s > 1:
                # strided rel-pos: queries subsampled, full keys
                if hidden is not None:
                    k_att = jnp.concatenate([hidden["k"], k], axis=1)
                    v_att = jnp.concatenate([hidden["v"], v], axis=1)
                else:
                    k_att, v_att = k, v
                new_hidden = {"k": k_att, "v": v_att}
                qp, pad_q = M.pad_to_multiple(q, s)
                kp, _ = M.pad_to_multiple(k_att, s)
                vp, _ = M.pad_to_multiple(v_att, s)
                mask_p = M.pad_mask_to_multiple(mask, s)
                qs = qp[:, ::s]
                t_full = s * qs.shape[1]
                hid_len = kp.shape[1] - t_full
                dh = d // h
                e = pos_layer(
                    P.relative_encoding(
                        t_full, d, hidden_len=hid_len, causal=self.causal
                    ).astype(x.dtype)
                ).reshape(-1, h, dh)
                qu = A.split_heads(qs + u.astype(x.dtype), h)
                qv = A.split_heads(qs + vbias.astype(x.dtype), h)
                kh = A.split_heads(kp, h)
                vh = A.split_heads(vp, h)
                rel = jnp.einsum("bhqd,lhd->bhql", qv, e)
                att_e = (
                    A.rel_to_abs_strided_causal(rel, s)
                    if self.causal
                    else A.rel_to_abs_strided_full(rel, s)
                )
                bias = att_e / math.sqrt(dh)
                if mask_p is not None:
                    bias = bias + mask_p[:, :, ::s] * A.NEG_INF
                o = _attend(qu, kh, vh, bias, 1.0 / math.sqrt(dh), self.fused)
                o = A.merge_heads(o)[:, : _ceil_div(t_in, s)]
                return Dense(d, name="output", vn_std=self.vn_std)(o), new_hidden

            if kw is not None and s > 1:
                # strided local rel-pos
                qp, pad_q = M.pad_to_multiple(q, kw)
                kp, _ = M.pad_to_multiple(k, kw)
                vp, _ = M.pad_to_multiple(v, kw)
                mask_p = _ensure_kv_mask(mask, t_in, kw)
                qs = qp[:, ::s]
                dh = d // h
                e = pos_layer(
                    P.relative_encoding(kw, d, causal=self.causal).astype(x.dtype)
                ).reshape(-1, h, dh)
                qu = _split_blocks(qs + u.astype(x.dtype), kw // s, h)
                qv = A.split_heads(qs + vbias.astype(x.dtype), h)
                kb = _split_blocks(kp, kw, h)
                vb = _split_blocks(vp, kw, h)
                att_k = jnp.matmul(qu, kb.transpose(0, 1, 2, 4, 3))
                rel = jnp.einsum("bhqd,lhd->bhql", qv, e)
                att_e = (
                    A.rel_to_abs_strided_local_causal(rel, kw, s)
                    if self.causal
                    else A.rel_to_abs_strided_local_full(rel, kw, s)
                )
                scores = (att_k + att_e) / math.sqrt(dh)
                if mask_p is not None:
                    mblk = M.local_block_diagonal(mask_p, kw)[:, :, :, ::s]
                    scores = scores + mblk * A.NEG_INF
                o, _ = A.softmax_attention(scores, vb)
                o = _merge_blocks(o, d)[:, : _ceil_div(t_in, s)]
                return Dense(d, name="output", vn_std=self.vn_std)(o), new_hidden

            # plain rel-pos (Transformer-XL style)
            if hidden is not None:
                k = jnp.concatenate([hidden["k"], k], axis=1)
                v = jnp.concatenate([hidden["v"], v], axis=1)
            new_hidden = {"k": k, "v": v}
            hid_len = k.shape[1] - q.shape[1]
            dh = d // h
            qu = A.split_heads(q + u.astype(x.dtype), h)
            qv = A.split_heads(q + vbias.astype(x.dtype), h)
            kh = A.split_heads(k, h)
            vh = A.split_heads(v, h)

            key_only_mask = mask is None or mask.shape[-2] == 1
            if _factorize_on(not self.causal and key_only_mask):
                # Factorised rel-pos (exact, see ops/rel_factorize.py): fold
                # the sinusoidal scores into augmented q/k features so no
                # (B, H, N, N) bias tensor is materialised — the HBM-dominant
                # term of the skewing path at batch scale.
                from efficientconformer_tpu.ops import rel_factorize as RF

                # force pos-layer parameter creation, then read its kernel
                pos_w = pos_layer(jnp.zeros((1, d), x.dtype))
                w = pos_layer.variables["params"]["kernel"].astype(x.dtype)
                bias = mask * A.NEG_INF if mask is not None else None
                nq_, nk_ = qu.shape[2], kh.shape[2]
                hdp = _lane_half(d)
                if _use_fused_relpos(nq_, nk_, dh, 2 * hdp,
                                     training=self.has_rng("dropout")):
                    # per-head folded weights + bias delta in; qv = qu +
                    # delta with delta = split_heads(vbias - u)
                    from efficientconformer_tpu.ops import (
                        pallas_rel_attention as PRA,
                    )

                    delta = (vbias - u).astype(x.dtype).reshape(h, dh)
                    w_h = RF.rel_w_plain(w, h, hdp)
                    rowtab = RF.rel_rowtab(
                        nq_, d, hdp, x.dtype, hidden_len=hid_len
                    )
                    keytab = RF.rel_keytab_halves(nk_, d, hdp, x.dtype)
                    o = PRA.fused_relpos_attention(
                        qu, kh, vh, delta, w_h, rowtab, keytab, bias,
                        1.0 / math.sqrt(dh), d,
                    )
                else:
                    a_feat = RF.rel_query_features(qv, w, hidden_len=hid_len)
                    c_feat = RF.rel_key_features(k.shape[1], d, x.dtype)
                    q_aug = jnp.concatenate([qu, a_feat], axis=-1)
                    k_aug = jnp.concatenate(
                        [kh, jnp.broadcast_to(
                            c_feat[None, None], (kh.shape[0], h) + c_feat.shape
                        )],
                        axis=-1,
                    )
                    o = _attend(q_aug, k_aug, vh, bias, 1.0 / math.sqrt(dh),
                                self.fused)
            else:
                e = pos_layer(
                    P.relative_encoding(
                        q.shape[1], d, hidden_len=hid_len, causal=self.causal
                    ).astype(x.dtype)
                ).reshape(-1, h, dh)
                rel = jnp.einsum("bhqd,lhd->bhql", qv, e)
                att_e = (
                    A.rel_to_abs_causal(rel) if self.causal else A.rel_to_abs_full(rel)
                )
                bias = att_e / math.sqrt(dh)
                if mask is not None:
                    bias = bias + mask * A.NEG_INF
                o = _attend(qu, kh, vh, bias, 1.0 / math.sqrt(dh), self.fused)
            o = A.merge_heads(o)
            return Dense(d, name="output", vn_std=self.vn_std)(o), new_hidden

        # ------------------------------------------------ absolute variants
        if g > 1:
            qp, _ = M.pad_to_multiple(q, g)
            kp, _ = M.pad_to_multiple(k, g)
            vp, _ = M.pad_to_multiple(v, g)
            mask_p = M.pad_mask_to_multiple(mask, g)
            dh = g * d // h
            qg = A.group_time(qp, h, g)
            kg = A.group_time(kp, h, g)
            vg = A.group_time(vp, h, g)
            bias = mask_p[:, :, ::g, ::g] * A.NEG_INF if mask_p is not None else None
            o = _attend(qg, kg, vg, bias, 1.0 / math.sqrt(dh), self.fused)
            o = A.ungroup_time(o, d)[:, :t_in]
        elif kw is not None and s == 1:
            qp, _ = M.pad_to_multiple(q, kw)
            kp, _ = M.pad_to_multiple(k, kw)
            vp, _ = M.pad_to_multiple(v, kw)
            mask_p = _ensure_kv_mask(mask, t_in, kw)
            dh = d // h
            qb = _split_blocks(qp, kw, h)
            kb = _split_blocks(kp, kw, h)
            vb = _split_blocks(vp, kw, h)
            scores = jnp.matmul(qb, kb.transpose(0, 1, 2, 4, 3)) / math.sqrt(dh)
            if mask_p is not None:
                scores = scores + M.local_block_diagonal(mask_p, kw) * A.NEG_INF
            o, _ = A.softmax_attention(scores, vb)
            o = _merge_blocks(o, d)[:, :t_in]
        elif kw is not None and s > 1:
            qp, _ = M.pad_to_multiple(q, kw)
            kp, _ = M.pad_to_multiple(k, kw)
            vp, _ = M.pad_to_multiple(v, kw)
            mask_p = _ensure_kv_mask(mask, t_in, kw)
            dh = d // h
            qb = _split_blocks(qp[:, ::s], kw // s, h)
            kb = _split_blocks(kp, kw, h)
            vb = _split_blocks(vp, kw, h)
            scores = jnp.matmul(qb, kb.transpose(0, 1, 2, 4, 3)) / math.sqrt(dh)
            if mask_p is not None:
                mblk = M.local_block_diagonal(mask_p, kw)[:, :, :, ::s]
                scores = scores + mblk * A.NEG_INF
            o, _ = A.softmax_attention(scores, vb)
            o = _merge_blocks(o, d)[:, : _ceil_div(t_in, s)]
        elif s > 1:
            dh = d // h
            qh = A.split_heads(q[:, ::s], h)
            kh = A.split_heads(k, h)
            vh = A.split_heads(v, h)
            bias = mask[:, :, ::s] * A.NEG_INF if mask is not None else None
            o = _attend(qh, kh, vh, bias, 1.0 / math.sqrt(dh), self.fused)
            o = A.merge_heads(o)
        else:
            dh = d // h
            qh = A.split_heads(q, h)
            kh = A.split_heads(k, h)
            vh = A.split_heads(v, h)
            bias = mask * A.NEG_INF if mask is not None else None
            o = _attend(qh, kh, vh, bias, 1.0 / math.sqrt(dh), self.fused)
            o = A.merge_heads(o)
        return Dense(d, name="output", vn_std=self.vn_std)(o), new_hidden


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _split_blocks(x: jnp.ndarray, block: int, num_heads: int) -> jnp.ndarray:
    """(B, T, D) -> (B, T//block, H, block, D/H)."""
    b, t, d = x.shape
    dh = d // num_heads
    return x.reshape(b, t // block, block, num_heads, dh).transpose(0, 1, 3, 2, 4)


def _merge_blocks(x: jnp.ndarray, dim_model: int) -> jnp.ndarray:
    """(B, N, H, K, dh) -> (B, N*K, D)."""
    b, n, h, k, dh = x.shape
    return x.transpose(0, 1, 3, 2, 4).reshape(b, n * k, dim_model)


def _ensure_kv_mask(mask, t_in: int, chunk: int):
    """Pad a mask to a multiple of chunk; create a pure-padding mask when the
    input needs chunk padding but no mask was given (reference
    models/attentions.py:133-136)."""
    if mask is None:
        if t_in % chunk == 0:
            return None
        pad = (-t_in) % chunk
        base = jnp.zeros((1, 1, 1, t_in), jnp.float32)
        return jnp.pad(base, ((0, 0), (0, 0), (0, 0), (0, pad)), constant_values=1.0)
    return M.pad_mask_to_multiple(mask, chunk)
