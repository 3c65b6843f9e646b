"""Factorized relative-position attention scores.

The rel-pos score of the skewing path is
    S2_h[i, j] = Qv_h[i] . E_h[v],   v = i + Th - j,
    E = pos_layer(sinusoid(v))  (bias dropped: constant per query row, so it
                                 cancels in the softmax)
Because the encoding is sinusoidal, S2 factorises exactly by the angle-addition
identities: with gamma_h = Qv_h @ W_h^T  (W_h = pos_layer kernel columns of
head h), alpha_k = gamma[2k], beta_k = gamma[2k+1], omega_k the sinusoid
frequencies, and s_i = sin((i+Th) w_k), c_i = cos((i+Th) w_k):

    S2_h[i, j] = A_h[i] . C[j]
    A_h[i][2k]   = alpha_k s_i + beta_k c_i
    A_h[i][2k+1] = beta_k s_i - alpha_k c_i
    C[j][2k]     = cos(j w_k)
    C[j][2k+1]   = sin(j w_k)

So rel-pos attention is plain attention over augmented features
q~ = [Qu, A], k~ = [K, C] — no (B, H, N, N) bias tensor is ever materialised,
which removes the dominant HBM traffic of the skewing path at batch scale.
Exactness is verified against the skewing path in tests/test_rel_factorize.py.

Only the full-context (non-causal) plain variant needs this (the encoder hot
path); grouped/local/strided and causal variants keep the skewing path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _freqs(dim: int) -> np.ndarray:
    return 1.0 / 10000.0 ** (2.0 * np.arange(dim // 2) / dim)


# ---------------------------------------------------------------------------
# Half-separated (lane-aligned) layouts for the fused Pallas kernel
# (ops/pallas_rel_attention.py): P/Q and sin/cos live in two contiguous
# halves of width hdp = round_up(D/2, lane) instead of interleaved pairs.
# The padding is folded into the STATIC weight/table tensors, so no
# per-token relayout or pad copy ever materializes in HBM.
# ---------------------------------------------------------------------------


def _pad_half(x: np.ndarray, hdp: int, axis: int = -1) -> np.ndarray:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, hdp - x.shape[axis])
    return np.pad(x, pad)


def rel_rowtab(
    n: int, dim: int, hdp: int, dtype, hidden_len: int = 0, stride: int = 1
) -> jnp.ndarray:
    """(N, 2*hdp) [sin | cos] of the query-row angles pos_i * w_k, with
    pos_i = i*stride + hidden_len (stride=G for grouped attention)."""
    wk = _freqs(dim)
    pos = np.arange(n) * stride + hidden_len
    ang = pos[:, None] * wk[None, :]
    return jnp.asarray(
        np.concatenate(
            [_pad_half(np.sin(ang), hdp), _pad_half(np.cos(ang), hdp)], -1
        ),
        dtype,
    )


def rel_keytab_halves(
    n_keys: int, dim: int, hdp: int, dtype, stride: int = 1
) -> jnp.ndarray:
    """(Nk, 2*hdp) [cos | sin] of the key angles (stride=G for grouped)."""
    wk = _freqs(dim)
    pos = np.arange(n_keys) * stride
    ang = pos[:, None] * wk[None, :]
    return jnp.asarray(
        np.concatenate(
            [_pad_half(np.cos(ang), hdp), _pad_half(np.sin(ang), hdp)], -1
        ),
        dtype,
    )


def rel_w_plain(
    pos_kernel: jnp.ndarray, num_heads: int, hdp: int
) -> jnp.ndarray:
    """(H, dh, 2*hdp) folded per-head weights for the plain factorization:
    pq[b, h, n] = qv[b, h, n] @ w[h] gives the [P | Q] halves (P = alpha =
    even gamma rows, Q = beta = odd rows; see rel_query_features). TINY
    (weight-sized): the fused kernel (ops/pallas_rel_attention.py) takes this
    instead of the (B, H, N, 2*hdp) pq tensor so the accumulators never
    round-trip HBM."""
    d = pos_kernel.shape[0]
    h = num_heads
    dh = d // h
    w = pos_kernel.reshape(d, h, dh)
    wa = w[0::2]                                          # (D/2, H, dh)
    wb = w[1::2]
    zeros = jnp.zeros((hdp - d // 2, h, dh), w.dtype)
    w_half = jnp.concatenate([wa, zeros, wb, zeros], axis=0)   # (2hdp, H, dh)
    return w_half.transpose(1, 2, 0)                      # (H, dh, 2hdp)


def rel_w_grouped(
    num_heads: int, dim_head_g: int, pos_kernel: jnp.ndarray,
    group_size: int, hdp: int, hidden_len: int = 0,
) -> jnp.ndarray:
    """(H, dhg, 2*hdp) chunk-phase-folded per-head weights for the grouped
    factorization (same contract as rel_w_plain)."""
    w_pq = _grouped_fold_weights(
        num_heads, dim_head_g, pos_kernel, group_size, hidden_len
    )
    hd = w_pq.shape[-1]
    return jnp.concatenate(
        [
            jnp.pad(w_pq[:, :, 0], ((0, 0), (0, 0), (0, hdp - hd))),
            jnp.pad(w_pq[:, :, 1], ((0, 0), (0, 0), (0, hdp - hd))),
        ],
        axis=-1,
    )                                                     # (H, dhg, 2hdp)


def rel_pq_plain(qv: jnp.ndarray, pos_kernel: jnp.ndarray, hdp: int) -> jnp.ndarray:
    """(B, H, N, 2*hdp) [P | Q] accumulators for the plain factorization
    (tests / XLA paths; the fused kernel computes this product in VMEM)."""
    h = qv.shape[1]
    return jnp.einsum("bhnd,hdk->bhnk", qv, rel_w_plain(pos_kernel, h, hdp))


def rel_pq_grouped(
    qv_g: jnp.ndarray, pos_kernel: jnp.ndarray, group_size: int, hdp: int,
    hidden_len: int = 0,
) -> jnp.ndarray:
    """(B, H, Ng, 2*hdp) [P | Q] chunk-phase-folded accumulators for the
    grouped factorization (tests / XLA paths; the fused kernel computes this
    product in VMEM)."""
    _, h, _, dhg = qv_g.shape
    w_half = rel_w_grouped(h, dhg, pos_kernel, group_size, hdp, hidden_len)
    return jnp.einsum("bhnl,hlk->bhnk", qv_g, w_half)


def rel_query_features(
    qv: jnp.ndarray,          # (B, H, N, dh) query + v-bias, head-split
    pos_kernel: jnp.ndarray,  # (D, D) pos_layer Dense kernel
    hidden_len: int = 0,
) -> jnp.ndarray:
    """A: (B, H, N, D) query-side augmented features."""
    b, h, n, dh = qv.shape
    d = pos_kernel.shape[0]
    # gamma[b,h,i,:] = qv[b,h,i,:] @ W_h^T, W_h = pos_kernel[:, h*dh:(h+1)*dh]
    w = pos_kernel.reshape(d, h, dh)                      # (D, H, dh)
    gamma = jnp.einsum("bhnd,khd->bhnk", qv, w)           # (B, H, N, D)
    # de-interleave via reshape+index rather than gamma[..., 0::2]: the
    # transpose of a strided slice is a scatter-add, of a plain slice a pad
    gpair = gamma.reshape(b, h, n, d // 2, 2)
    alpha = gpair[..., 0]
    beta = gpair[..., 1]

    wk = jnp.asarray(_freqs(d), qv.dtype)                 # (D/2,)
    pos = (jnp.arange(n) + hidden_len).astype(qv.dtype)   # (N,)
    ang = pos[:, None] * wk[None, :]                      # (N, D/2)
    s = jnp.sin(ang)[None, None]
    c = jnp.cos(ang)[None, None]

    # interleave even/odd via stack+reshape: a[..., 0::2], a[..., 1::2] as
    # strided .at[] updates would lower to scatters (and gathers in the
    # backward); this is a pure layout op both ways
    return jnp.stack(
        [alpha * s + beta * c, beta * s - alpha * c], axis=-1
    ).reshape(b, h, n, d)


def rel_key_features(
    n_keys: int, dim: int, dtype=jnp.float32, stride: int = 1
) -> jnp.ndarray:
    """C: (n_keys, D) key-side augmented features (shared across batch/heads).

    ``stride`` scales key positions (grouped attention: key group q sits at
    ungrouped position G*q)."""
    wk = _freqs(dim)
    pos = np.arange(n_keys) * stride
    ang = pos[:, None] * wk[None, :]
    out = np.zeros((n_keys, dim), np.float32)
    out[:, 0::2] = np.cos(ang)
    out[:, 1::2] = np.sin(ang)
    return jnp.asarray(out, dtype)


def grouped_rel_query_features(
    qv_g: jnp.ndarray,        # (B, H, Ng, G*D/H) grouped query + v-bias
    pos_kernel: jnp.ndarray,  # (D, D) pos_layer Dense kernel
    group_size: int,
    hidden_len: int = 0,      # ungrouped units, group-aligned
) -> jnp.ndarray:
    """A: (B, H, Ng, D) query-side features for grouped rel-pos attention.

    Grouped attention folds G frames into the head dim, so each head's rel
    feature vector is a slice of the concatenation of G consecutive encodings
    (reference models/attentions.py:686-691). The grouped encoding value for
    (query group p, key group q, chunk r) is v = G*p - G*q + c_r with
    c_r = G - 1 - G//2 + hidden_len - r, so the factorisation of
    rel_query_features applies per chunk with phase (G*p + c_r) and sums over
    chunks (the key-side features depend on G*q only). Verified exact against
    the skewing path in tests/test_rel_factorize.py.
    """
    b, h, ng, dhg = qv_g.shape
    d = pos_kernel.shape[0]
    g = group_size
    w_pq = _grouped_fold_weights(h, dhg, pos_kernel, g, hidden_len)
    pq = jnp.einsum("bhnl,hlsj->bhnsj", qv_g, w_pq)       # (B, H, Ng, 2, D/2)
    p_acc = pq[..., 0, :]
    q_acc = pq[..., 1, :]

    wk_j = jnp.asarray(_freqs(d), qv_g.dtype)
    p_pos = (jnp.arange(ng) * g).astype(qv_g.dtype)       # (Ng,)
    ang = p_pos[:, None] * wk_j[None, :]                  # (Ng, D/2)
    s = jnp.sin(ang)[None, None]
    c = jnp.cos(ang)[None, None]

    even = s * p_acc + c * q_acc                          # (B, H, Ng, D/2)
    odd = s * q_acc - c * p_acc
    return jnp.stack([even, odd], axis=-1).reshape(b, h, ng, d)


def _grouped_fold_weights(
    h: int, dhg: int, pos_kernel: jnp.ndarray, g: int, hidden_len: int
) -> jnp.ndarray:
    """(H, dhg, 2, D/2) folded weights mapping grouped qv to the P (s=0) and
    Q (s=1) accumulators; see grouped_rel_query_features for the derivation.
    """
    d = pos_kernel.shape[0]

    # Grouped-encoding feature f = head*dhg + l lies in chunk r = f // D and
    # maps to sinusoid-kernel row f % D (h*dhg == g*d by construction). The
    # per-(head, chunk) kernel segments are selected by a STATIC one-hot
    # tensor so the whole computation stays in einsums — the earlier
    # per-head/per-chunk Python loop with strided .at[].add updates lowered
    # to ~h*g scatter-adds per block (and gathers in the backward), which
    # dominated the training step's layout-copy traffic on TPU.
    #
    # The chunk phases are then FOLDED INTO THE WEIGHTS: the angle
    # (G p + c_r) w_k separates as sin(Gp w)cos(c_r w) + cos(Gp w)sin(c_r w),
    # and the c_r tables are static, so with alpha_r s + beta_r c summed over
    # chunks
    #     even = S.P + C.Q,   odd = S.Q - C.P,
    #     P = sum_r (alpha_r X_r - beta_r Y_r),  Q = sum_r (alpha_r Y_r +
    #     beta_r X_r),   X_r = cos(c_r w), Y_r = sin(c_r w)
    # P and Q are linear in qv with static coefficients — two (B, H, Ng, D/2)
    # einsum outputs instead of the (B, H, Ng, G, D) per-chunk gamma tensor:
    # 1/G the matmul FLOPs and 1/G the intermediate bytes of the chunk-sum
    # formulation (the bf16[B,H,Ng,G,D/2,2] tensors this replaced were among
    # the largest non-matmul HLO traffic at stage-1-grouped configs).
    f = np.arange(h * dhg).reshape(h, dhg)
    onehot = np.zeros((h, dhg, g, d), np.float32)
    onehot[
        np.repeat(np.arange(h), dhg),
        np.tile(np.arange(dhg), h),
        (f // d).reshape(-1),
        (f % d).reshape(-1),
    ] = 1.0

    wk = _freqs(d)                                        # (D/2,)
    c_r = (g - 1 - g // 2 + hidden_len) - np.arange(g)    # (G,)
    ang_r = c_r[:, None] * wk[None, :]                    # (G, D/2)
    x_r = np.cos(ang_r)
    y_r = np.sin(ang_r)
    # static fold: coeff[r, k_sin, j] maps kernel output (r, 2j / 2j+1) to
    # the P (k_sin=0) and Q (k_sin=1) accumulators
    coeff = np.zeros((g, d, 2, d // 2), np.float32)
    j = np.arange(d // 2)
    for r in range(g):
        coeff[r, 2 * j, 0, j] = x_r[r]                    # alpha -> P
        coeff[r, 2 * j + 1, 0, j] = -y_r[r]               # beta  -> P
        coeff[r, 2 * j, 1, j] = y_r[r]                    # alpha -> Q
        coeff[r, 2 * j + 1, 1, j] = x_r[r]                # beta  -> Q

    # pos_kernel is indexed [output_k, feature_row] (gamma = qv @ W^T, same
    # convention as rel_query_features), so contract its SECOND axis; the
    # onehot/coeff contractions are tiny weight-side ops, fused at compile
    w_pq = jnp.einsum(
        "hlrd,kd,rksj->hlsj",
        jnp.asarray(onehot, pos_kernel.dtype),
        pos_kernel,
        jnp.asarray(coeff, pos_kernel.dtype),
    )                                                     # (H, dhg, 2, D/2)
    return w_pq
