"""Attention family: oracle + cross-variant equivalence tests.

Strategy (SURVEY.md §4): the plain rel-pos variant is checked against a naive
numpy gather oracle; every other variant is then checked against the plain one
through an exact mathematical equivalence (grouping with G=1, block-diagonal
masking for local, query subsampling for strided, chunked KV-cache streaming).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientconformer_tpu.models.attentions import MultiHeadSelfAttention
from efficientconformer_tpu.ops.masks import streaming_mask, local_block_diagonal

B, T, D, H = 2, 12, 16, 2


def make(x, **kw):
    mod = MultiHeadSelfAttention(dim_model=D, num_heads=H, **kw)
    params = mod.init(jax.random.PRNGKey(0), x)
    return mod, params


def x_input(t=T, b=B, seed=1):
    return jnp.array(np.random.default_rng(seed).standard_normal((b, t, D)), jnp.float32)


def sinusoid_np(pos, dim):
    i = np.arange(dim // 2)
    ang = np.asarray(pos, np.float64)[:, None] / 10000.0 ** (2 * i[None] / dim)
    pe = np.zeros((len(pos), dim))
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    return pe


def test_plain_relpos_vs_naive_oracle():
    x = x_input()
    mod, params = make(x, relative_pos_enc=True)
    mask = streaming_mask(T, jnp.array([12, 9]), T, T)
    out, _ = mod.apply(params, x, mask)

    p = jax.tree.map(np.asarray, params["params"])
    xq = np.asarray(x)

    def lin(name, z):
        return z @ p[name]["kernel"] + p[name]["bias"]

    q, k, v = lin("query", xq), lin("key", xq), lin("value", xq)
    u, vb = p["u"], p["v"]
    dh = D // H
    # E[r] for relative offset r = i - j
    offsets = np.arange(-(T - 1), T)
    e = sinusoid_np(offsets, D) @ p["pos"]["kernel"] + p["pos"]["bias"]

    def heads(z):
        return z.reshape(B, T, H, dh).transpose(0, 2, 1, 3)

    qu, qv = heads(q + u), heads(q + vb)
    kh, vh = heads(k), heads(v)
    eh = e.reshape(2 * T - 1, H, dh)
    scores = np.einsum("bhid,bhjd->bhij", qu, kh)
    for i in range(T):
        for j in range(T):
            # position value of key j relative to query i is i - j (positive =
            # past); eh is indexed by ascending offset starting at -(T-1)
            scores[:, :, i, j] += np.einsum(
                "bhd,hd->bh", qv[:, :, i], eh[(T - 1) + (i - j)]
            )
    scores /= np.sqrt(dh)
    scores += np.asarray(mask) * -1e9
    w = np.exp(scores - scores.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    o = np.einsum("bhij,bhjd->bhid", w, vh)
    o = o.transpose(0, 2, 1, 3).reshape(B, T, D)
    want = lin("output", o)
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-4)


@pytest.mark.parametrize("relpos", [False, True])
def test_grouped_g1_equals_plain(relpos):
    x = x_input()
    mask = streaming_mask(T, jnp.array([12, 9]), T, T)
    mod_p, params = make(x, relative_pos_enc=relpos, group_size=1)
    out_p, _ = mod_p.apply(params, x, mask)
    mod_g = MultiHeadSelfAttention(dim_model=D, num_heads=H, relative_pos_enc=relpos, group_size=1)
    out_g, _ = mod_g.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_g), atol=1e-5)


@pytest.mark.parametrize("relpos", [False, True])
@pytest.mark.parametrize("kernel", [4, 6])
def test_local_equals_block_masked_plain(relpos, kernel):
    x = x_input()
    x_len = jnp.array([T, T - 3])
    mask = streaming_mask(T, x_len, T, T)
    mod_l, params = make(x, relative_pos_enc=relpos, kernel_size=kernel)
    out_l, _ = mod_l.apply(params, x, mask)

    # plain attention with a block-diagonal mask over the same params
    i = np.arange(T)
    blockdiag = (i[:, None] // kernel != i[None, :] // kernel).astype(np.float32)
    mask_b = jnp.maximum(mask, jnp.array(blockdiag)[None, None])
    mod_p = MultiHeadSelfAttention(dim_model=D, num_heads=H, relative_pos_enc=relpos)
    out_p, _ = mod_p.apply(params, x, mask_b)
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_p), atol=2e-5)


@pytest.mark.parametrize("relpos", [False, True])
@pytest.mark.parametrize("stride", [2, 3])
def test_strided_equals_subsampled_plain(relpos, stride):
    x = x_input()
    x_len = jnp.array([T, T - 3])
    mask = streaming_mask(T, x_len, T, T)
    mod_s, params = make(x, relative_pos_enc=relpos, stride=stride)
    out_s, _ = mod_s.apply(params, x, mask)
    mod_p = MultiHeadSelfAttention(dim_model=D, num_heads=H, relative_pos_enc=relpos)
    out_p, _ = mod_p.apply(params, x, mask)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_p)[:, ::stride], atol=2e-5
    )


@pytest.mark.parametrize("relpos", [False, True])
def test_strided_local_equals_strided_block_masked(relpos):
    kernel, stride = 6, 2
    x = x_input()
    x_len = jnp.array([T, T - 3])
    mask = streaming_mask(T, x_len, T, T)
    mod_sl, params = make(x, relative_pos_enc=relpos, kernel_size=kernel, stride=stride)
    out_sl, _ = mod_sl.apply(params, x, mask)

    i = np.arange(T)
    blockdiag = (i[:, None] // kernel != i[None, :] // kernel).astype(np.float32)
    mask_b = jnp.maximum(mask, jnp.array(blockdiag)[None, None])
    mod_p = MultiHeadSelfAttention(dim_model=D, num_heads=H, relative_pos_enc=relpos)
    out_p, _ = mod_p.apply(params, x, mask_b)
    np.testing.assert_allclose(
        np.asarray(out_sl), np.asarray(out_p)[:, ::stride], atol=2e-5
    )


def test_grouped_g3_padding_invariance():
    """Grouped attention on a padded batch must equal the unpadded computation."""
    g = 3
    t_real = 9
    x9 = x_input(t=t_real, b=1, seed=3)
    x12 = jnp.pad(x9, ((0, 0), (0, 3), (0, 0)))
    mod, params = make(x9, relative_pos_enc=True, group_size=g)
    m9 = streaming_mask(t_real, jnp.array([t_real]), t_real, t_real)
    m12 = streaming_mask(12, jnp.array([t_real]), 12, 12)
    out9, _ = mod.apply(params, x9, m9)
    out12, _ = mod.apply(params, x12, m12)
    np.testing.assert_allclose(np.asarray(out9), np.asarray(out12)[:, :t_real], atol=2e-5)


@pytest.mark.parametrize("group,chunk", [(1, 1), (3, 3)])
def test_causal_streaming_kv_cache(group, chunk):
    """Chunked causal decode with KV-cache == full causal pass.

    As in the reference (models/decoders.py:100-106), the full pass uses a
    look-ahead mask while chunked decoding with hidden state needs none.
    Grouped attention is streaming-consistent only at group-aligned chunk
    boundaries (a grouped query spans G frames), hence chunk == group.
    """
    t = 6
    x = x_input(b=1, t=t)
    mod, params = make(x[:, :chunk], relative_pos_enc=True, causal=True, group_size=group)
    la = streaming_mask(t, None, t, 0)
    full, _ = mod.apply(params, x, la)
    outs, hidden = [], None
    for i in range(0, t, chunk):
        o, hidden = mod.apply(params, x[:, i : i + chunk], None, hidden)
        outs.append(o)
    got = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(got), atol=2e-5)


def test_linear_attention_matches_formula():
    x = x_input()
    mod, params = make(x, linear_att=True)
    out, _ = mod.apply(params, x)
    p = jax.tree.map(np.asarray, params["params"])

    def lin(name, z):
        return z @ p[name]["kernel"] + p[name]["bias"]

    xq = np.asarray(x)
    dh = D // H
    q = lin("query", xq).reshape(B, T, H, dh).transpose(0, 2, 1, 3)
    k = lin("key", xq).reshape(B, T, H, dh).transpose(0, 2, 1, 3)
    v = lin("value", xq).reshape(B, T, H, dh).transpose(0, 2, 1, 3)

    def softmax(z, axis):
        z = z - z.max(axis=axis, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=axis, keepdims=True)

    kv = np.einsum("bhtd,bhte->bhde", softmax(k / dh ** 0.25, -2), v)
    o = np.einsum("bhtd,bhde->bhte", softmax(q / dh ** 0.25, -1), kv)
    want = lin("output", o.transpose(0, 2, 1, 3).reshape(B, T, D))
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-5)
