"""Fused factorized rel-pos attention kernel (ops/pallas_rel_attention.py):
prep-layout equivalence vs the augmented-feature factorization, Pallas
forward/backward vs the jnp reference (interpret mode on CPU) — including
the in-kernel weight/bias-delta gradients reduced over the batch grid axis —
and module end-to-end equality against the skewing path for plain and
grouped variants.
"""

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import efficientconformer_tpu.ops.pallas_rel_attention as pra
import efficientconformer_tpu.ops.rel_factorize as RF
from efficientconformer_tpu.ops import attention as A


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def rand(*shape, seed=0):
    return jnp.array(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32
    )


def _lane_half(d):
    return ((d // 2 + 127) // 128) * 128


def _plain_inputs(b=2, h=2, n=13, nk=13, d=24, hid=0, seed=0):
    dh = d // h
    qu = rand(b, h, n, dh, seed=seed)
    delta = rand(h, dh, seed=seed + 1) * 0.5
    k = rand(b, h, nk, dh, seed=seed + 2)
    v = rand(b, h, nk, dh, seed=seed + 3)
    w = rand(d, d, seed=seed + 4) * 0.3
    hdp = _lane_half(d)
    w_h = RF.rel_w_plain(w, h, hdp)
    rowtab = RF.rel_rowtab(n, d, hdp, jnp.float32, hidden_len=hid)
    keytab = RF.rel_keytab_halves(nk, d, hdp, jnp.float32)
    return qu, delta, k, v, w, w_h, rowtab, keytab


def test_reference_matches_augmented_features_plain():
    """The (delta, w, rowtab, keytab) half-layout reproduces the
    augmented-feature factorization exactly: scores qu.k + A.C match."""
    qu, delta, k, v, w, w_h, rowtab, keytab = _plain_inputs(hid=0)
    d = w.shape[0]
    scale = 1.0 / math.sqrt(qu.shape[-1])
    qv = qu + delta[None, :, None, :]

    a_feat = RF.rel_query_features(qv, w, hidden_len=0)
    c_feat = RF.rel_key_features(k.shape[2], d, jnp.float32)
    q_aug = jnp.concatenate([qu, a_feat], axis=-1)
    k_aug = jnp.concatenate(
        [k, jnp.broadcast_to(c_feat[None, None],
                             (k.shape[0], k.shape[1]) + c_feat.shape)],
        axis=-1,
    )
    s_aug = jnp.einsum("bhnd,bhmd->bhnm", q_aug, k_aug) * scale
    p = jax.nn.softmax(s_aug, axis=-1)
    want = jnp.einsum("bhnm,bhmd->bhnd", p, v)

    got = pra.reference_relpos_attention(
        qu, k, v, delta, w_h, rowtab, keytab, None, scale
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_reference_matches_augmented_features_grouped():
    b, h, g, d, ng = 2, 2, 3, 24, 7
    dhg = g * d // h
    qu = rand(b, h, ng, dhg, seed=10)
    # grouped delta contract: delta[h, l] = dvu[(h*dhg + l) % D]
    dvu = rand(d, seed=11) * 0.5
    delta = jnp.tile(dvu, g).reshape(h, dhg)
    qv = qu + delta[None, :, None, :]
    k = rand(b, h, ng, dhg, seed=12)
    v = rand(b, h, ng, dhg, seed=13)
    w = rand(d, d, seed=14) * 0.3
    scale = 1.0 / math.sqrt(dhg)
    hdp = _lane_half(d)

    a_feat = RF.grouped_rel_query_features(qv, w, g, 0)
    c_feat = RF.rel_key_features(ng, d, jnp.float32, stride=g)
    q_aug = jnp.concatenate([qu, a_feat], axis=-1)
    k_aug = jnp.concatenate(
        [k, jnp.broadcast_to(c_feat[None, None], (b, h) + c_feat.shape)],
        axis=-1,
    )
    s_aug = jnp.einsum("bhnd,bhmd->bhnm", q_aug, k_aug) * scale
    want = jnp.einsum(
        "bhnm,bhmd->bhnd", jax.nn.softmax(s_aug, axis=-1), v
    )

    w_h = RF.rel_w_grouped(h, dhg, w, g, hdp, 0)
    rowtab = RF.rel_rowtab(ng, d, hdp, jnp.float32, stride=g)
    keytab = RF.rel_keytab_halves(ng, d, hdp, jnp.float32, stride=g)
    got = pra.reference_relpos_attention(
        qu, k, v, delta, w_h, rowtab, keytab, None, scale
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_rel_pq_helpers_match_w_helpers():
    """rel_pq_plain/grouped (XLA/test path) are exactly qv @ rel_w_*."""
    qu, delta, k, v, w, w_h, rowtab, keytab = _plain_inputs(seed=50)
    qv = qu + delta[None, :, None, :]
    hdp = _lane_half(w.shape[0])
    np.testing.assert_allclose(
        np.asarray(RF.rel_pq_plain(qv, w, hdp)),
        np.asarray(jnp.einsum("bhnd,hdk->bhnk", qv, w_h)),
        atol=1e-5,
    )


def test_fused_forward_matches_reference():
    qu, delta, k, v, w, w_h, rowtab, keytab = _plain_inputs(
        b=2, h=2, n=19, nk=19, d=24, seed=20
    )
    bias = jnp.zeros((2, 1, 1, 19), jnp.float32).at[:, :, :, 15:].set(-1e9)
    scale = 0.31
    got = pra.fused_relpos_attention(
        qu, k, v, delta, w_h, rowtab, keytab, bias, scale
    )
    want = pra.reference_relpos_attention(
        qu, k, v, delta, w_h, rowtab, keytab, bias, scale
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("n", [11, 16])
def test_fused_gradients_match_reference(n):
    """All five differentiable inputs, including the in-kernel dW (per-head
    folded weights, reduced over the batch grid axis) and ddelta. n=11
    exercises the padded-query-row path (np_ > n), n=16 the exact-fit one."""
    qu, delta, k, v, w, w_h, rowtab, keytab = _plain_inputs(
        b=3, h=2, n=n, nk=n, d=16, seed=30
    )
    bias = jnp.zeros((1, 1, 1, n), jnp.float32).at[:, :, :, n - 2:].set(-1e9)

    def loss(fn):
        return lambda *a: jnp.sum(
            jnp.sin(fn(a[0], a[1], a[2], a[3], a[4], rowtab, keytab,
                       bias, 0.4))
        )

    g1 = jax.grad(loss(pra.fused_relpos_attention), argnums=(0, 1, 2, 3, 4))(
        qu, k, v, delta, w_h
    )
    g2 = jax.grad(loss(pra.reference_relpos_attention),
                  argnums=(0, 1, 2, 3, 4))(qu, k, v, delta, w_h)
    for a_, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), atol=1e-5)


@pytest.mark.parametrize("g,n", [(1, 21), (3, 33)])
def test_module_fused_equals_skewing(monkeypatch, g, n):
    """MultiHeadSelfAttention end to end: the fused-kernel factorized path
    (interpret mode) equals the skewing path bit-for-bit semantics."""
    from efficientconformer_tpu.models.attentions import MultiHeadSelfAttention

    d, h = 16, 2
    x = rand(2, n, d, seed=40) * 0.5
    mask = jnp.zeros((2, 1, 1, n), jnp.float32).at[1, :, :, n - 5 :].set(1.0)

    mod = MultiHeadSelfAttention(
        dim_model=d, num_heads=h, group_size=g, relative_pos_enc=True,
        fused=False,
    )
    variables = mod.init(jax.random.PRNGKey(0), x, mask)

    monkeypatch.setenv("ECF_FUSED_RELPOS", "0")
    monkeypatch.setenv("ECF_REL_FACTORIZE", "0")   # force skewing oracle
    want, _ = mod.apply(variables, x, mask)
    monkeypatch.setenv("ECF_REL_FACTORIZE", "1")
    monkeypatch.setenv("ECF_FUSED_RELPOS", "1")
    got, _ = mod.apply(variables, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("g", [1, 3])
def test_module_fused_gradients_equal_skewing(monkeypatch, g):
    """Parameter gradients through the fused kernel (u, v biases and the
    pos-projection kernel now flow through the in-kernel delta/W inputs)
    equal the skewing path's."""
    from efficientconformer_tpu.models.attentions import MultiHeadSelfAttention

    d, h, n = 16, 2, 12 * g
    x = rand(2, n, d, seed=60) * 0.5
    mask = jnp.zeros((2, 1, 1, n), jnp.float32).at[1, :, :, n - 4:].set(1.0)
    mod = MultiHeadSelfAttention(
        dim_model=d, num_heads=h, group_size=g, relative_pos_enc=True,
        fused=False,
    )
    variables = mod.init(jax.random.PRNGKey(1), x, mask)

    def loss(params):
        out, _ = mod.apply({"params": params}, x, mask)
        return jnp.sum(jnp.cos(out))

    monkeypatch.setenv("ECF_FUSED_RELPOS", "0")
    monkeypatch.setenv("ECF_REL_FACTORIZE", "0")
    g_skew = jax.grad(loss)(variables["params"])
    monkeypatch.setenv("ECF_REL_FACTORIZE", "1")
    monkeypatch.setenv("ECF_FUSED_RELPOS", "1")
    g_fused = jax.grad(loss)(variables["params"])
    flat_s = jax.tree_util.tree_leaves_with_path(g_skew)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_fused))
    assert len(flat_s) == len(flat_f)
    for path, val in flat_s:
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(val), atol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.parametrize("bb", [1, 3])
def test_fused_bias_gradient_matches_reference(bb):
    """The bias cotangent is real (ADVICE r4): grad wrt the additive key
    bias equals the jnp reference for batched (bb=B) and broadcast (bb=1)
    bias shapes, including padded query rows (n=11 -> np_=16)."""
    qu, delta, k, v, w, w_h, rowtab, keytab = _plain_inputs(
        b=3, h=2, n=11, nk=11, d=16, seed=77
    )
    bias = rand(bb, 1, 1, 11, seed=80 + bb) * 0.3

    def loss(fn):
        return lambda bias_: jnp.sum(
            jnp.sin(fn(qu, k, v, delta, w_h, rowtab, keytab, bias_, 0.4))
        )

    g1 = jax.grad(loss(pra.fused_relpos_attention))(bias)
    g2 = jax.grad(loss(pra.reference_relpos_attention))(bias)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
