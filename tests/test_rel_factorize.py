"""Factorized rel-pos scores must equal the skewing path exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientconformer_tpu.models.attentions import MultiHeadSelfAttention
from efficientconformer_tpu.ops import attention as A
from efficientconformer_tpu.ops import pos_enc as P
from efficientconformer_tpu.ops import rel_factorize as RF
from efficientconformer_tpu.ops.masks import padding_mask, streaming_mask


@pytest.mark.parametrize("t,th", [(12, 0), (9, 5)])
def test_scores_equal_skew_path(t, th):
    b, h, d = 2, 2, 16
    dh = d // h
    rng = np.random.default_rng(0)
    qv = jnp.asarray(rng.standard_normal((b, h, t, dh)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((d, d)).astype(np.float32))

    # skew path (bias dropped from the Dense — factorization omits it since
    # it's softmax-invariant; compare the kernel term only)
    enc = P.relative_encoding(t, d, hidden_len=th, causal=False)
    e = (enc @ w).reshape(-1, h, dh)
    rel = jnp.einsum("bhqd,lhd->bhql", qv, e)
    want = A.rel_to_abs_full(rel)

    a_feat = RF.rel_query_features(qv, w, hidden_len=th)
    c_feat = RF.rel_key_features(th + t, d)
    got = jnp.einsum("bhnd,md->bhnm", a_feat, c_feat)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_module_factorized_equals_full_mask_path():
    """The module's factorized branch (key-only mask) must produce the same
    output as the skewing branch (full (B,1,T,T) mask with equal semantics)."""
    b, t, d, hds = 2, 12, 16, 2
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((b, t, d)).astype(np.float32)
    )
    x_len = jnp.array([12, 9])
    mod = MultiHeadSelfAttention(dim_model=d, num_heads=hds, relative_pos_enc=True)
    params = mod.init(jax.random.PRNGKey(0), x)

    key_mask = padding_mask(t, x_len)              # (B,1,1,T) -> factorized
    full_mask = streaming_mask(t, x_len, t, t)     # (B,1,T,T) -> skew path
    out_fact, _ = mod.apply(params, x, key_mask)
    out_skew, _ = mod.apply(params, x, full_mask)
    np.testing.assert_allclose(
        np.asarray(out_fact), np.asarray(out_skew), atol=2e-4
    )


@pytest.mark.parametrize("t,g", [(12, 3), (15, 3), (12, 2)])
def test_module_grouped_factorized_equals_skew(t, g):
    """Grouped factorized branch (key-only mask) == grouped skew branch
    (full mask with equal semantics)."""
    b, d, hds = 2, 12, 2
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((b, t, d)).astype(np.float32)
    )
    x_len = jnp.array([t, t - 4])
    mod = MultiHeadSelfAttention(
        dim_model=d, num_heads=hds, relative_pos_enc=True, group_size=g
    )
    params = mod.init(jax.random.PRNGKey(0), x)
    key_mask = padding_mask(t, x_len)
    full_mask = streaming_mask(t, x_len, t, t)
    out_fact, _ = mod.apply(params, x, key_mask)
    out_skew, _ = mod.apply(params, x, full_mask)
    np.testing.assert_allclose(
        np.asarray(out_fact), np.asarray(out_skew), atol=2e-4
    )


def test_module_grouped_factorized_with_hidden():
    """Grouped factorized path with a group-aligned KV cache (streaming)."""
    b, t, d, hds, g = 1, 9, 12, 2, 3
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((b, t, d)).astype(np.float32)
    )
    mod = MultiHeadSelfAttention(
        dim_model=d, num_heads=hds, relative_pos_enc=True, group_size=g
    )
    params = mod.init(jax.random.PRNGKey(0), x)
    # feed first 6 frames, then next 3 with hidden; compare the second chunk's
    # output between the factorized (no mask) and skew (full mask) paths
    _, hid = mod.apply(params, x[:, :6], None)
    out_fact, _ = mod.apply(params, x[:, 6:], None, hid)

    # skew path forced via a full-context (tq x tk is not expressible with the
    # streaming helper here) — use the causal-free skew by passing a full mask
    # of zeros shaped (B, 1, Tq_grouped*g, Tk...) is not supported; instead
    # compare against the full-sequence pass restricted to the last chunk,
    # which equals chunked attention for group-aligned full-context windows.
    full, _ = mod.apply(params, x, None)
    np.testing.assert_allclose(
        np.asarray(out_fact), np.asarray(full)[:, 6:], atol=2e-4
    )


def test_module_factorized_no_mask():
    b, t, d, hds = 1, 10, 16, 2
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((b, t, d)).astype(np.float32)
    )
    mod = MultiHeadSelfAttention(dim_model=d, num_heads=hds, relative_pos_enc=True)
    params = mod.init(jax.random.PRNGKey(0), x)
    out_fact, _ = mod.apply(params, x, None)
    full_mask = streaming_mask(t, jnp.array([t]), t, t)
    out_skew, _ = mod.apply(params, x, full_mask)
    np.testing.assert_allclose(
        np.asarray(out_fact), np.asarray(out_skew), atol=2e-4
    )


def test_factorized_grad_has_no_scatter():
    """The factorized paths must stay scatter/gather-free: the earlier
    per-head/per-chunk .at[].add construction lowered to h*g scatter-adds
    per grouped block (plus gathers in the backward), which dominated the
    train step's non-matmul HBM traffic on TPU."""
    b, t, d, hds, g = 2, 12, 12, 2, 3
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((b, t, d)).astype(np.float32)
    )
    mask = padding_mask(t, jnp.array([t, t - 4]))

    def prims_of_grad(mod):
        params = mod.init(jax.random.PRNGKey(0), x)

        def loss(p):
            out, _ = mod.apply(p, x, mask)
            return jnp.sum(out * out)

        jaxpr = jax.make_jaxpr(jax.grad(loss))(params)
        names = set()

        def walk(jx):
            for eqn in jx.eqns:
                names.add(eqn.primitive.name)
                for v in eqn.params.values():
                    if hasattr(v, "jaxpr"):
                        walk(v.jaxpr)
                    if isinstance(v, (list, tuple)):
                        for q in v:
                            if hasattr(q, "jaxpr"):
                                walk(q.jaxpr)
        walk(jaxpr.jaxpr)
        return names

    for mod in (
        MultiHeadSelfAttention(dim_model=d, num_heads=hds,
                               relative_pos_enc=True, group_size=g),
        MultiHeadSelfAttention(dim_model=d, num_heads=hds,
                               relative_pos_enc=True),
    ):
        prims = prims_of_grad(mod)
        bad = {p for p in prims if p.startswith("scatter")}
        assert not bad, f"scatter primitives in factorized attention: {bad}"
