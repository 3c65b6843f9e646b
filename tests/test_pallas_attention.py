"""Fused Pallas attention: forward + custom_vjp gradients vs jnp reference
(interpret mode on CPU)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import efficientconformer_tpu.ops.pallas_attention as pa


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


def rand(*shape, seed=0):
    return jnp.array(np.random.default_rng(seed).standard_normal(shape), jnp.float32)


def test_forward_matches_reference():
    b, h, nq, nk, d = 2, 3, 37, 29, 30
    q, k, v = rand(b, h, nq, d, seed=1), rand(b, h, nk, d, seed=2), rand(b, h, nk, d, seed=3)
    bias = rand(b, 1, nq, nk, seed=4)
    bias = bias.at[..., 25:].set(-1e9)
    out = pa.fused_bias_attention(q, k, v, bias, 0.2)
    want = pa.reference_bias_attention(q, k, v, bias, 0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_gradients_match_reference():
    b, h, nq, nk, d = 2, 2, 13, 17, 10
    q, k, v = rand(b, h, nq, d, seed=5), rand(b, h, nk, d, seed=6), rand(b, h, nk, d, seed=7)
    bias = rand(b, 1, nq, nk, seed=8)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a, 0.3)))

    g1 = jax.grad(loss(pa.fused_bias_attention), argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(loss(pa.reference_bias_attention), argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
    # broadcast reduction of dbias
    assert g1[3].shape == bias.shape


def test_vmem_guard():
    assert pa.fits_vmem(512, 512, 96)
    assert not pa.fits_vmem(4096, 4096, 128)


@pytest.mark.parametrize(
    "nq,nk,dqk,dv",
    [(37, 29, 30, 30), (300, 600, 90, 70), (100, 700, 450, 90)],
)
def test_pallas_backward_keymask_matches_reference(monkeypatch, nq, nk, dqk,
                                                   dv):
    """The tiled Pallas backward (key-mask fast path) must reproduce the
    reference gradients; mixed q/k vs v widths cover the factorized rel-pos
    layout."""
    monkeypatch.setattr(pa, "PALLAS_BWD", True)
    b, h = 2, 2
    rng = np.random.default_rng(nq)
    q = jnp.array(rng.standard_normal((b, h, nq, dqk)), jnp.float32)
    k = jnp.array(rng.standard_normal((b, h, nk, dqk)), jnp.float32)
    v = jnp.array(rng.standard_normal((b, h, nk, dv)), jnp.float32)
    bias = jnp.where(
        jnp.arange(nk)[None, None, None, :] < nk - 11, 0.0, -1e9
    ).astype(jnp.float32) * jnp.ones((b, 1, 1, nk))

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a, 0.17)))

    g1 = jax.grad(loss(pa.fused_bias_attention), argnums=(0, 1, 2))(q, k, v,
                                                                    bias)
    g2 = jax.grad(loss(pa.reference_bias_attention), argnums=(0, 1, 2))(
        q, k, v, bias
    )
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)


def test_pallas_backward_used_only_for_keymask(monkeypatch):
    """A full (Nq, Nk) bias needs a real dbias and must keep the XLA path:
    its bias gradient stays correct even when the Pallas backward is on."""
    monkeypatch.setattr(pa, "PALLAS_BWD", True)
    b, h, nq, nk, d = 1, 2, 13, 17, 10
    q, k, v = rand(b, h, nq, d, seed=5), rand(b, h, nk, d, seed=6), rand(
        b, h, nk, d, seed=7
    )
    bias = rand(b, 1, nq, nk, seed=8)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a, 0.3)))

    g1 = jax.grad(loss(pa.fused_bias_attention), argnums=3)(q, k, v, bias)
    g2 = jax.grad(loss(pa.reference_bias_attention), argnums=3)(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
