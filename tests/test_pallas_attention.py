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
