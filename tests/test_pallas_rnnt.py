"""Pallas RNN-T wavefront kernels vs the jnp scan specification
(interpret mode on CPU)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import efficientconformer_tpu.ops.pallas_rnnt as pr
from efficientconformer_tpu.ops.rnnt_loss import rnnt_loss_from_gathered


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def test_loss_and_grads_match_scan_spec():
    rng = np.random.default_rng(0)
    b, t, u1 = 3, 7, 5
    blank = jnp.asarray(rng.standard_normal((b, t, u1)).astype(np.float32)) - 1
    emit = jnp.asarray(rng.standard_normal((b, t, u1)).astype(np.float32)) - 1
    f_len = jnp.array([7, 5, 6])
    y_len = jnp.array([4, 2, 3])

    l1 = pr.rnnt_loss_from_gathered_pallas(blank, emit, f_len, y_len)
    l2 = rnnt_loss_from_gathered(blank, emit, f_len, y_len)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)

    w = jnp.array([1.0, 2.0, 0.5])  # non-trivial cotangents

    def lsum(fn):
        return lambda bb, ee: (fn(bb, ee, f_len, y_len) * w).sum()

    g1 = jax.grad(lsum(pr.rnnt_loss_from_gathered_pallas), argnums=(0, 1))(blank, emit)
    g2 = jax.grad(lsum(rnnt_loss_from_gathered), argnums=(0, 1))(blank, emit)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-5)


def test_skew_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 5, 4)).astype(np.float32))
    n_diag = 5 + 4 - 1
    xs = pr._skew_t(x, n_diag)
    back = pr._unskew_t(xs, 5)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-6)
