"""Key-tiled flash attention kernel vs reference (interpret mode)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import efficientconformer_tpu.ops.pallas_attention as pa


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


@pytest.mark.parametrize(
    "nq,nk,dqk,dv,keymask",
    [(300, 600, 90, 90, True), (100, 700, 450, 90, True), (300, 520, 64, 64, False)],
)
def test_flash_matches_reference(nq, nk, dqk, dv, keymask):
    rng = np.random.default_rng(nq + nk)
    b, h = 2, 2
    q = jnp.array(rng.standard_normal((b, h, nq, dqk)), jnp.float32)
    k = jnp.array(rng.standard_normal((b, h, nk, dqk)), jnp.float32)
    v = jnp.array(rng.standard_normal((b, h, nk, dv)), jnp.float32)
    if keymask:
        bias = jnp.where(
            jnp.arange(nk)[None, None, None, :] < nk - 37, 0.0, -1e9
        ).astype(jnp.float32) * jnp.ones((b, 1, 1, nk))
    else:
        bias = jnp.array(rng.standard_normal((b, 1, nq, nk)), jnp.float32)
    out, lse = pa._flash_forward(q, k, v, bias, 0.11)
    want = pa.reference_bias_attention(q, k, v, bias, 0.11)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)
    # saved log-sum-exp matches the reference softmax normaliser
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * 0.11
    s = s + bias.astype(jnp.float32)
    want_lse = jax.scipy.special.logsumexp(s, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse),
                               atol=2e-5, rtol=1e-5)


def test_dispatch_large_uses_jnp_path():
    # shapes beyond the VMEM budget must still produce correct results
    rng = np.random.default_rng(0)
    b, h, n, d = 1, 2, 40, 16
    q = jnp.array(rng.standard_normal((b, h, n, d)), jnp.float32)
    k, v = q + 0.1, q - 0.1
    bias = jnp.zeros((b, 1, 1, n), jnp.float32)
    assert not pa.fits_vmem(4096, 4096, 128)
    out = pa._dispatch_forward(q, k, v, bias, 0.2)
    want = pa.reference_bias_attention(q, k, v, bias, 0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)
