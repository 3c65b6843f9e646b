"""Causal / streaming encoder behaviour."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientconformer_tpu.models.encoders import ConformerEncoder
from tests.test_encoder import TINY


def causal_params():
    p = dict(TINY)
    p.update(causal=True, left_context=64)
    return p


def test_causal_encoder_runs_and_is_causal():
    """With causal=True (streaming config: causal convs + look-ahead mask),
    changing the audio tail must not affect earlier encoder outputs beyond the
    small look-ahead of the symmetric Conv2d subsampling (reference keeps that
    symmetric too)."""
    p = causal_params()
    enc = ConformerEncoder(params=p)
    t = 4800
    rng = np.random.default_rng(0)
    x1 = jnp.array(rng.standard_normal((1, t)), jnp.float32)
    x_len = jnp.array([t])
    vars_ = enc.init(jax.random.PRNGKey(0), x1, x_len)
    out1, out_len, _ = enc.apply(vars_, x1, x_len, False)

    # perturb the last 20% of the audio
    x2 = x1.at[:, int(0.8 * t):].add(1.0)
    out2, _, _ = enc.apply(vars_, x2, x_len, False)

    n = int(out_len[0])
    # encoder frames per audio sample: total stride 8 -> frame ~ sample/1280.
    # change starts at frame ~0.8*n; allow a 4-frame look-ahead margin for the
    # symmetric subsampling convolution.
    safe = int(0.8 * n) - 4
    np.testing.assert_allclose(
        np.asarray(out1)[0, :safe], np.asarray(out2)[0, :safe], atol=1e-5
    )
    # sanity: later frames did change
    assert np.abs(np.asarray(out1)[0, safe:] - np.asarray(out2)[0, safe:]).max() > 1e-3


def test_left_context_window_limits_attention():
    """A finite left_context must make outputs independent of far-past input."""
    p = dict(TINY)
    p.update(causal=True, left_context=2)
    enc = ConformerEncoder(params=p)
    # long enough that the stacked receptive field (5 blocks x (attention
    # window 2 + causal conv k=7), compounded by strides) cannot reach from
    # the perturbed head to the tail frames
    t = 64000
    rng = np.random.default_rng(1)
    x1 = jnp.array(rng.standard_normal((1, t)), jnp.float32)
    x_len = jnp.array([t])
    vars_ = enc.init(jax.random.PRNGKey(0), x1, x_len)
    out1, out_len, _ = enc.apply(vars_, x1, x_len, False)
    # perturb the first 5% of audio; the last frames must be unaffected
    x2 = x1.at[:, : int(0.05 * t)].add(1.0)
    out2, _, _ = enc.apply(vars_, x2, x_len, False)
    n = int(out_len[0])
    np.testing.assert_allclose(
        np.asarray(out1)[0, n - 5 :], np.asarray(out2)[0, n - 5 :], atol=1e-4
    )
