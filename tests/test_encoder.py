"""ConformerEncoder integration: shapes, length propagation, padding invariance."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientconformer_tpu.models.encoders import ConformerEncoder
from efficientconformer_tpu.config import resolve_block_configs

TINY = {
    "arch": "Conformer",
    "num_blocks": 5,
    "dim_model": [16, 24, 32],
    "ff_ratio": 2,
    "num_heads": 2,
    "kernel_size": 7,
    "Pdrop": 0.0,
    "conv_stride": 2,
    "att_stride": 1,
    "strided_blocks": [1, 3],
    "expand_blocks": [1, 3],
    "att_group_size": [3, 1, 1],
    "relative_pos_enc": True,
    "max_pos_encoding": 512,
    "subsampling_module": "Conv2d",
    "subsampling_layers": 1,
    "subsampling_filters": [16],
    "subsampling_kernel_size": 3,
    "subsampling_norm": "batch",
    "subsampling_act": "swish",
    "sample_rate": 16000,
    "win_length_ms": 25,
    "hop_length_ms": 10,
    "n_fft": 512,
    "n_mels": 80,
    "normalize": False,
    "mean": 0.0,
    "std": 1.0,
    "spec_augment": True,
    "mF": 1,
    "F": 10,
    "mT": 2,
    "pS": 0.05,
}


def lengths_after(audio_len, p=TINY):
    l = audio_len // 160 + 1
    for _ in range(p["subsampling_layers"]):
        l = (l - 1) // 2 + 1
    for b in resolve_block_configs(p):
        if b.stride > 1:
            l = (l - 1) // b.stride + 1
    return l


def test_block_config_resolution():
    blocks = resolve_block_configs(TINY)
    assert [b.dim_model for b in blocks] == [16, 16, 24, 24, 32]
    assert [b.dim_expand for b in blocks] == [16, 24, 24, 32, 32]
    assert [b.stride for b in blocks] == [1, 2, 1, 2, 1]
    assert [b.att_group_size for b in blocks] == [3, 3, 1, 1, 1]


def test_forward_shapes_and_lengths():
    enc = ConformerEncoder(params=TINY)
    t_audio = 4800
    x = jnp.array(np.random.default_rng(0).standard_normal((2, t_audio)), jnp.float32)
    x_len = jnp.array([t_audio, 3000])
    vars_ = enc.init(jax.random.PRNGKey(0), x, x_len)
    out, out_len, interctc = enc.apply(vars_, x, x_len, False)
    assert out.shape[0] == 2 and out.shape[2] == 32
    assert int(out_len[0]) == lengths_after(t_audio)
    assert int(out_len[1]) == lengths_after(3000)
    assert interctc == []


def test_interctc_taps():
    enc = ConformerEncoder(params=TINY, vocab_size=11, interctc_blocks=(2,))
    x = jnp.array(np.random.default_rng(2).standard_normal((1, 1600)), jnp.float32)
    x_len = jnp.array([1600])
    vars_ = enc.init(jax.random.PRNGKey(0), x, x_len)
    out, out_len, interctc = enc.apply(vars_, x, x_len, False)
    assert len(interctc) == 1
    assert interctc[0].shape[-1] == 11
    np.testing.assert_allclose(np.asarray(interctc[0]).sum(-1), 1.0, atol=1e-5)


def test_train_mode_runs_with_rngs():
    enc = ConformerEncoder(params=TINY)
    x = jnp.array(np.random.default_rng(3).standard_normal((2, 1600)), jnp.float32)
    x_len = jnp.array([1600, 1200])
    vars_ = enc.init(jax.random.PRNGKey(0), x, x_len)
    out, out_len, _ = enc.apply(
        vars_,
        x,
        x_len,
        True,
        rngs={"dropout": jax.random.PRNGKey(1), "augment": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )[0]
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("remat", ["dots", True])
def test_remat_gradients_match_no_remat(remat):
    """encoder_params['remat'] in {'dots', True} is a pure recompute schedule:
    forward values and parameter gradients must match the no-remat encoder
    exactly (same primals, same cotangents)."""
    import jax.flatten_util

    x = jnp.array(np.random.default_rng(5).standard_normal((2, 3200)), jnp.float32)
    x_len = jnp.array([3200, 2400])

    def loss_for(params_dict):
        enc = ConformerEncoder(params=params_dict)
        vars_ = enc.init(jax.random.PRNGKey(0), x, x_len)

        def loss_fn(v):
            out, _, _ = enc.apply(v, x, x_len, False)
            return jnp.sum(out**2) * 1e-3

        val, grad = jax.value_and_grad(loss_fn)(vars_)
        return float(val), np.asarray(jax.flatten_util.ravel_pytree(grad)[0])

    base_val, base_grad = loss_for(dict(TINY))
    r_val, r_grad = loss_for({**TINY, "remat": remat})
    assert abs(base_val - r_val) < 1e-6 * max(1.0, abs(base_val))
    np.testing.assert_allclose(r_grad, base_grad, rtol=1e-5, atol=1e-6)
