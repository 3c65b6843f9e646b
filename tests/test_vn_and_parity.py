"""Variational-noise semantics + transducer decoder/joint parameter parity."""




import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientconformer_tpu.models.layers import Dense, LSTM, Embedding


def test_vn_noise_applied_only_with_rng():
    d = Dense(8, vn_std=0.5)
    x = jnp.ones((2, 4))
    params = d.init(jax.random.PRNGKey(0), x)
    clean = d.apply(params, x)
    noisy1 = d.apply(params, x, rngs={"vn": jax.random.PRNGKey(1)})
    noisy1b = d.apply(params, x, rngs={"vn": jax.random.PRNGKey(1)})
    noisy2 = d.apply(params, x, rngs={"vn": jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(clean - noisy1)).max() > 1e-4
    np.testing.assert_array_equal(np.asarray(noisy1), np.asarray(noisy1b))
    assert np.abs(np.asarray(noisy1 - noisy2)).max() > 1e-6


def test_vn_zero_std_is_identity():
    d = Dense(8, vn_std=None)
    x = jnp.ones((2, 4))
    params = d.init(jax.random.PRNGKey(0), x)
    clean = d.apply(params, x)
    with_rng = d.apply(params, x, rngs={"vn": jax.random.PRNGKey(1)})
    np.testing.assert_array_equal(np.asarray(clean), np.asarray(with_rng))


def n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


def test_transducer_decoder_joint_param_parity():
    """Parameter counts of the RNN prediction network and joint network match
    the reference modules (importable subset: models/decoders.py,
    models/joint_networks.py) for the Transducer Medium shapes."""
    try:
        from torch_ref import import_reference

        ref = import_reference()
        RefRnnDecoder = ref.decoders.RnnDecoder
        RefJoint = ref.joint_networks.JointNetwork
    except ImportError:
        pytest.skip("reference not importable")

    dec_params = {"arch": "RNN", "num_layers": 1, "dim_model": 640,
                  "vocab_size": 1000}
    joint_params = {"joint_mode": "sum", "dim_model": 640, "act": "tanh"}

    ref_dec = RefRnnDecoder(dec_params)
    ref_joint = RefJoint(360, 640, 1000, joint_params)
    want_dec = sum(p.numel() for p in ref_dec.parameters())
    want_joint = sum(p.numel() for p in ref_joint.parameters())

    from efficientconformer_tpu.models.decoders import RnnDecoder
    from efficientconformer_tpu.models.joint_networks import JointNetwork

    dec = RnnDecoder(params=dec_params)
    v = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    assert n_params(v["params"]) == want_dec

    joint = JointNetwork(vocab_size=1000, params=joint_params)
    vj = joint.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 360)), jnp.zeros((1, 4, 640))
    )
    assert n_params(vj["params"]) == want_joint
