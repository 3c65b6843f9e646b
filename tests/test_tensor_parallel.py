"""Tensor parallelism (Megatron-style param sharding over a (data, model)
mesh, parallel/mesh.py param_spec/shard_params): the sharded train step must
execute on a 4x2 mesh and produce the same numbers as pure data parallel."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from efficientconformer_tpu.parallel import mesh as mesh_lib
from efficientconformer_tpu.training.trainer import Trainer
from tests.test_convergence import make_cfg


def micro_batch():
    rng = np.random.default_rng(0)
    b = 8
    return {
        "audio": rng.standard_normal((b, 6000)).astype(np.float32) * 0.1,
        "labels": rng.integers(1, 9, (b, 3)).astype(np.int32),
        "audio_len": np.full((b,), 6000, np.int32),
        "label_len": np.full((b,), 3, np.int32),
    }


def run_steps(mesh, n_steps=2):
    cfg = make_cfg("CTC")
    trainer = Trainer(cfg, mesh=mesh)
    micro = micro_batch()
    state = trainer.init_state(micro)
    if "model" in mesh.axis_names:
        state = state.replace(
            params=mesh_lib.shard_params(mesh, state.params)
        )
    batch = mesh_lib.shard_batch(mesh, {k: v[None] for k, v in micro.items()},
                                 batch_axis=1)
    step = trainer.train_step_fn()
    losses = []
    for _ in range(n_steps):
        state, m = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(m["loss"]))
    return losses, state


def test_tp_step_matches_dp():
    devs = jax.devices()
    assert len(devs) == 8
    dp_mesh = mesh_lib.make_mesh(devs)
    tp_mesh = mesh_lib.make_mesh(devs, model_parallel=2)
    assert tp_mesh.shape == {"data": 4, "model": 2}

    losses_dp, _ = run_steps(dp_mesh)
    losses_tp, state_tp = run_steps(tp_mesh)
    np.testing.assert_allclose(losses_tp, losses_dp, rtol=2e-4)

    # the FFN kernels actually live sharded over the model axis
    from jax.sharding import PartitionSpec as P

    k = state_tp.params["encoder"]["block_0"]["ffn1"]["fc1"]["kernel"]
    assert k.sharding.spec == P(None, "model")
    k2 = state_tp.params["encoder"]["block_0"]["ffn1"]["fc2"]["kernel"]
    # trailing None is normalised away by jax
    assert tuple(k2.sharding.spec)[:1] == ("model",)


def test_param_spec_rules():
    from jax.sharding import PartitionSpec as P

    mesh = mesh_lib.make_mesh(jax.devices(), model_parallel=2)
    kern = np.zeros((16, 32))
    assert mesh_lib.param_spec(("ffn1", "fc1", "kernel"), kern, mesh) == \
        P(None, "model")
    assert mesh_lib.param_spec(("ffn1", "fc2", "kernel"), kern, mesh) == \
        P("model", None)
    assert mesh_lib.param_spec(("mhsa", "query", "kernel"), kern, mesh) == \
        P(None, "model")
    # non-divisible shapes fall back to replication
    odd = np.zeros((16, 31))
    assert mesh_lib.param_spec(("ffn1", "fc1", "kernel"), odd, mesh) == P()
    # convs replicate
    assert mesh_lib.param_spec(("conv_module", "dw", "kernel"),
                               np.zeros((7, 1, 16)), mesh) == P()
    # 1-D data mesh replicates everything
    dp = mesh_lib.make_mesh(jax.devices())
    assert mesh_lib.param_spec(("ffn1", "fc1", "kernel"), kern, dp) == P()
