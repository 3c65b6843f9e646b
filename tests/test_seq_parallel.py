"""Sequence parallelism: encoder activations sharded along TIME over the
"seq" axis of a (data, seq) mesh (parallel/mesh.seq_constraint, wired through
factory.create_model(seq_mesh=...) by the Trainer). GSPMD derives the halo
exchanges (convs/subsampling) and attention gathers from the constraints, so
the sharded step must be numerically identical to pure data parallel.

The reference has no analogue (its DDP scales batch only); this is TPU-native
scaling for long-audio training where one chip cannot hold a full utterance's
activations.
"""

import numpy as np
import jax
import jax.numpy as jnp

from efficientconformer_tpu.parallel import mesh as mesh_lib
from efficientconformer_tpu.training.trainer import Trainer
from tests.test_convergence import make_cfg


# 20160 samples -> 127 mel frames -> 64 after the /2 Conv2d subsampling
# (TINY_ENC, no strided blocks): the post-subsampling and per-block
# seq_constraint points all divide by 4, so the constraint applies
# everywhere (see mesh.seq_constraint divisibility).
def micro_batch(b=4, t=20160):
    rng = np.random.default_rng(0)
    return {
        "audio": rng.standard_normal((b, t)).astype(np.float32) * 0.1,
        "labels": rng.integers(1, 9, (b, 3)).astype(np.int32),
        "audio_len": np.full((b,), t, np.int32),
        "label_len": np.full((b,), 3, np.int32),
    }


def run_steps(mesh, n_steps=2):
    cfg = make_cfg("CTC")
    trainer = Trainer(cfg, mesh=mesh)
    micro = micro_batch()
    state = trainer.init_state(micro)
    batch = mesh_lib.shard_batch(mesh, {k: v[None] for k, v in micro.items()},
                                 batch_axis=1)
    step = trainer.train_step_fn()
    losses = []
    for _ in range(n_steps):
        state, m = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(m["loss"]))
    return losses, state


def test_sp_step_matches_dp():
    devs = jax.devices()
    assert len(devs) == 8
    dp_mesh = mesh_lib.make_mesh(devs)
    sp_mesh = mesh_lib.make_mesh(devs, seq_parallel=4)
    assert sp_mesh.shape == {"data": 2, "seq": 4}

    losses_dp, _ = run_steps(dp_mesh)
    losses_sp, _ = run_steps(sp_mesh)
    np.testing.assert_allclose(losses_sp, losses_dp, rtol=2e-4)


def test_sp_with_tp_step_matches_dp():
    """3-D (data, seq, model) mesh: sequence + tensor parallel together."""
    devs = jax.devices()
    mesh = mesh_lib.make_mesh(devs, model_parallel=2, seq_parallel=2)
    assert mesh.shape == {"data": 2, "seq": 2, "model": 2}

    cfg = make_cfg("CTC")
    trainer = Trainer(cfg, mesh=mesh)
    micro = micro_batch()
    state = trainer.init_state(micro)
    state = state.replace(params=mesh_lib.shard_params(mesh, state.params))
    batch = mesh_lib.shard_batch(mesh, {k: v[None] for k, v in micro.items()},
                                 batch_axis=1)
    step = trainer.train_step_fn()
    state, m = step(state, batch, jax.random.PRNGKey(0))
    loss_3d = float(m["loss"])

    losses_dp, _ = run_steps(mesh_lib.make_mesh(devs), n_steps=1)
    np.testing.assert_allclose(loss_3d, losses_dp[0], rtol=2e-4)


def test_sp_encoder_forward_actually_sharded():
    """Forward under the seq mesh: result equals the unsharded forward and
    the jitted program's output sharding carries the "seq" axis on time."""
    from efficientconformer_tpu.models import factory

    devs = jax.devices()
    mesh = mesh_lib.make_mesh(devs, seq_parallel=4)
    cfg = make_cfg("CTC")
    model_sp, _ = factory.create_model(cfg, seq_mesh=mesh)
    model_dp, _ = factory.create_model(cfg)
    micro = micro_batch()
    audio = jnp.asarray(micro["audio"])
    alen = jnp.asarray(micro["audio_len"])
    variables = model_dp.init(jax.random.PRNGKey(0), audio, alen, False)

    logits_dp, len_dp, _ = model_dp.apply(variables, audio, alen, False)

    @jax.jit
    def fwd(variables, audio, alen):
        return model_sp.apply(variables, audio, alen, False)

    sharded_audio = jax.device_put(audio, mesh_lib.batch_sharding(mesh))
    logits_sp, len_sp, _ = fwd(variables, sharded_audio, alen)
    np.testing.assert_allclose(np.asarray(len_sp), np.asarray(len_dp))
    np.testing.assert_allclose(
        np.asarray(logits_sp), np.asarray(logits_dp), atol=2e-4
    )


def test_seq_constraint_noop_without_seq_axis():
    x = jnp.ones((2, 6, 4))
    assert mesh_lib.seq_constraint(x, None) is x
    dp = mesh_lib.make_mesh(jax.devices())
    y = mesh_lib.seq_constraint(x, dp)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_seq_frame_schedule_matches_reality():
    from tests.test_models import TINY_ENC

    sched = mesh_lib.seq_frame_schedule(TINY_ENC, 20160)
    # 127 mel frames -> 64 post-subsampling -> 64, 64 (two unstridden blocks)
    assert sched == [127, 64, 64, 64]


def test_sp_audio_lengths_planner():
    from tests.test_models import TINY_ENC

    lens = mesh_lib.sp_audio_lengths(TINY_ENC, 4, 16000, 32000)
    assert 20160 in lens
    for t in lens:
        sched = mesh_lib.seq_frame_schedule(TINY_ENC, t)
        assert all(f % 4 == 0 for f in sched[1:]), (t, sched)
    # the planner finds lengths for the real Small config too (4 subsampled
    # stages through strided blocks 4 and 9)
    import json
    enc = json.load(open("configs/EfficientConformerCTCSmall.json")
                    )["encoder_params"]
    lens = mesh_lib.sp_audio_lengths(enc, 2, 150000, 170000)
    assert lens, "no SP-compatible bucket length in a 20k-sample window"
    sched = mesh_lib.seq_frame_schedule(enc, lens[0])
    assert all(f % 2 == 0 for f in sched[1:])


def test_sp_transducer_step_matches_dp():
    """Sequence parallelism through the Transducer: time-sharded encoder
    feeding the prediction-net/joint lattice and RNN-T loss."""
    devs = jax.devices()
    sp_mesh = mesh_lib.make_mesh(devs, seq_parallel=4)
    dp_mesh = mesh_lib.make_mesh(devs)

    def run(mesh):
        cfg = make_cfg("Transducer")
        trainer = Trainer(cfg, mesh=mesh)
        micro = micro_batch()
        state = trainer.init_state(micro)
        batch = mesh_lib.shard_batch(
            mesh, {k: v[None] for k, v in micro.items()}, batch_axis=1)
        step = trainer.train_step_fn()
        state, m = step(state, batch, jax.random.PRNGKey(0))
        return float(m["loss"])

    np.testing.assert_allclose(run(sp_mesh), run(dp_mesh), rtol=2e-4)
