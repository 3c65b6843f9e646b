"""Orbax-backend checkpointing: roundtrip, optimizer-less (SWA) saves,
format auto-detection on load, and atomic msgpack writes."""

import os

import numpy as np
import pytest
import jax

from efficientconformer_tpu.training.trainer import Trainer
from efficientconformer_tpu.training import checkpoint
from tests.test_convergence import make_cfg


@pytest.fixture(scope="module")
def tiny_state():
    trainer = Trainer(make_cfg("CTC"))
    micro = {
        "audio": np.zeros((2, 6000), np.float32),
        "labels": np.ones((2, 4), np.int32),
        "audio_len": np.full((2,), 6000, np.int32),
        "label_len": np.full((2,), 4, np.int32),
    }
    return trainer.init_state(micro)


def params_equal(a, b):
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_orbax_roundtrip(tiny_state, tmp_path):
    p = os.path.join(str(tmp_path), "checkpoints_3.ckpt")
    checkpoint.save(p, tiny_state.replace(step=tiny_state.step + 3), fmt="orbax")
    assert os.path.isdir(p)  # directory checkpoint
    loaded = checkpoint.load(p, tiny_state)  # auto-detects orbax
    assert int(loaded.step) == 3
    assert params_equal(tiny_state.params, loaded.params)
    assert jax.tree.structure(tiny_state.opt_state) == jax.tree.structure(
        loaded.opt_state
    )


def test_orbax_optimizerless_swa_save(tiny_state, tmp_path):
    p = os.path.join(str(tmp_path), "checkpoints_swa.ckpt")
    checkpoint.save(p, tiny_state, save_optimizer=False, fmt="orbax")
    loaded = checkpoint.load(p, tiny_state)
    assert params_equal(tiny_state.params, loaded.params)
    # optimizer state falls back to the template
    assert jax.tree.structure(tiny_state.opt_state) == jax.tree.structure(
        loaded.opt_state
    )


def test_orbax_encoder_only_restore(tiny_state, tmp_path):
    p = os.path.join(str(tmp_path), "checkpoints_enc.ckpt")
    checkpoint.save(p, tiny_state, fmt="orbax")
    zeroed = tiny_state.replace(
        params=jax.tree.map(lambda x: x * 0, tiny_state.params)
    )
    restored = checkpoint.load_encoder(p, zeroed)
    assert params_equal(tiny_state.params["encoder"], restored.params["encoder"])
    assert float(
        sum(np.abs(np.asarray(x)).sum()
            for x in jax.tree.leaves(restored.params["fc"]))
    ) == 0.0


def test_msgpack_write_is_atomic(tiny_state, tmp_path):
    p = os.path.join(str(tmp_path), "checkpoints_1.ckpt")
    checkpoint.save(p, tiny_state, fmt="msgpack")
    assert os.path.isfile(p)
    assert not os.path.exists(p + ".tmp")
    loaded = checkpoint.load(p, tiny_state)
    assert params_equal(tiny_state.params, loaded.params)


def test_orbax_roundtrip_with_decayed_weights_chain(tmp_path):
    """Optax chains with empty-state nodes (weight decay + Noam schedule, as
    in the shipped configs) restore correctly: orbax stores EmptyState as
    None, which must fall back to the template (regression)."""
    cfg = make_cfg("CTC")
    cfg.training_params.update(
        weight_decay=1e-6, lr_schedule="Transformer", schedule_dim=20,
        warmup_steps=10, K=2,
    )
    trainer = Trainer(cfg)
    micro = {
        "audio": np.zeros((2, 6000), np.float32),
        "labels": np.ones((2, 4), np.int32),
        "audio_len": np.full((2,), 6000, np.int32),
        "label_len": np.full((2,), 4, np.int32),
    }
    state = trainer.init_state(micro)
    p = os.path.join(str(tmp_path), "checkpoints_2.ckpt")
    checkpoint.save(p, state, fmt="orbax")
    loaded = checkpoint.load(p, state)
    assert jax.tree.structure(state.opt_state) == jax.tree.structure(
        loaded.opt_state
    )
    # switching formats over the same path must also work (orbax dir -> msgpack)
    checkpoint.save(p, state, fmt="msgpack")
    assert os.path.isfile(p)
    loaded2 = checkpoint.load(p, state)
    assert params_equal(state.params, loaded2.params)


def test_async_save_restores_identically(tiny_state, tmp_path):
    """Non-blocking orbax save (blocking=False / ECF_ASYNC_CKPT): the call
    returns while a background thread writes; wait_for_saves (called
    implicitly by load) joins it and the restored state is identical."""
    path = str(tmp_path / "ck_async.ckpt")
    checkpoint.save(path, tiny_state, blocking=False)
    restored = checkpoint.load(path, tiny_state)
    assert params_equal(tiny_state.params, restored.params)
    assert int(restored.step) == int(tiny_state.step)
