"""Learning smoke tests: the full train step must actually reduce the loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientconformer_tpu.config import from_dict
from efficientconformer_tpu.training.trainer import Trainer
from tests.test_models import TINY_ENC


def make_cfg(model_type="CTC", lr=3e-3):
    cfg = {
        "model_type": model_type,
        "model_name": "tiny",
        "encoder_params": dict(TINY_ENC),
        "tokenizer_params": {"vocab_size": 9, "vocab_type": "bpe",
                             "tokenizer_path": "/nonexistent"},
        "training_params": {
            "optimizer": "Adam", "beta1": 0.9, "beta2": 0.98, "eps": 1e-9,
            "weight_decay": 0.0, "lr_schedule": "Constant", "lr_value": lr,
            "mixed_precision": False,
        },
        "decoding_params": {},
    }
    if model_type == "Transducer":
        cfg["decoder_params"] = {"arch": "RNN", "num_layers": 1,
                                 "dim_model": 12, "vocab_size": 9}
        cfg["joint_params"] = {"joint_mode": "sum", "dim_model": 12,
                               "act": "tanh"}
    return from_dict(cfg)


def overfit(model_type, steps=40):
    trainer = Trainer(make_cfg(model_type))
    rng = np.random.default_rng(0)
    b, t, u = 2, 8000, 3
    micro = {
        "audio": rng.standard_normal((b, t)).astype(np.float32) * 0.1,
        "labels": rng.integers(1, 9, (b, u)).astype(np.int32),
        "audio_len": np.full((b,), t, np.int32),
        "label_len": np.full((b,), u, np.int32),
    }
    state = trainer.init_state(micro)
    step = trainer.train_step_fn()
    batch = {k: jnp.asarray(v[None]) for k, v in micro.items()}
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(steps):
        state, m = step(state, batch, key)
        losses.append(float(m["loss"]))
    return losses


@pytest.mark.slow
def test_ctc_overfits_single_batch():
    losses = overfit("CTC")
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


@pytest.mark.slow
def test_transducer_overfits_single_batch():
    losses = overfit("Transducer")
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
