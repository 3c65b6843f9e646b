"""InterCTC model: taps, weighted loss, gradient flow."""

import numpy as np
import jax
import jax.numpy as jnp

from efficientconformer_tpu.config import from_dict
from efficientconformer_tpu.models import factory
from tests.test_models import TINY_ENC


def make_config():
    enc = dict(TINY_ENC)
    enc["interctc_blocks"] = [0]
    return from_dict(
        {
            "model_type": "InterCTC",
            "model_name": "tiny interctc",
            "encoder_params": enc,
            "tokenizer_params": {"vocab_size": 9, "vocab_type": "bpe",
                                 "tokenizer_path": "/nonexistent"},
            "training_params": {
                "interctc_lambda": 0.3,
                "optimizer": "Adam", "beta1": 0.9, "beta2": 0.98, "eps": 1e-9,
                "weight_decay": 0.0, "lr_schedule": "Constant", "lr_value": 1e-3,
                "mixed_precision": False,
            },
            "decoding_params": {},
        }
    )


def test_interctc_loss_and_grad():
    cfg = make_config()
    model, loss_fn = factory.create_model(cfg)
    batch = {
        "audio": jnp.array(
            np.random.default_rng(0).standard_normal((2, 8000)), jnp.float32
        ),
        "labels": jnp.array([[1, 2, 3], [4, 5, 0]]),
        "audio_len": jnp.array([8000, 6000]),
        "label_len": jnp.array([3, 2]),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["audio"], batch["audio_len"], False
    )

    def loss(params):
        outputs, _ = factory.apply_model(
            model, {"params": params, "batch_stats": variables["batch_stats"]},
            batch, False,
        )
        return loss_fn(outputs, batch)

    l, g = jax.value_and_grad(loss)(variables["params"])
    assert np.isfinite(float(l))
    import optax

    assert float(optax.global_norm(g)) > 0
    # the interctc projection layers must receive gradient
    enc_g = g["encoder"]
    assert any("interctc" in k for k in enc_g)
