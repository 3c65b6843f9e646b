"""Trainer mechanics: grad accumulation equivalence, encoder freezing,
optimizer torch-Adam semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from efficientconformer_tpu.config import from_dict
from efficientconformer_tpu.training.trainer import Trainer
from efficientconformer_tpu.training import optimizers
from efficientconformer_tpu.runtime import example_microbatch
from tests.test_models import TINY_ENC


def make_trainer(**train_overrides):
    tp = {
        "optimizer": "Adam", "beta1": 0.9, "beta2": 0.98, "eps": 1e-9,
        "weight_decay": 1e-6, "lr_schedule": "Constant", "lr_value": 1e-3,
        "mixed_precision": False,
    }
    tp.update(train_overrides)
    cfg = from_dict(
        {
            "model_type": "CTC",
            "model_name": "tiny",
            "encoder_params": dict(TINY_ENC),
            "tokenizer_params": {"vocab_size": 9, "vocab_type": "bpe",
                                 "tokenizer_path": "/nonexistent"},
            "training_params": tp,
            "decoding_params": {},
        }
    )
    return Trainer(cfg)


def batch_of(b, accum, seed=0):
    rng = np.random.default_rng(seed)
    t, u = 8000, 4
    return {
        "audio": jnp.asarray(
            rng.standard_normal((accum, b, t)).astype(np.float32) * 0.1
        ),
        "labels": jnp.asarray(rng.integers(1, 9, (accum, b, u)).astype(np.int32)),
        "audio_len": jnp.full((accum, b), t, jnp.int32),
        "label_len": jnp.full((accum, b), u, jnp.int32),
    }


def make_lm_trainer():
    cfg = from_dict(
        {
            "model_type": "LM",
            "model_name": "tiny lm",
            "lm_params": {"arch": "RNN", "num_layers": 1, "dim_model": 12,
                          "vocab_size": 9},
            "tokenizer_params": {"vocab_size": 9, "vocab_type": "bpe",
                                 "tokenizer_path": "/nonexistent"},
            "training_params": {
                "optimizer": "Adam", "beta1": 0.9, "beta2": 0.98, "eps": 1e-9,
                "weight_decay": 1e-6, "lr_schedule": "Constant",
                "lr_value": 1e-3, "mixed_precision": False,
            },
            "decoding_params": {},
        }
    )
    return Trainer(cfg)


def lm_batch_of(b, accum, seed=0):
    rng = np.random.default_rng(seed)
    u = 6
    tokens = rng.integers(1, 9, (accum, b, u)).astype(np.int32)
    targets = np.concatenate(
        [tokens, np.zeros((accum, b, 1), np.int32)], axis=-1
    )
    return {
        "tokens": jnp.asarray(tokens),
        "token_len": jnp.full((accum, b), u, jnp.int32),
        "targets": jnp.asarray(targets),
    }


def test_grad_accumulation_equals_big_batch():
    """One step with 2 stacked microbatches == one step with both concatenated.
    Uses the (BatchNorm-free) LM model so the equality is exact; for BN models
    accumulation computes per-microbatch statistics, matching the reference."""
    trainer = make_lm_trainer()
    micro = {k: np.asarray(v[0]) for k, v in lm_batch_of(2, 1).items()}
    state = trainer.init_state(micro)
    step = trainer.train_step_fn()

    # the step donates its input state buffers; keep an independent copy
    state2 = jax.tree.map(jnp.copy, state)

    b_acc = lm_batch_of(2, 2, seed=1)
    s1, m1 = step(state, b_acc, jax.random.PRNGKey(0))

    big = {k: v.reshape((1, -1) + v.shape[2:]) for k, v in b_acc.items()}
    s2, m2 = step(state2, big, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_encoder_freezing():
    trainer = make_trainer(encoder_frozen_steps=100)
    micro = {k: np.asarray(v[0]) for k, v in batch_of(2, 1).items()}
    state = trainer.init_state(micro)
    orig = jax.tree.map(jnp.copy, state)
    frozen_step = trainer.train_step_fn(freeze_encoder=True)
    batch = batch_of(2, 1, seed=2)
    new_state, _ = frozen_step(state, batch, jax.random.PRNGKey(0))
    state = orig
    for a, b in zip(
        jax.tree.leaves(state.params["encoder"]),
        jax.tree.leaves(new_state.params["encoder"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # non-encoder params did move
    moved = any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(
            jax.tree.leaves(state.params["fc"]),
            jax.tree.leaves(new_state.params["fc"]),
        )
    )
    assert moved


def test_adam_matches_torch_semantics():
    """optax chain (add_decayed_weights -> scale_by_adam -> lr) reproduces
    torch.optim.Adam with weight_decay for a few steps on a toy quadratic."""
    tp = {
        "optimizer": "Adam", "beta1": 0.9, "beta2": 0.98, "eps": 1e-9,
        "weight_decay": 0.01, "lr_schedule": "Constant", "lr_value": 0.1,
    }
    tx = optimizers.from_training_params(tp)
    w = jnp.array([1.0, -2.0, 3.0])
    opt_state = tx.init(w)

    tw = torch.tensor([1.0, -2.0, 3.0], requires_grad=True)
    topt = torch.optim.Adam([tw], lr=0.1, betas=(0.9, 0.98), eps=1e-9,
                            weight_decay=0.01)

    import optax

    for _ in range(5):
        g = 2.0 * w  # d/dw of w^2
        updates, opt_state = tx.update(g, opt_state, w)
        w = optax.apply_updates(w, updates)

        topt.zero_grad()
        (tw ** 2).sum().backward()
        topt.step()

    np.testing.assert_allclose(np.asarray(w), tw.detach().numpy(), rtol=1e-5)


def test_mixed_precision_bf16_policy():
    """training_params.mixed_precision (reference AMP, model.py:179,239) puts
    the whole teacher-forced transducer forward — encoder, prediction net and
    the (B, T, U+1, V) joint lattice — in bf16; params stay fp32 masters, the
    loss is finite, and the decode step path stays fp32 (the reference does
    not autocast decoding)."""
    from efficientconformer_tpu.models import factory
    from efficientconformer_tpu.models.transducer import Transducer
    from tests.test_models import TINY_DEC, TINY_ENC, TINY_JOINT

    cfg = from_dict(
        {
            "model_type": "Transducer",
            "model_name": "tiny mp",
            "encoder_params": dict(TINY_ENC),
            "decoder_params": dict(TINY_DEC),
            "joint_params": dict(TINY_JOINT),
            "tokenizer_params": {"vocab_size": 9, "vocab_type": "bpe",
                                 "tokenizer_path": "/nonexistent"},
            "training_params": {
                "optimizer": "Adam", "beta1": 0.9, "beta2": 0.98,
                "eps": 1e-9, "weight_decay": 0.0, "lr_schedule": "Constant",
                "lr_value": 1e-3, "mixed_precision": True,
            },
            "decoding_params": {},
        }
    )
    model, loss_fn = factory.create_model(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 1600)), jnp.float32)
    x_len = jnp.array([1600, 1200])
    y = jnp.array([[1, 2, 3], [4, 5, 0]])
    y_len = jnp.array([3, 2])
    variables = model.init(jax.random.PRNGKey(1), x, y, x_len, y_len, False)
    assert all(
        l.dtype == jnp.float32
        for l in jax.tree.leaves(variables["params"])
    )

    logits, f_len = model.apply(variables, x, y, x_len, y_len, False)
    assert logits.dtype == jnp.bfloat16
    loss = loss_fn((logits, f_len),
                   {"labels": y, "label_len": y_len})
    assert np.isfinite(float(loss))

    # decode step path: fp32 prediction net + joint (reference parity)
    carry = model.apply(variables, 2, method=Transducer.decoder_init_carry)
    g, _ = model.apply(
        variables, jnp.zeros((2,), jnp.int32), carry,
        method=Transducer.decode_step,
    )
    assert g.dtype == jnp.float32
    step_logits = model.apply(
        variables, jnp.zeros((2, TINY_ENC["dim_model"]), jnp.float32), g,
        method=Transducer.joint_step,
    )
    assert step_logits.dtype == jnp.float32


def test_mixed_precision_train_step_traffic_is_bf16():
    """Under mixed_precision the train step's LARGE intermediates must be
    bf16: flax norms with default dtype=None promote bf16 activations
    against their f32 scale/bias to f32 outputs, silently re-upcasting the
    whole residual stream and backward pass (fixed in models/layers.py by
    casting norm outputs back to the input dtype; on v5e the fix was worth
    +28-40% train throughput). This walks the step jaxpr and bounds the
    fp32 share of big intermediate outputs."""
    from tests.test_convergence import make_cfg

    cfg = make_cfg("CTC")
    cfg.training_params["mixed_precision"] = True
    trainer = Trainer(cfg)
    rng = np.random.default_rng(0)
    b, t = 2, 64000
    micro = {
        "audio": rng.standard_normal((b, t)).astype(np.float32) * 0.1,
        "labels": rng.integers(1, 9, (b, 3)).astype(np.int32),
        "audio_len": np.full((b,), t, np.int32),
        "label_len": np.full((b,), 3, np.int32),
    }
    state = trainer.init_state(micro)
    batch = {k: jnp.asarray(v)[None] for k, v in micro.items()}

    import jax

    jaxpr = jax.make_jaxpr(trainer.train_step_fn().__wrapped__)(
        state, batch, jax.random.PRNGKey(0)
    )
    bytes_by_dtype = {}

    from jax._src import source_info_util

    def walk(jx):
        for eqn in jx.eqns:
            # the audio frontend is fp32 BY DESIGN (log-mel overflow guard);
            # exclude it so the ratio measures the encoder/backward stream
            src = source_info_util.summarize(eqn.source_info)
            if "ops/audio" in src or "specaugment" in src:
                continue
            for v in eqn.outvars:
                aval = getattr(v, "aval", None)
                if aval is not None and getattr(aval, "size", 0) > 5_000:
                    k = str(aval.dtype)
                    bytes_by_dtype[k] = bytes_by_dtype.get(k, 0) + (
                        aval.size * aval.dtype.itemsize
                    )
            for p in eqn.params.values():
                if hasattr(p, "jaxpr"):
                    walk(p.jaxpr)
                if isinstance(p, (list, tuple)):
                    for q in p:
                        if hasattr(q, "jaxpr"):
                            walk(q.jaxpr)

    walk(jaxpr.jaxpr)
    bf16 = bytes_by_dtype.get("bfloat16", 0)
    f32 = bytes_by_dtype.get("float32", 0)
    assert bf16 > 0, bytes_by_dtype
    # fp32 remains for: frontend (by design), softmax internals, loss,
    # parameter gradients. It must not dominate the activation traffic
    # (before the norm fix, f32 was ~4x bf16 here).
    assert f32 < 2.5 * bf16, f"fp32 re-upcast regression: {bytes_by_dtype}"
