"""Fixed-capacity KV-cache decoder stepping.

The static-shape cache (models/decoders.py init_carry_fixed + the
attentions.py fixed-cache step path) must produce step-by-step outputs
identical to the growing-cache path, including per-row positions that differ
across the batch, and it must plug into the on-device beam search for
Transformer-LM fusion."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from efficientconformer_tpu.models.lm import LanguageModel


def build_lm(relpos: bool):
    lm = LanguageModel(
        lm_params={
            "arch": "Transformer", "num_blocks": 2, "dim_model": 16,
            "ff_ratio": 2, "num_heads": 2, "vocab_size": 9,
            "relative_pos_enc": relpos, "max_pos_encoding": 64, "Pdrop": 0.0,
        },
        vocab_size=9,
    )
    variables = lm.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 4), jnp.int32), None, False
    )
    return lm, variables


@pytest.mark.parametrize("relpos", [True])
def test_fixed_cache_matches_growing_cache(relpos):
    """Step-by-step fixed cache == the growing-cache step path (rel-pos only:
    the growing path does not cache K/V for absolute encodings, mirroring the
    reference's MultiHeadAttention which takes no hidden state)."""
    lm, variables = build_lm(relpos)
    rng = np.random.default_rng(0)
    b, steps = 3, 6
    tokens = rng.integers(1, 9, (b, steps)).astype(np.int32)

    grow = None
    fixed = lm.apply(variables, b, steps + 2,
                     method=LanguageModel.init_carry_fixed)
    for t in range(steps):
        tok = jnp.asarray(tokens[:, t])
        lg, grow = lm.apply(variables, tok, grow, method=LanguageModel.step)
        lf, fixed = lm.apply(variables, tok, fixed, method=LanguageModel.step)
        np.testing.assert_allclose(
            np.asarray(lg), np.asarray(lf), rtol=2e-5, atol=2e-5,
        ), t


@pytest.mark.parametrize("relpos", [True, False])
def test_fixed_cache_matches_teacher_forced_forward(relpos):
    """Stepping [blank, x_0, ..] through the fixed cache reproduces the
    teacher-forced full forward column by column (both encodings)."""
    lm, variables = build_lm(relpos)
    rng = np.random.default_rng(2)
    b, u = 2, 5
    x = rng.integers(1, 9, (b, u)).astype(np.int32)
    want = np.asarray(
        lm.apply(variables, jnp.asarray(x), None, False)
    )  # (B, U+1, V); column t = P(. | blank, x_0..x_{t-1})

    fixed = lm.apply(variables, b, u + 2,
                     method=LanguageModel.init_carry_fixed)
    feed = np.concatenate([np.zeros((b, 1), np.int32), x], axis=1)
    for t in range(u + 1):
        lg, fixed = lm.apply(
            variables, jnp.asarray(feed[:, t]), fixed,
            method=LanguageModel.step,
        )
        np.testing.assert_allclose(
            np.asarray(lg), want[:, t], rtol=3e-5, atol=3e-5,
        )


def test_fixed_cache_per_row_positions():
    """Rows advanced different numbers of steps must each match their own
    growing-cache trajectory (this is what beam-search gathers create)."""
    lm, variables = build_lm(True)
    rng = np.random.default_rng(1)
    seqs = [[3, 5], [7, 1, 4, 2], [6]]
    b = len(seqs)
    maxlen = 8

    # per-row oracle: run each row alone with the growing cache
    want = []
    for s in seqs:
        carry = None
        for tok in s:
            lg, carry = lm.apply(
                variables, jnp.asarray([tok], jnp.int32), carry,
                method=LanguageModel.step,
            )
        want.append(np.asarray(lg[0]))

    # fixed-cache: build each row's state by stepping its own tokens, with
    # other rows fed dummies, then read the final step's logits per row
    fixed = lm.apply(variables, b, maxlen,
                     method=LanguageModel.init_carry_fixed)
    outs = [None] * b
    for t in range(max(len(s) for s in seqs)):
        toks = np.zeros((b,), np.int32)
        live = np.zeros((b,), bool)
        for i, s in enumerate(seqs):
            if t < len(s):
                toks[i] = s[t]
                live[i] = True
        lg, new_fixed = lm.apply(
            variables, jnp.asarray(toks), fixed, method=LanguageModel.step
        )
        # keep the previous carry for finished rows (like the beam's gathers)
        fixed = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.asarray(live).reshape((b,) + (1,) * (new.ndim - 1)),
                new, old,
            ),
            new_fixed, fixed,
        )
        for i in range(b):
            if live[i]:
                outs[i] = np.asarray(lg[i])
    for i in range(b):
        np.testing.assert_allclose(outs[i], want[i], rtol=2e-5, atol=2e-5)


def test_device_beam_with_transformer_lm_fusion():
    """On-device beam with a Transformer LM (static KV cache) must equal the
    per-sample host beam with the growing cache."""
    from efficientconformer_tpu.decoding.rnnt_beam import beam_search
    from efficientconformer_tpu.decoding.rnnt_beam_device import (
        beam_search_device,
    )
    from tests.test_beam_device import trained_transducer  # noqa: F401

    # build a trained transducer inline (same recipe as the fixture, smaller)
    from tests.test_convergence import make_cfg
    from efficientconformer_tpu.training.trainer import Trainer

    trainer = Trainer(make_cfg("Transducer", lr=3e-3))
    rng = np.random.default_rng(0)
    micro = {
        "audio": rng.standard_normal((2, 8000)).astype(np.float32) * 0.1,
        "labels": np.array([[3, 5, 2], [7, 1, 4]], np.int32),
        "audio_len": np.full((2,), 8000, np.int32),
        "label_len": np.full((2,), 3, np.int32),
    }
    state = trainer.init_state(micro)
    step = trainer.train_step_fn()
    batch = {k: jnp.asarray(v[None]) for k, v in micro.items()}
    key = jax.random.PRNGKey(0)
    for _ in range(450):
        state, m = step(state, batch, key)
    assert float(m["loss"]) < 0.2
    model = trainer.model
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    x, x_len = jnp.asarray(micro["audio"]), jnp.asarray(micro["audio_len"])

    lm, lm_vars = build_lm(True)
    kw = dict(lm_model=lm, lm_variables=lm_vars, lm_weight=0.4, lm_tmp=1.0)
    want = beam_search(model, variables, x, x_len, beam_size=3, **kw)
    got = beam_search_device(model, variables, x, x_len, beam_size=3,
                             max_tokens=32, **kw)
    assert got == want
