"""Task models: parameter-count parity with the reference, greedy decodes."""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientconformer_tpu.config import load_config
from efficientconformer_tpu.models.model_ctc import ModelCTC, ctc_greedy_collapse
from efficientconformer_tpu.models.transducer import Transducer, greedy_decode
from efficientconformer_tpu.models.lm import LanguageModel, ce_loss


def n_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


def test_ctc_small_param_count_matches_reference():
    """Parameter-shape parity with the reference EfficientConformerCTCSmall:
    13,281,856 params total (13,220,160 encoder + 61,696 fc head), measured on
    the reference implementation (models/encoders.py) with the shipped config.
    """
    cfg = load_config("configs/EfficientConformerCTCSmall.json")
    model = ModelCTC(encoder_params=cfg.encoder_params, vocab_size=cfg.vocab_size)
    x = jnp.zeros((1, 1600), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, jnp.array([1600]))
    assert n_params(variables["params"]) == 13_281_856


def test_ctc_greedy_collapse():
    preds = jnp.array(
        [
            [0, 3, 3, 0, 3, 5, 5, 0, 0, 2],
            [1, 1, 1, 2, 0, 0, 0, 0, 0, 0],
        ]
    )
    pred_len = jnp.array([10, 4])
    toks, n = ctc_greedy_collapse(preds, pred_len)
    assert n.tolist() == [4, 2]
    assert toks[0, :4].tolist() == [3, 3, 5, 2]
    assert toks[1, :2].tolist() == [1, 2]


TINY_ENC = {
    "arch": "Conformer", "num_blocks": 2, "dim_model": 16, "ff_ratio": 2,
    "num_heads": 2, "kernel_size": 7, "Pdrop": 0.0, "relative_pos_enc": True,
    "max_pos_encoding": 256, "subsampling_module": "Conv2d",
    "subsampling_layers": 1, "subsampling_filters": [8],
    "subsampling_kernel_size": 3, "subsampling_norm": "batch",
    "subsampling_act": "swish", "sample_rate": 16000, "win_length_ms": 25,
    "hop_length_ms": 10, "n_fft": 512, "n_mels": 80, "normalize": False,
    "mean": 0.0, "std": 1.0, "spec_augment": False, "mF": 0, "F": 0, "mT": 0,
    "pS": 0.0,
}
TINY_DEC = {"arch": "RNN", "num_layers": 1, "dim_model": 12, "vocab_size": 9}
TINY_JOINT = {"joint_mode": "sum", "dim_model": 12, "act": "tanh"}


def build_tiny_transducer(joint_params=None):
    model = Transducer(
        encoder_params=TINY_ENC, decoder_params=TINY_DEC,
        joint_params=joint_params or TINY_JOINT, vocab_size=9,
    )
    x = jnp.array(np.random.default_rng(0).standard_normal((2, 1600)), jnp.float32)
    x_len = jnp.array([1600, 1200])
    y = jnp.array([[1, 2, 3], [4, 5, 0]])
    y_len = jnp.array([3, 2])
    variables = model.init(jax.random.PRNGKey(1), x, y, x_len, y_len, False)
    return model, variables, x, x_len, y, y_len


def test_transducer_forward_shapes():
    model, variables, x, x_len, y, y_len = build_tiny_transducer()
    logits, f_len = model.apply(variables, x, y, x_len, y_len, False)
    assert logits.shape[0] == 2
    assert logits.shape[2] == y.shape[1] + 1
    assert logits.shape[3] == 9
    assert int(f_len[0]) == (1600 // 160 + 1 - 1) // 2 + 1


def reference_style_greedy(model, variables, x, x_len, max_consec=5):
    """Per-sample host loop exactly mirroring reference transducer.py:139-186,
    used as the oracle for the batched device decode."""
    f, f_len, _ = model.apply(variables, x, x_len, False, method=Transducer.encode)
    results = []
    for b in range(x.shape[0]):
        tokens = []
        carry = model.apply(variables, 1, method=Transducer.decoder_init_carry)
        g, carry = model.apply(
            variables, jnp.zeros((1,), jnp.int32), carry,
            method=Transducer.decode_step,
        )
        t, consec = 0, 0
        while t < int(f_len[b]):
            logits = model.apply(
                variables, f[b : b + 1, t], g, method=Transducer.joint_step
            )
            pred = int(jnp.argmax(logits, axis=-1)[0])
            if pred == 0 or consec == max_consec:
                consec = 0
                t += 1
            else:
                consec += 1
                tokens.append(pred)
                g, carry = model.apply(
                    variables, jnp.array([pred], jnp.int32), carry,
                    method=Transducer.decode_step,
                )
        results.append(tokens)
    return results


def test_transducer_batched_greedy_matches_reference_loop():
    model, variables, x, x_len, y, y_len = build_tiny_transducer()
    # max_tokens must exceed the worst case (max_consec per frame) so the
    # buffer cap never alters semantics vs the unbounded reference loop
    toks, n = greedy_decode(model, variables, x, x_len, max_tokens=128,
                            max_consec_dec_steps=5)
    want = reference_style_greedy(model, variables, x, x_len, max_consec=5)
    for b in range(2):
        got = toks[b, : int(n[b])].tolist()
        assert got == want[b], (b, got, want[b])


@pytest.mark.parametrize("joint_params", [
    {"joint_mode": "sum", "dim_model": 12, "act": "tanh"},
    {"joint_mode": "concat", "dim_model": 12, "act": "tanh"},
    {"joint_mode": "concat", "dim_model": None, "act": "tanh"},  # identity proj
])
def test_transducer_label_looping_matches_frame_sync(joint_params):
    """The label-looping greedy loop (one iteration per emission, blanks
    skipped via batched joint rows) is an exact reimplementation of the
    frame-synchronous state machine — tokens and counts identical, full
    utterance and chunk-streamed. Parametrized over joint modes so the
    ``row`` concat/identity-projection paths are covered too."""
    from efficientconformer_tpu.models.transducer import greedy_decode_stream

    model, variables, x, x_len, y, y_len = build_tiny_transducer(joint_params)
    tf_, nf = greedy_decode(model, variables, x, x_len, max_tokens=128,
                            max_consec_dec_steps=5, algo="frame")
    tl_, nl = greedy_decode(model, variables, x, x_len, max_tokens=128,
                            max_consec_dec_steps=5, algo="label")
    assert (nf == nl).all() and (tf_ == tl_).all()

    # chunk-streamed label-looping == full-utterance frame-sync
    f, f_len, _ = model.apply(variables, x, x_len, False,
                              method=Transducer.encode)
    half = jnp.minimum(f_len, f.shape[1] // 2).astype(jnp.int32)
    st = greedy_decode_stream(model, variables, f, half, state=None,
                              max_tokens=128, algo="label")
    st = greedy_decode_stream(model, variables, f, f_len, state=st,
                              f_start=half, max_tokens=128, algo="label")
    assert (st["n_tok"] == nf).all() and (st["tokens"] == tf_).all()

    # tight token budget: both algos must clip identically
    tf2, nf2 = greedy_decode(model, variables, x, x_len, max_tokens=3,
                             max_consec_dec_steps=2, algo="frame")
    tl2, nl2 = greedy_decode(model, variables, x, x_len, max_tokens=3,
                             max_consec_dec_steps=2, algo="label")
    assert (nf2 == nl2).all() and (tf2 == tl2).all()

    # degenerate static cap 0: the frame-sync machine can never emit
    # (consec < 0 is unsatisfiable); the label loop must match, not emit at
    # its forced-advance frame t+1
    tf0, nf0 = greedy_decode(model, variables, x, x_len, max_tokens=128,
                             max_consec_dec_steps=0, algo="frame")
    tl0, nl0 = greedy_decode(model, variables, x, x_len, max_tokens=128,
                             max_consec_dec_steps=0, algo="label")
    assert (nf0 == 0).all() and (nl0 == 0).all() and (tf0 == tl0).all()


def test_lm_forward_and_ce():
    lm = LanguageModel(
        lm_params={"arch": "RNN", "num_layers": 1, "dim_model": 8, "vocab_size": 7},
        vocab_size=7,
    )
    x = jnp.array([[1, 2, 3], [4, 5, 0]])
    x_len = jnp.array([3, 2])
    variables = lm.init(jax.random.PRNGKey(0), x, x_len, False)
    logits = lm.apply(variables, x, x_len, False)
    assert logits.shape == (2, 4, 7)
    # CE with ignore -1 vs torch
    import torch

    targets = jnp.array([[1, 2, 3, 0], [4, 5, 0, -1]])
    ours = float(ce_loss(logits, targets))
    tl = torch.nn.functional.cross_entropy(
        torch.tensor(np.asarray(logits)).transpose(1, 2),
        torch.tensor(np.asarray(targets), dtype=torch.long),
        ignore_index=-1,
    )
    np.testing.assert_allclose(ours, float(tl), rtol=1e-5)
