"""Numerical forward/loss parity vs the reference PyTorch implementation.

Weight-copy equivalence: reference modules are instantiated from the shipped
configs (torch, CPU, eval mode), their state dict is converted with
``utils.torch_compat``, and forward outputs are compared element-wise.
This is the honest WER-parity proxy available without LibriSpeech data
(reference forward paths: models/encoders.py:97, models/model_ctc.py:57,
models/transducer.py:84-106).

The torchaudio frontend is reproduced faithfully in tests/torch_ref.py
(pure torch.stft + HTK mel), so parity is asserted on the FULL path:
raw audio in, logits out.
"""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_ref import import_reference  # noqa: E402

from efficientconformer_tpu.utils import torch_compat as TC  # noqa: E402


def load_encoder_params(name):
    with open(f"configs/{name}.json") as f:
        cfg = json.load(f)
    return cfg


def rand_audio(rng, b, t, ragged=True):
    x = (rng.standard_normal((b, t)) * 0.1).astype(np.float32)
    if ragged and b > 1:
        x_len = np.linspace(t // 2, t, b).astype(np.int32)
        x_len[-1] = t
    else:
        x_len = np.full((b,), t, np.int32)
    for i in range(b):
        x[i, x_len[i]:] = 0.0
    return x, x_len


def torch_encoder_forward(ref, enc_params, sd_target, x, x_len):
    """Build reference ConformerEncoder, return (encoder, outputs)."""
    enc = ref.encoders.ConformerEncoder(enc_params).eval()
    with torch.no_grad():
        f, f_len, _ = enc(torch.from_numpy(x), torch.from_numpy(x_len.astype(np.int64)))
    return enc, f, f_len


def max_abs(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))))


# --------------------------------------------------------------------------
# Frontend
# --------------------------------------------------------------------------

def test_frontend_parity():
    ref = import_reference()
    import models.modules as ref_modules

    pre = ref_modules.AudioPreprocessing(16000, 512, 25, 10, 80, False, 0.0, 1.0).eval()
    rng = np.random.default_rng(0)
    x, x_len = rand_audio(rng, 2, 16385)
    with torch.no_grad():
        want, want_len = pre(torch.from_numpy(x), torch.from_numpy(x_len.astype(np.int64)))
    from efficientconformer_tpu.ops.audio import log_mel_spectrogram

    got, got_len = log_mel_spectrogram(jnp.asarray(x), jnp.asarray(x_len))
    np.testing.assert_array_equal(np.asarray(got_len), want_len.numpy())
    # ours is (B, T, M); reference is (B, M, T)
    diff = max_abs(np.asarray(got).transpose(0, 2, 1), want.numpy())
    assert diff < 1e-3, diff


# --------------------------------------------------------------------------
# CTC models (full path: audio -> logits)
# --------------------------------------------------------------------------

@pytest.mark.parametrize(
    "config_name,shapes",
    [
        (
            "EfficientConformerCTCSmall",
            [(2, 16000), (1, 48000), (2, 7777)],
        ),
        (
            "ConformerCTCSmall",
            [(2, 16000), (1, 24000), (2, 9999)],
        ),
    ],
)
def test_ctc_forward_parity(config_name, shapes):
    ref = import_reference()
    cfg = load_encoder_params(config_name)
    enc_params = cfg["encoder_params"]
    vocab = cfg["tokenizer_params"]["vocab_size"]
    enc_params["vocab_size"] = vocab  # reference indexes it for InterCTC only

    torch.manual_seed(0)
    ref_enc = ref.encoders.ConformerEncoder(enc_params).eval()
    dim_out = enc_params["dim_model"][-1] if isinstance(
        enc_params["dim_model"], list) else enc_params["dim_model"]
    ref_fc = torch.nn.Linear(dim_out, vocab).eval()

    sd = {f"encoder.{k}": v for k, v in ref_enc.state_dict().items()}
    sd.update({f"fc.{k}": v for k, v in ref_fc.state_dict().items()})
    params, stats = TC.convert_ctc(sd)

    from efficientconformer_tpu.models.model_ctc import ModelCTC

    model = ModelCTC(encoder_params=enc_params, vocab_size=vocab)
    x0 = np.zeros((1, 16000), np.float32)
    template = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "augment": jax.random.PRNGKey(2)},
        jnp.asarray(x0), jnp.full((1,), 16000, jnp.int32), False,
    )
    TC.assert_trees_match(
        jax.tree.map(lambda p: p, template["params"]), params)
    TC.assert_trees_match(template.get("batch_stats", {}), stats)
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }

    rng = np.random.default_rng(1)
    for b, t in shapes:
        x, x_len = rand_audio(rng, b, t)
        with torch.no_grad():
            f, f_len, _ = ref_enc(
                torch.from_numpy(x), torch.from_numpy(x_len.astype(np.int64))
            )
            want = ref_fc(f).numpy()
        got, got_len, _ = model.apply(
            variables, jnp.asarray(x), jnp.asarray(x_len), False
        )
        got = np.asarray(got, np.float32)
        np.testing.assert_array_equal(np.asarray(got_len), f_len.numpy())
        # compare only valid frames (padding frames see different garbage)
        for i in range(b):
            n = int(f_len[i])
            diff = max_abs(got[i, :n], want[i, :n])
            assert diff < 1e-4, (config_name, (b, t), i, diff)


def test_interctc_forward_parity():
    ref = import_reference()
    cfg = load_encoder_params("EfficientConformerCTCSmall")
    enc_params = dict(cfg["encoder_params"])
    vocab = cfg["tokenizer_params"]["vocab_size"]
    enc_params["vocab_size"] = vocab
    enc_params["interctc_blocks"] = [2, 7]

    torch.manual_seed(0)
    ref_enc = ref.encoders.ConformerEncoderInterCTC(enc_params).eval()
    dim_out = enc_params["dim_model"][-1]
    ref_fc = torch.nn.Linear(dim_out, vocab).eval()
    sd = {f"encoder.{k}": v for k, v in ref_enc.state_dict().items()}
    sd.update({f"fc.{k}": v for k, v in ref_fc.state_dict().items()})
    params, stats = TC.convert_ctc(sd)

    from efficientconformer_tpu.models.model_ctc import ModelCTC

    model = ModelCTC(encoder_params=enc_params, vocab_size=vocab,
                     interctc_blocks=(2, 7))
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }
    rng = np.random.default_rng(3)
    x, x_len = rand_audio(rng, 2, 16000)
    with torch.no_grad():
        f, f_len, _, inter = ref_enc(
            torch.from_numpy(x), torch.from_numpy(x_len.astype(np.int64))
        )
        want = ref_fc(f).numpy()
    got, got_len, got_inter = model.apply(
        variables, jnp.asarray(x), jnp.asarray(x_len), False
    )
    np.testing.assert_array_equal(np.asarray(got_len), f_len.numpy())
    assert len(got_inter) == len(inter) == 2
    for gi, wi in zip(got_inter, inter):
        assert max_abs(np.asarray(gi), wi.numpy()) < 1e-4
    for i in range(2):
        n = int(f_len[i])
        assert max_abs(np.asarray(got)[i, :n], want[i, :n]) < 1e-4


# --------------------------------------------------------------------------
# Transducer (joint lattice)
# --------------------------------------------------------------------------

def test_transducer_forward_parity():
    ref = import_reference()
    cfg = load_encoder_params("EfficientConformerTransducerMedium")
    enc_params = cfg["encoder_params"]
    dec_params = cfg["decoder_params"]
    joint_params = cfg["joint_params"]
    vocab = dec_params["vocab_size"]

    torch.manual_seed(0)
    ref_enc = ref.encoders.ConformerEncoder(enc_params).eval()
    ref_dec = ref.decoders.RnnDecoder(dec_params).eval()
    dim_enc = enc_params["dim_model"][-1] if isinstance(
        enc_params["dim_model"], list) else enc_params["dim_model"]
    ref_joint = ref.joint_networks.JointNetwork(
        dim_enc, dec_params["dim_model"], vocab, joint_params
    ).eval()

    sd = {f"encoder.{k}": v for k, v in ref_enc.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in ref_dec.state_dict().items()})
    sd.update({f"joint_network.{k}": v for k, v in ref_joint.state_dict().items()})
    params, stats = TC.convert_transducer(sd)

    from efficientconformer_tpu.models.transducer import Transducer

    model = Transducer(
        encoder_params=enc_params,
        decoder_params=dec_params,
        joint_params=joint_params,
        vocab_size=vocab,
    )
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }

    rng = np.random.default_rng(2)
    for b, t, u in [(2, 16000, 6), (1, 32000, 10), (2, 8887, 4)]:
        x, x_len = rand_audio(rng, b, t)
        y = rng.integers(1, vocab, (b, u)).astype(np.int32)
        y_len = np.full((b,), u, np.int32)
        if b > 1:
            y_len[0] = max(1, u - 2)
            y[0, y_len[0]:] = 0
        with torch.no_grad():
            f, f_len, _ = ref_enc(
                torch.from_numpy(x), torch.from_numpy(x_len.astype(np.int64))
            )
            y_in = torch.nn.functional.pad(
                torch.from_numpy(y.astype(np.int64)), (1, 0)
            )  # blank-start (reference transducer.py:96-98)
            g, _ = ref_dec(y_in, None, torch.from_numpy((y_len + 1).astype(np.int64)))
            want = ref_joint(f, g).numpy()

        got, got_len = model.apply(
            variables, jnp.asarray(x), jnp.asarray(y),
            jnp.asarray(x_len), jnp.asarray(y_len), False,
        )
        got = np.asarray(got, np.float32)
        np.testing.assert_array_equal(np.asarray(got_len), f_len.numpy())
        for i in range(b):
            n = int(f_len[i])
            uu = int(y_len[i]) + 1
            diff = max_abs(got[i, :n, :uu], want[i, :n, :uu])
            assert diff < 1e-4, ((b, t, u), i, diff)


# --------------------------------------------------------------------------
# LM (RNN)
# --------------------------------------------------------------------------

def test_rnn_lm_forward_parity():
    ref = import_reference()
    lm_params = {"arch": "RNN", "num_layers": 2, "dim_model": 96,
                 "vocab_size": 128}
    torch.manual_seed(0)
    ref_dec = ref.decoders.RnnDecoder(lm_params).eval()
    ref_fc = torch.nn.Linear(96, 128).eval()
    sd = {f"decoder.{k}": v for k, v in ref_dec.state_dict().items()}
    sd.update({f"fc.{k}": v for k, v in ref_fc.state_dict().items()})
    params, _ = TC.convert_lm(sd)

    from efficientconformer_tpu.models.lm import LanguageModel

    model = LanguageModel(lm_params=lm_params, vocab_size=128)
    variables = {"params": jax.tree.map(jnp.asarray, params)}

    rng = np.random.default_rng(4)
    x = rng.integers(1, 128, (3, 12)).astype(np.int32)
    x_len = np.array([12, 9, 5], np.int32)
    for i in range(3):
        x[i, x_len[i]:] = 0
    with torch.no_grad():
        # reference lm.py:65-81: pad blank then decode
        xin = torch.nn.functional.pad(torch.from_numpy(x.astype(np.int64)), (1, 0))
        g, _ = ref_dec(xin, None, torch.from_numpy((x_len + 1).astype(np.int64)))
        want = ref_fc(g).numpy()
    got = np.asarray(
        model.apply(variables, jnp.asarray(x), jnp.asarray(x_len), False),
        np.float32,
    )
    for i in range(3):
        n = int(x_len[i]) + 1
        assert max_abs(got[i, :n], want[i, :n]) < 1e-4


# --------------------------------------------------------------------------
# CTC loss vs torch.nn.CTCLoss
# --------------------------------------------------------------------------

def test_ctc_loss_torch_parity():
    from efficientconformer_tpu.ops.ctc_loss import ctc_loss

    rng = np.random.default_rng(5)
    b, t, u, v = 4, 23, 7, 19
    logits = rng.standard_normal((b, t, v)).astype(np.float32)
    labels = rng.integers(1, v, (b, u)).astype(np.int32)
    f_len = np.array([23, 20, 17, 15], np.int32)
    y_len = np.array([7, 5, 3, 1], np.int32)
    for i in range(b):
        labels[i, y_len[i]:] = 0

    # reference LossCTC (models/losses.py:48-71): reduction="none", then mean
    lt = torch.from_numpy(logits).log_softmax(-1)
    want_nll = torch.nn.CTCLoss(blank=0, reduction="none")(
        lt.transpose(0, 1),
        torch.from_numpy(labels.astype(np.int64)),
        torch.from_numpy(f_len.astype(np.int64)),
        torch.from_numpy(y_len.astype(np.int64)),
    ).numpy()

    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    got = np.asarray(
        ctc_loss(lp, jnp.asarray(labels), jnp.asarray(f_len), jnp.asarray(y_len))
    )
    np.testing.assert_allclose(got, want_nll, rtol=1e-5, atol=1e-5)
