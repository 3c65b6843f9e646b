"""Decode-STRING parity vs the reference implementation (VERDICT r2 Missing #2).

The strongest WER-parity statement obtainable without LibriSpeech data:
identical weights + identical tokenizer ==> byte-identical decoded strings
from our batched device decoders and the reference's own Python decode loops
(CTC collapse: reference models/model_ctc.py:90-136; RNN-T greedy:
reference models/transducer.py:139-186), on the full audio->string path.

The reference task models are built from the SHIPPED configs (full-size CTC
Small / Transducer Medium, per the round-2 verdict), with their tokenizer
loaded through reference models/model.py:50 via the sentencepiece shim from a
.model file we write — i.e. the exact published-checkpoint reproduction path
of scripts/import_torch_checkpoint.py, minus the Google Drive download.
"""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_ref import import_reference_full  # noqa: E402

from efficientconformer_tpu.data.tokenizer import train_bpe  # noqa: E402
from efficientconformer_tpu.utils import torch_compat as TC  # noqa: E402

CORPUS = [
    "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG",
    "SHE SELLS SEA SHELLS BY THE SEA SHORE",
    "A VERY MERRY CHRISTMAS AND A HAPPY NEW YEAR",
    "FOURSCORE AND SEVEN YEARS AGO OUR FATHERS BROUGHT FORTH",
    "WE HOLD THESE TRUTHS TO BE SELF EVIDENT",
    "IT WAS THE BEST OF TIMES IT WAS THE WORST OF TIMES",
    "CALL ME ISHMAEL SOME YEARS AGO NEVER MIND HOW LONG",
    "IN THE BEGINNING WAS THE WORD",
]


@pytest.fixture(scope="module")
def tokenizer_model(tmp_path_factory):
    """A trained BPE tokenizer written as a sentencepiece .model protobuf."""
    tok = train_bpe(iter(CORPUS), vocab_size=256)
    path = str(tmp_path_factory.mktemp("tok") / "bpe.model")
    tok.save(path)
    return path, tok


def rand_audio(rng, b, t):
    x = (rng.standard_normal((b, t)) * 0.1).astype(np.float32)
    x_len = np.linspace(t // 2, t, b).astype(np.int32)
    x_len[-1] = t
    for i in range(b):
        x[i, x_len[i]:] = 0.0
    return x, x_len


def load_config(name):
    with open(f"configs/{name}.json") as f:
        return json.load(f)


def test_ctc_greedy_decode_strings_match_reference(tokenizer_model):
    tok_path, tok = tokenizer_model
    ref = import_reference_full()
    cfg = load_config("EfficientConformerCTCSmall")
    cfg["tokenizer_params"]["tokenizer_path"] = tok_path
    cfg["tokenizer_params"]["vocab_size"] = tok.vocab_size()
    cfg["encoder_params"]["vocab_size"] = tok.vocab_size()

    torch.manual_seed(0)
    ref_model = ref.model_ctc.ModelCTC(
        encoder_params=cfg["encoder_params"],
        tokenizer_params=cfg["tokenizer_params"],
        training_params=cfg["training_params"],
        decoding_params=cfg["decoding_params"],
        name=cfg["model_name"],
    ).eval()
    assert ref_model.tokenizer is not None, "shim failed to load tokenizer"
    assert ref_model.tokenizer.vocab_size() == tok.vocab_size()

    params, stats = TC.convert_ctc(ref_model.state_dict())
    from efficientconformer_tpu.models.model_ctc import ModelCTC, greedy_decode

    model = ModelCTC(encoder_params=cfg["encoder_params"],
                     vocab_size=tok.vocab_size())
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }

    rng = np.random.default_rng(7)
    x, x_len = rand_audio(rng, 3, 4 * 16000)
    with torch.no_grad():
        want = ref_model.gready_search_decoding(
            torch.from_numpy(x), torch.from_numpy(x_len.astype(np.int64)))

    tokens, counts = greedy_decode(model, variables, jnp.asarray(x),
                                   jnp.asarray(x_len))
    tokens, counts = np.asarray(tokens), np.asarray(counts)
    got = tok.decode([tokens[i, :counts[i]].tolist()
                      for i in range(len(counts))])
    assert got == want, (got, want)
    # sanity: random weights over real audio lengths produce some tokens
    assert any(len(s) for s in got)


def test_transducer_greedy_decode_strings_match_reference(tokenizer_model):
    tok_path, tok = tokenizer_model
    ref = import_reference_full()
    cfg = load_config("EfficientConformerTransducerMedium")
    cfg["tokenizer_params"]["tokenizer_path"] = tok_path
    cfg["tokenizer_params"]["vocab_size"] = tok.vocab_size()
    cfg["decoder_params"]["vocab_size"] = tok.vocab_size()

    torch.manual_seed(1)
    ref_model = ref.transducer.Transducer(
        encoder_params=cfg["encoder_params"],
        decoder_params=cfg["decoder_params"],
        joint_params=cfg["joint_params"],
        tokenizer_params=cfg["tokenizer_params"],
        training_params=cfg["training_params"],
        decoding_params=cfg["decoding_params"],
        name=cfg["model_name"],
    ).eval()
    assert ref_model.tokenizer is not None

    params, stats = TC.convert_transducer(ref_model.state_dict())
    from efficientconformer_tpu.models.transducer import (
        Transducer,
        greedy_decode,
    )

    model = Transducer(
        encoder_params=cfg["encoder_params"],
        decoder_params=cfg["decoder_params"],
        joint_params=cfg["joint_params"],
        vocab_size=tok.vocab_size(),
    )
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, stats),
    }

    rng = np.random.default_rng(11)
    x, x_len = rand_audio(rng, 2, 3 * 16000)
    with torch.no_grad():
        want = ref_model.gready_search_decoding(
            torch.from_numpy(x), torch.from_numpy(x_len.astype(np.int64)))

    # frame budget: T_enc frames, each can emit <= max_consec tokens — with
    # random weights greedy often emits the per-frame cap, so size for the
    # worst case (3 s -> ~38 enc frames x 5 + slack)
    max_tokens = 256
    tokens, counts = greedy_decode(
        model, variables, jnp.asarray(x), jnp.asarray(x_len),
        max_tokens=max_tokens,
        max_consec_dec_steps=ref_model.max_consec_dec_step,
    )
    tokens, counts = np.asarray(tokens), np.asarray(counts)
    got = tok.decode([tokens[i, :counts[i]].tolist()
                      for i in range(len(counts))])
    assert got == want, (got, want)
