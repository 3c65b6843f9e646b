"""SWA and evaluate()-number parity vs the reference (VERDICT r3 Missing #3
and Next #4).

(a) The repo's SWA averaging (training/checkpoint.py swa_average /
swa_exp_average) must produce the same parameters as the reference's
``torch.optim.swa_utils.AveragedModel`` driven over the same checkpoint
sequence (reference models/model.py:492-531; exp-decay avg_fn at :498-501),
for both the equal and exp variants.

(b) The full evaluate() WER NUMBER (not just the decoded strings) must match
the reference pipeline: reference truths/preds (its own greedy decode on
shared weights) scored with the jiwer-2.x-standardize-faithful corpus WER
(reference model.py:483) == the number the repo's evaluate() reports on the
same utterances.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from torch_ref import import_reference_full  # noqa: E402

from efficientconformer_tpu.utils import torch_compat as TC  # noqa: E402
from efficientconformer_tpu.training.checkpoint import (  # noqa: E402
    swa_average,
    swa_exp_average,
)


@dataclasses.dataclass
class _State:
    params: dict

    def replace(self, **kw):
        return _State(kw.get("params", self.params))


def _make_lm_and_checkpoints(n=4):
    """A small reference LanguageModel + n random parameter checkpoints."""
    ref = import_reference_full()
    lm_params = {"arch": "RNN", "num_layers": 2, "dim_model": 16,
                 "vocab_size": 11}
    training_params = {"optimizer": "Adam", "beta1": 0.9, "beta2": 0.98,
                       "eps": 1e-9, "weight_decay": 0.0, "lr_schedule":
                       "Constant", "lr_value": 1e-3}
    torch.manual_seed(0)
    model = ref.lm.LanguageModel(
        lm_params=lm_params, tokenizer_params={"vocab_size": 11,
                                               "tokenizer_path": "/missing"},
        training_params=training_params, decoding_params={}, name="LM",
    )
    ckpts = []
    for k in range(n):
        torch.manual_seed(100 + k)
        with torch.no_grad():
            for p in model.parameters():
                p.copy_(torch.randn_like(p) * 0.1)
        ckpts.append({k: v.clone() for k, v in model.state_dict().items()})
    return model, ckpts


def _repo_states(ckpts):
    return [_State(jax.tree.map(jnp.asarray, TC.convert_lm(sd)[0]))
            for sd in ckpts]


def _assert_tree_close(got, want, tol=1e-6):
    flat_g = jax.tree.leaves(got)
    flat_w = jax.tree.leaves(want)
    assert len(flat_g) == len(flat_w)
    for g, w in zip(flat_g, flat_w):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=tol, atol=tol)


def test_swa_equal_matches_torch_averaged_model():
    model, ckpts = _make_lm_and_checkpoints()
    swa_model = torch.optim.swa_utils.AveragedModel(model)
    for sd in ckpts:
        model.load_state_dict(sd)
        swa_model.update_parameters(model)
    want, _ = TC.convert_lm(swa_model.module.state_dict())

    got = swa_average(_repo_states(ckpts)).params
    _assert_tree_close(got, want)


def test_swa_exp_matches_torch_averaged_model():
    decay = 0.9
    model, ckpts = _make_lm_and_checkpoints()
    # the reference's exp avg_fn, model.py:498-501
    swa_model = torch.optim.swa_utils.AveragedModel(
        model,
        avg_fn=lambda avg, p, n: (1 - decay) * avg + decay * p,
    )
    for sd in ckpts:
        model.load_state_dict(sd)
        swa_model.update_parameters(model)
    want, _ = TC.convert_lm(swa_model.module.state_dict())

    got = swa_exp_average(_repo_states(ckpts), decay=decay).params
    _assert_tree_close(got, want)


# ---------------------------------------------------------------------------
# evaluate() WER-number parity
# ---------------------------------------------------------------------------

TEXTS = [
    "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG",
    "SHE SELLS SEA SHELLS BY THE SEA SHORE",
    "DON'T STOP ME NOW",
    "IT WAS THE BEST OF TIMES",
]


class _SynthDataset:
    """LibriSpeechDataset duck type over fixed-length synthetic audio."""

    class U:
        def __init__(self, audio_len, label_len):
            self.audio_len = audio_len
            self.label_len = label_len

    def __init__(self, audios, labels):
        self.audios = audios
        self.labels = labels
        self.utterances = [self.U(len(a), len(l))
                           for a, l in zip(audios, labels)]

    def __len__(self):
        return len(self.utterances)

    def __getitem__(self, i):
        return self.audios[i], self.labels[i]


def test_evaluate_wer_number_matches_reference_pipeline(tmp_path):
    from efficientconformer_tpu.data.tokenizer import train_bpe
    from efficientconformer_tpu.utils.metrics import wer

    tok = train_bpe(iter(TEXTS), vocab_size=128)
    tok_path = str(tmp_path / "bpe.model")
    tok.save(tok_path)

    ref = import_reference_full()
    import json
    with open("configs/EfficientConformerCTCSmall.json") as f:
        cfg = json.load(f)
    cfg["tokenizer_params"]["tokenizer_path"] = tok_path
    cfg["tokenizer_params"]["vocab_size"] = tok.vocab_size()
    cfg["encoder_params"]["vocab_size"] = tok.vocab_size()

    torch.manual_seed(3)
    ref_model = ref.model_ctc.ModelCTC(
        encoder_params=cfg["encoder_params"],
        tokenizer_params=cfg["tokenizer_params"],
        training_params=cfg["training_params"],
        decoding_params=cfg["decoding_params"],
        name=cfg["model_name"],
    ).eval()

    # shared weights into a repo trainer state
    params, stats = TC.convert_ctc(ref_model.state_dict())
    from efficientconformer_tpu.config import load_config
    from efficientconformer_tpu.training.trainer import Trainer
    from efficientconformer_tpu.runtime import evaluate

    config = load_config("configs/EfficientConformerCTCSmall.json")
    config.tokenizer_params["tokenizer_path"] = tok_path
    config.tokenizer_params["vocab_size"] = tok.vocab_size()
    # fp32 apples-to-apples: the torch reference decodes in fp32 here
    config.training_params["mixed_precision"] = False
    trainer = Trainer(config)

    # equal-length utterances: the bucketing loader pads nothing, so torch
    # sees byte-identical audio
    t = 2 * 16000
    rng = np.random.default_rng(23)
    audios = [rng.standard_normal(t).astype(np.float32) * 0.1
              for _ in TEXTS]
    labels = [np.asarray(tok.encode(s.lower()), np.int32) for s in TEXTS]
    dataset = _SynthDataset(audios, labels)

    micro = {
        "audio": np.stack(audios),
        "labels": np.stack(
            [np.pad(l, (0, max(len(q) for q in labels) - len(l)))
             for l in labels]),
        "audio_len": np.full((len(TEXTS),), t, np.int32),
        "label_len": np.asarray([len(l) for l in labels], np.int32),
    }
    state = trainer.init_state(micro)
    state = state.replace(
        params=jax.tree.map(jnp.asarray, params),
        batch_stats=jax.tree.map(jnp.asarray, stats),
    )

    got_wer, got_truths, got_preds, _ = evaluate(
        trainer, state, dataset, tok, batch_size=len(TEXTS))

    # reference pipeline on the same utterances (model.py:409-425,483)
    x = torch.from_numpy(np.stack(audios))
    x_len = torch.full((len(TEXTS),), t, dtype=torch.int64)
    with torch.no_grad():
        ref_preds = ref_model.gready_search_decoding(x, x_len)
    ref_truths = tok.decode([l.tolist() for l in labels])

    assert got_truths == ref_truths
    assert got_preds == ref_preds
    want_wer = wer(ref_truths, ref_preds)
    assert got_wer == want_wer
    assert 0.0 < got_wer  # random weights: some errors must exist
