"""Real-WER acceptance drill (VERDICT r4 item 6).

The BASELINE.md acceptance bar (WER within 0.1 absolute of the reference,
oracle /root/reference/models/model.py:386-490) cannot be run without the
real LibriSpeech audio, which is absent from this image. This test keeps the
reproduction path permanently ready: it builds a synthetic mini-LibriSpeech
whose audio is REAL .flac (encoded by the in-repo spec-conformant encoder,
decoded in the data path by native/flac_decode.cpp — the exact code that
will decode the real corpus), drives the full CLI

    main.py --mode training  --create_tokenizer --prepare_dataset
    main.py --mode test-clean --initial_epoch 1 --gready

and asserts the WER the CLI prints equals the in-process ``evaluate()``
oracle (runtime.py:263-315, proven jiwer-faithful in test_swa_parity.py)
run on the same checkpoint, dataset, and tokenizer. The day real audio
appears, the acceptance run is the same two commands on the real paths
(README "Reproducing the reference WER").
"""

import json
import os
import re

import numpy as np
import pytest

from flac_encoder import encode_flac
from test_e2e import SENTENCES, make_config, run_cli

from efficientconformer_tpu.data import audio_io

pytestmark = pytest.mark.skipif(
    audio_io._native_lib() is None, reason="native FLAC decoder unavailable"
)


def write_flac(path, seconds, seed):
    rng = np.random.default_rng(seed)
    t = int(16000 * seconds)
    x = np.clip(rng.standard_normal(t) * 0.05 * 32767, -32768, 32767)
    data = encode_flac(x.astype(np.int64)[None], subframe="fixed", order=2)
    with open(path, "wb") as f:
        f.write(data)


def make_flac_dataset(root):
    # same LibriSpeech directory layout as datasets/download_LibriSpeech.sh,
    # but .flac (the real corpus format) instead of test_e2e's .wav
    for split, sents in [
        ("train-clean-100", SENTENCES),
        ("dev-clean", SENTENCES[:4]),
        ("test-clean", SENTENCES[4:]),
    ]:
        d = os.path.join(root, split, "1", "1")
        os.makedirs(d, exist_ok=True)
        lines = []
        for i, s in enumerate(sents):
            utt = f"1-1-{i:04d}"
            write_flac(os.path.join(d, utt + ".flac"), 1.5 + 0.1 * i, i)
            lines.append(f"{utt} {s.upper()}")
        with open(os.path.join(d, "1-1.trans.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")


@pytest.mark.slow
def test_wer_readiness_flac_cli_equals_oracle(tmp_path, capsys):
    root = os.path.join(str(tmp_path), "LibriSpeech")
    make_flac_dataset(root)
    config_path = make_config(root, tmp_path)
    cfg = json.load(open(config_path))
    cfg["training_params"]["epochs"] = 1
    with open(config_path, "w") as f:
        json.dump(cfg, f)

    # command 1: tokenizer + manifests (flac decoded natively) + 1 epoch
    run_cli(config_path, "training", create_tokenizer=True,
            prepare_dataset=True, steps_per_epoch=2, val_steps=1,
            batch_size_eval=2)
    assert os.path.exists(
        os.path.join(str(tmp_path), "callbacks", "checkpoints_1.ckpt"))

    # command 2: the acceptance evaluation
    run_cli(config_path, "test-clean", initial_epoch="1", gready=True,
            batch_size_eval=2)
    out = capsys.readouterr().out
    m = re.search(r"Greedy Search WER : ([0-9.]+)%", out)
    assert m, f"CLI did not print a WER line:\n{out}"
    cli_wer = float(m.group(1))

    # oracle: in-process evaluate() on the same checkpoint/dataset/tokenizer
    from efficientconformer_tpu import runtime
    from efficientconformer_tpu.config import load_config
    from efficientconformer_tpu.data.datasets import LibriSpeechDataset
    from efficientconformer_tpu.training import checkpoint
    from efficientconformer_tpu.training.trainer import Trainer

    config = load_config(config_path)
    tokenizer = runtime.load_tokenizer(config)
    trainer = Trainer(config)
    state = trainer.init_state(runtime.example_microbatch(config))
    state = checkpoint.load(
        os.path.join(str(tmp_path), "callbacks", "checkpoints_1.ckpt"), state)
    ds = LibriSpeechDataset(
        root + "/", "test-clean",
        vocab_type=config.tokenizer_params["vocab_type"],
        vocab_size=config.vocab_size)
    w, truths, preds, _ = runtime.evaluate(
        trainer, state, ds, tokenizer, batch_size=2, beam_size=1)
    assert truths and preds
    assert cli_wer == pytest.approx(100.0 * w, abs=5e-3), (
        f"CLI printed {cli_wer}%, oracle computed {100.0 * w}%")
