"""End-to-end pipeline smoke test on a synthetic mini-LibriSpeech.

Exercises the full user workflow of the reference (notebook cells 14-22):
create_tokenizer -> prepare_dataset -> training with validation + checkpoints
-> test-mode WER eval -> SWA — all through the CLI runtime (main.py arg
surface), on a tiny model and a generated corpus.
"""

import argparse
import json
import os
import sys
import wave

import numpy as np
import pytest


SENTENCES = [
    "the cat sat on the mat",
    "a dog ran in the park",
    "the bird flew over the tree",
    "cats and dogs play all day",
    "the sun is warm today",
    "rain falls on the green grass",
    "the cat and the dog sleep",
    "birds sing in the morning",
]


def write_wav(path, seconds, seed):
    rng = np.random.default_rng(seed)
    t = int(16000 * seconds)
    x = (rng.standard_normal(t) * 0.05 * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(x.tobytes())


def make_dataset(root):
    # utterances must be long enough that encoder frames (8x downsampling)
    # exceed the BPE label length, or the CTC lattice has no valid path
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
            write_wav(os.path.join(d, utt + ".wav"), 1.5 + 0.1 * i, i)
            lines.append(f"{utt} {s.upper()}")
        with open(os.path.join(d, "1-1.trans.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")


TINY_ENC = {
    "arch": "Conformer", "num_blocks": 3, "dim_model": [12, 16, 20],
    "ff_ratio": 2, "num_heads": 2, "kernel_size": 7, "Pdrop": 0.0,
    "conv_stride": 2, "att_stride": 1, "strided_blocks": [1, 2],
    "expand_blocks": [1, 2], "att_group_size": [3, 1, 1],
    "relative_pos_enc": True, "max_pos_encoding": 256,
    "subsampling_module": "Conv2d", "subsampling_layers": 1,
    "subsampling_filters": [12], "subsampling_kernel_size": 3,
    "subsampling_norm": "batch", "subsampling_act": "swish",
    "sample_rate": 16000, "win_length_ms": 25, "hop_length_ms": 10,
    "n_fft": 512, "n_mels": 80, "normalize": False, "mean": 0.0, "std": 1.0,
    "spec_augment": True, "mF": 1, "F": 5, "mT": 1, "pS": 0.05,
}


def make_config(root, tmp_path):
    cfg = {
        "model_name": "Tiny E2E CTC",
        "model_type": "CTC",
        "encoder_params": TINY_ENC,
        "tokenizer_params": {
            "tokenizer_path": os.path.join(root, "bpe_48.model"),
            "vocab_type": "bpe",
            "vocab_size": 48,
        },
        "training_params": {
            "epochs": 2, "batch_size": 2, "accumulated_steps": 2,
            "mixed_precision": False,
            "optimizer": "Adam", "beta1": 0.9, "beta2": 0.98, "eps": 1e-9,
            "weight_decay": 1e-6,
            "lr_schedule": "Transformer", "schedule_dim": 20,
            "warmup_steps": 10, "K": 2,
            "train_audio_max_length": 200000, "train_label_max_length": 100,
            "eval_audio_max_length": None, "eval_label_max_length": None,
            "training_dataset": "LibriSpeech", "training_dataset_path": root + "/",
            "evaluation_dataset": "LibriSpeech",
            "evaluation_dataset_path": root + "/",
            "callback_path": os.path.join(str(tmp_path), "callbacks") + "/",
        },
        "decoding_params": {"beam_size": 4, "tmp": 1},
    }
    path = os.path.join(str(tmp_path), "tiny.json")
    with open(path, "w") as f:
        json.dump(cfg, f)
    return path


def run_cli(config_path, mode, **kw):
    # load the repo-root main.py by explicit path: plain `import main` can be
    # shadowed if another test put /root/reference (which has its own main.py)
    # on sys.path or in sys.modules first
    import importlib.util

    repo_main = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "main.py")
    cached = sys.modules.get("main")
    if cached is None or getattr(cached, "__file__", "") != repo_main:
        spec = importlib.util.spec_from_file_location("main", repo_main)
        cli = importlib.util.module_from_spec(spec)
        sys.modules["main"] = cli
        spec.loader.exec_module(cli)
    else:
        cli = cached

    args = [
        "--config_file", config_path, "--mode", mode,
    ]
    for k, v in kw.items():
        if v is True:
            args.append("--" + k)
        elif isinstance(v, (list, tuple)):
            args += ["--" + k] + [str(x) for x in v]
        elif v is not None:
            args += ["--" + k, str(v)]
    return cli.main(args)


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    root = os.path.join(str(tmp_path), "LibriSpeech")
    make_dataset(root)
    config_path = make_config(root, tmp_path)

    # tokenizer + dataset prep + 2-epoch training with validation/checkpoints
    run_cli(
        config_path, "training",
        create_tokenizer=True, prepare_dataset=True,
        steps_per_epoch=2, val_steps=1, batch_size_eval=2,
    )

    cb = os.path.join(str(tmp_path), "callbacks")
    assert os.path.exists(os.path.join(cb, "checkpoints_1.ckpt"))
    assert os.path.exists(os.path.join(cb, "checkpoints_2.ckpt"))

    # greedy test-mode evaluation from a checkpoint
    run_cli(
        config_path, "test-clean", initial_epoch="2",
        gready=True, batch_size_eval=2, val_steps=2,
    )

    # beam-search evaluation (beam_size from decoding_params; no n-gram file
    # configured -> acoustic-only prefix beam via the native C++ path)
    run_cli(
        config_path, "test-clean", initial_epoch="2",
        batch_size_eval=2, val_steps=1,
    )

    # SWA over the two checkpoints
    run_cli(
        config_path, "training",
        swa=True, swa_epochs=["1", "2"], steps_per_epoch=2,
    )
    assert os.path.exists(os.path.join(cb, "checkpoints_swa-equal-1-2.ckpt"))


@pytest.mark.slow
def test_transducer_pipeline(tmp_path):
    """Transducer training + greedy eval through the CLI (RNN-T loss in the
    fit path, batched label-synchronous decode in evaluation)."""
    root = os.path.join(str(tmp_path), "LibriSpeech")
    make_dataset(root)
    cfg_path = make_config(root, tmp_path)
    cfg = json.load(open(cfg_path))
    cfg["model_type"] = "Transducer"
    cfg["model_name"] = "Tiny E2E Transducer"
    cfg["decoder_params"] = {"arch": "RNN", "num_layers": 1, "dim_model": 16,
                             "vocab_size": 48}
    cfg["joint_params"] = {"joint_mode": "sum", "dim_model": 16, "act": "tanh"}
    cfg["training_params"]["epochs"] = 1
    cfg["training_params"]["vn_start_step"] = 1
    cfg["training_params"]["vn_std"] = 0.05
    cfg["training_params"]["callback_path"] = (
        os.path.join(str(tmp_path), "cb_rnnt") + "/"
    )
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    run_cli(cfg_path, "training", create_tokenizer=True, prepare_dataset=True,
            steps_per_epoch=2, val_steps=1, batch_size_eval=2)
    assert os.path.exists(
        os.path.join(str(tmp_path), "cb_rnnt", "checkpoints_1.ckpt")
    )
    run_cli(cfg_path, "test-clean", initial_epoch="1", gready=True,
            batch_size_eval=2, val_steps=1)


@pytest.mark.slow
def test_lm_training_smoke(tmp_path):
    """LM training on a text corpus through the CLI (reference §3.4)."""
    corpus = os.path.join(str(tmp_path), "corpus.txt")
    with open(corpus, "w") as f:
        for s in SENTENCES * 4:
            f.write(s + "\n")
    from efficientconformer_tpu.data.tokenizer import train_bpe

    tok = train_bpe(SENTENCES * 4, 48)
    tok_path = os.path.join(str(tmp_path), "bpe_48.model")
    tok.save(tok_path)

    cfg = {
        "model_name": "Tiny LM",
        "model_type": "LM",
        "lm_params": {"arch": "RNN", "num_layers": 1, "vocab_size": 48,
                      "dim_model": 16},
        "tokenizer_params": {"tokenizer_path": tok_path, "vocab_type": "bpe",
                             "vocab_size": 48},
        "training_params": {
            "epochs": 1, "batch_size": 4, "accumulated_steps": 1,
            "mixed_precision": False,
            "optimizer": "Adam", "beta1": 0.9, "beta2": 0.98, "eps": 1e-9,
            "weight_decay": 0.0,
            "lr_schedule": "Constant", "lr_value": 1e-3,
            "train_label_max_length": 24,
            "eval_audio_max_length": None, "eval_label_max_length": None,
            "training_dataset": "LibriSpeechCorpus",
            "training_dataset_path": corpus,
            "evaluation_dataset": "LibriSpeech",
            "evaluation_dataset_path": str(tmp_path),
            "lm_mode": True,
            "callback_path": os.path.join(str(tmp_path), "lm_cb") + "/",
        },
        "decoding_params": {"beam_size": 4, "tmp": 1},
    }
    cfg_path = os.path.join(str(tmp_path), "lm.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    # labels-only dev manifest so LM validation/evaluation can score
    # transcripts (reference lm_mode, utils/datasets.py:33,42-43)
    with open(os.path.join(str(tmp_path), "manifest_dev-clean_bpe_48.jsonl"), "w") as f:
        for s in SENTENCES[:4]:
            ids = tok.encode(s)
            f.write(json.dumps(
                {"audio": "none.wav", "audio_len": 16000, "labels": ids}) + "\n")

    run_cli(cfg_path, "training", steps_per_epoch=2)
    assert os.path.exists(os.path.join(str(tmp_path), "lm_cb", "checkpoints_1.ckpt"))

    # LM evaluation: eval loss + perplexity on the transcript manifest
    run_cli(cfg_path, "validation-clean", initial_epoch="1", eval_loss=True,
            batch_size_eval=2)


@pytest.mark.slow
def test_transducer_lm_fusion_cli(tmp_path):
    """Neural-LM shallow fusion end-to-end through the CLI: train a tiny
    transducer and a tiny LM, then beam-decode with --initial_epoch_lm
    (reference main.py:69-79 + transducer.py:260-273)."""
    root = os.path.join(str(tmp_path), "LibriSpeech")
    make_dataset(root)
    cfg_path = make_config(root, tmp_path)
    cfg = json.load(open(cfg_path))
    cfg["model_type"] = "Transducer"
    cfg["decoder_params"] = {"arch": "RNN", "num_layers": 1, "dim_model": 16,
                             "vocab_size": 48}
    cfg["joint_params"] = {"joint_mode": "sum", "dim_model": 16, "act": "tanh"}
    cfg["training_params"]["epochs"] = 1

    # LM config sharing the transducer's tokenizer
    corpus = os.path.join(str(tmp_path), "corpus.txt")
    with open(corpus, "w") as f:
        for s in SENTENCES * 2:
            f.write(s + "\n")
    lm_cfg = {
        "model_name": "Tiny fusion LM", "model_type": "LM",
        "lm_params": {"arch": "RNN", "num_layers": 1, "vocab_size": 48,
                      "dim_model": 16},
        "tokenizer_params": dict(cfg["tokenizer_params"]),
        "training_params": {
            "epochs": 1, "batch_size": 4, "accumulated_steps": 1,
            "mixed_precision": False, "optimizer": "Adam", "beta1": 0.9,
            "beta2": 0.98, "eps": 1e-9, "weight_decay": 0.0,
            "lr_schedule": "Constant", "lr_value": 1e-3,
            "train_label_max_length": 24,
            "eval_audio_max_length": None, "eval_label_max_length": None,
            "training_dataset": "LibriSpeechCorpus",
            "training_dataset_path": corpus,
            "evaluation_dataset": "LibriSpeech",
            "evaluation_dataset_path": str(tmp_path), "lm_mode": True,
            "callback_path": os.path.join(str(tmp_path), "fusion_lm_cb") + "/",
        },
        "decoding_params": {"beam_size": 4, "tmp": 1},
    }
    lm_cfg_path = os.path.join(str(tmp_path), "fusion_lm.json")
    with open(lm_cfg_path, "w") as f:
        json.dump(lm_cfg, f)
    cfg["decoding_params"].update(
        {"lm_config": lm_cfg_path, "lm_weight": 0.5, "lm_tmp": 1.0}
    )
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    run_cli(cfg_path, "training", create_tokenizer=True, prepare_dataset=True,
            steps_per_epoch=2, val_steps=1, batch_size_eval=2)
    run_cli(lm_cfg_path, "training", steps_per_epoch=2)

    # beam decode with fusion through the CLI flag surface
    run_cli(cfg_path, "test-clean", initial_epoch="1", initial_epoch_lm="1",
            batch_size_eval=2, val_steps=1)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    from efficientconformer_tpu.config import from_dict
    from efficientconformer_tpu.training.trainer import Trainer
    from efficientconformer_tpu.training import checkpoint
    from efficientconformer_tpu.runtime import example_microbatch
    import jax

    cfg = from_dict(json.load(open(make_config(str(tmp_path), tmp_path))))
    trainer = Trainer(cfg)
    state = trainer.init_state(example_microbatch(cfg))
    path = os.path.join(str(tmp_path), "ckpt.bin")
    trainer.save(state.replace(step=state.step + 7), path)
    loaded = checkpoint.load(path, state)
    assert int(loaded.step) == 7
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(loaded.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
