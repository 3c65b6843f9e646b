#!/usr/bin/env python
"""Generate the shipped experiment configs.

The JSON schema and hyperparameter values match the reference framework's public
config API (reference configs/*.json; paper arXiv:2109.01163 Tables 1-2) so that
users of the reference can point this framework at their existing configs.
Configs are generated from the compact tables below rather than stored by hand.
"""

import json
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "configs")

SR = dict(sample_rate=16000, win_length_ms=25, hop_length_ms=10, n_fft=512,
          n_mels=80, normalize=False, mean=-5.6501, std=4.2280)


def enc_efficient(dims, heads, filters, n_blocks, strided, mT):
    """Efficient Conformer encoder: 3-stage progressive downsampling, grouped
    attention (G=3) in stage 1, stride-2 depthwise conv at the stage boundaries."""
    return {
        "arch": "Conformer", "num_blocks": n_blocks, "dim_model": dims,
        "ff_ratio": 4, "num_heads": heads, "kernel_size": 15, "Pdrop": 0.1,
        "conv_stride": 2, "att_stride": 1,
        "strided_blocks": strided, "expand_blocks": strided,
        "att_group_size": [3, 1, 1],
        "relative_pos_enc": True, "max_pos_encoding": 10000,
        "subsampling_module": "Conv2d", "subsampling_layers": 1,
        "subsampling_filters": [filters], "subsampling_kernel_size": 3,
        "subsampling_norm": "batch", "subsampling_act": "swish",
        **SR,
        "spec_augment": True, "mF": 2, "F": 27, "mT": mT, "pS": 0.05,
    }


def enc_vanilla(dim, heads, n_blocks, mT):
    """Vanilla Conformer encoder: constant width, 4x Conv2d subsampling."""
    return {
        "arch": "Conformer", "num_blocks": n_blocks, "dim_model": dim,
        "ff_ratio": 4, "num_heads": heads, "kernel_size": 31, "Pdrop": 0.1,
        "relative_pos_enc": True, "max_pos_encoding": 10000,
        "subsampling_module": "Conv2d", "subsampling_layers": 2,
        "subsampling_filters": [dim, dim], "subsampling_kernel_size": 3,
        "subsampling_norm": "batch", "subsampling_act": "swish",
        **SR,
        "spec_augment": True, "mF": 2, "F": 27, "mT": mT, "pS": 0.05,
    }


def train_params(name, epochs, bs, acc, sched_dim, K=2, vn=False, label_max=256000):
    p = {
        "epochs": epochs, "batch_size": bs, "accumulated_steps": acc,
        "mixed_precision": True,
        "optimizer": "Adam", "beta1": 0.9, "beta2": 0.98, "eps": 1e-9,
        "weight_decay": 1e-6,
        "lr_schedule": "Transformer", "schedule_dim": sched_dim,
        "warmup_steps": 10000, "K": K,
        "train_audio_max_length": 256000, "train_label_max_length": label_max,
        "eval_audio_max_length": None, "eval_label_max_length": None,
        "training_dataset": "LibriSpeech",
        "training_dataset_path": "datasets/LibriSpeech/",
        "evaluation_dataset": "LibriSpeech",
        "evaluation_dataset_path": "datasets/LibriSpeech/",
        "callback_path": "callbacks/%s/" % name,
    }
    if vn:
        p["vn_start_step"] = 20000
        p["vn_std"] = 0.075
    return p


def decoding_params(vocab):
    return {
        "beam_size": 16, "tmp": 1,
        "ngram_path": "callbacks/ngram/6gram_%d.arpa" % vocab,
        "ngram_alpha": 0.3, "ngram_beta": 1,
        "lm_config": "configs/LM-Transformer.json", "lm_weight": 1, "lm_tmp": 1,
    }


def tok_params(vocab):
    return {
        "tokenizer_path": "datasets/LibriSpeech/LibriSpeech_bpe_%d.model" % vocab,
        "vocab_type": "bpe", "vocab_size": vocab,
    }


def rnn_decoder(dim):
    return {"arch": "RNN", "num_layers": 1, "dim_model": dim, "vocab_size": 1000}


CONFIGS = {}

# --- Efficient Conformer CTC (S/M/L) ---------------------------------------
for size, dims, heads, nb, strided, bs, acc, mT in [
    ("Small", [120, 168, 240], 4, 15, [4, 9], 32, 2, 5),
    ("Medium", [180, 256, 360], 4, 16, [4, 10], 16, 4, 5),
    ("Large", [360, 512, 720], 8, 16, [4, 10], 16, 4, 10),
]:
    name = "EfficientConformerCTC" + size
    CONFIGS[name] = {
        "model_name": "Efficient Conformer CTC " + size,
        "model_type": "CTC",
        "encoder_params": enc_efficient(dims, heads, dims[0], nb, strided, mT),
        "tokenizer_params": tok_params(256),
        "training_params": train_params(name, 450, bs, acc, dims[-1]),
        "decoding_params": decoding_params(256),
    }

# --- Efficient Conformer Transducer (S/M/L) --------------------------------
for size, dims, heads, nb, strided, bs, acc, dec_dim, K in [
    ("Small", [100, 140, 200], 4, 15, [4, 9], 16, 4, 320, 5),
    ("Medium", [180, 256, 360], 4, 15, [4, 9], 16, 4, 640, 2),
    ("Large", [360, 512, 720], 8, 15, [4, 9], 16, 4, 640, 2),
]:
    name = "EfficientConformerTransducer" + size
    CONFIGS[name] = {
        "model_name": "Efficient Conformer Transducer " + size,
        "model_type": "Transducer",
        "encoder_params": enc_efficient(dims, heads, dims[0], nb, strided, 10),
        "decoder_params": rnn_decoder(dec_dim),
        "joint_params": {"joint_mode": "sum", "dim_model": dec_dim, "act": "tanh"},
        "tokenizer_params": tok_params(1000),
        "training_params": train_params(name, 250, bs, acc, dims[-1], K=K,
                                        vn=True, label_max=90),
        "decoding_params": decoding_params(1000),
    }

# --- Vanilla Conformer CTC (S/M/L) ------------------------------------------
for size, dim, heads, nb, bs, acc, mT in [
    ("Small", 176, 4, 16, 32, 2, 5),
    ("Medium", 256, 4, 18, 16, 4, 5),
    ("Large", 512, 8, 18, 16, 4, 10),
]:
    name = "ConformerCTC" + size
    CONFIGS[name] = {
        "model_name": "Conformer CTC " + size,
        "model_type": "CTC",
        "encoder_params": enc_vanilla(dim, heads, nb, mT),
        "tokenizer_params": tok_params(256),
        "training_params": train_params(name, 450, bs, acc, dim),
        "decoding_params": decoding_params(256),
    }

# --- Vanilla Conformer Transducer (S/M/L) -----------------------------------
for size, dim, heads, nb, bs, acc, dec_dim in [
    ("Small", 144, 6, 16, 16, 4, 320),
    ("Medium", 256, 4, 16, 8, 8, 640),
    ("Large", 512, 8, 17, 8, 8, 640),
]:
    name = "ConformerTransducer" + size
    CONFIGS[name] = {
        "model_name": "Conformer Transducer " + size,
        "model_type": "Transducer",
        "encoder_params": enc_vanilla(dim, heads, nb, 10),
        "decoder_params": rnn_decoder(dec_dim),
        "joint_params": {"joint_mode": "sum", "dim_model": dec_dim, "act": "tanh"},
        "tokenizer_params": tok_params(1000),
        "training_params": train_params(name, 250, bs, acc, dim, vn=True,
                                        label_max=90),
        "decoding_params": decoding_params(1000),
    }

# --- Language models ---------------------------------------------------------
lm_rnn_train = train_params("LM-RNN", 100, 16, 4, 0, label_max=100)
for k in ["lr_schedule", "schedule_dim", "warmup_steps", "K",
          "train_audio_max_length", "vn_start_step", "vn_std"]:
    lm_rnn_train.pop(k, None)
lm_rnn_train.update({
    "lr_schedule": "Constant", "lr_value": 0.001,
    "training_dataset": "LibriSpeechCorpus",
    "training_dataset_path": "datasets/librispeech-lm-norm.txt",
    "lm_mode": True,
})
CONFIGS["LM-RNN"] = {
    "model_name": "LM RNN",
    "model_type": "LM",
    "lm_params": {"arch": "RNN", "num_layers": 3, "vocab_size": 1000,
                  "dim_model": 4096},
    "tokenizer_params": tok_params(1000),
    "training_params": lm_rnn_train,
    "decoding_params": {"beam_size": 16, "tmp": 1},
}

lm_tf_train = dict(lm_rnn_train)
lm_tf_train.update({
    "batch_size": 64, "accumulated_steps": 5,
    "beta2": 0.95, "eps": 1e-8, "weight_decay": 0.0,
    "lr_schedule": "Cosine", "warmup_steps": 1000, "end_step": 300000,
    "lr_max": 6e-4, "lr_min": 6e-5,
    "callback_path": "callbacks/LM-Transformer/",
})
lm_tf_train.pop("lr_value", None)
CONFIGS["LM-Transformer"] = {
    "model_name": "Transformer XL LM",
    "model_type": "LM",
    "lm_params": {"arch": "Transformer", "num_blocks": 12, "dim_model": 768,
                  "ff_ratio": 4, "num_heads": 12, "vocab_size": 1000,
                  "relative_pos_enc": True, "max_pos_encoding": 2048,
                  "Pdrop": 0.1},
    "tokenizer_params": tok_params(1000),
    "training_params": lm_tf_train,
    "decoding_params": {"beam_size": 16, "tmp": 1},
}


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    for name, cfg in CONFIGS.items():
        path = os.path.join(OUT, name + ".json")
        with open(path, "w") as f:
            json.dump(cfg, f, indent=2)
            f.write("\n")
        print("wrote", path)
