#!/usr/bin/env python
"""Import a reference PyTorch checkpoint into this framework's format.

The reference saves ``{"model_state_dict", "optimizer_state_dict",
"model_step", "tokenizer", "is_distributed"}`` via torch.save
(reference models/model.py:346-384). This tool converts the model weights
with utils.torch_compat and writes a framework checkpoint loadable by
``--initial_epoch`` (optimizer state is not convertible across frameworks
and is re-initialised).

The ``tokenizer`` entry is a pickled sentencepiece processor; with
``--with-tokenizer`` its serialized ModelProto is extracted (via the
spm_shim, no sentencepiece package needed) and written to the config's
``tokenizer_path`` — pairing the imported weights with the *exact*
vocabulary they were trained on, which is what published-WER reproduction
requires (reference models/model.py:50).

Usage:
  python scripts/import_torch_checkpoint.py \
      --config_file configs/EfficientConformerCTCSmall.json \
      --torch_ckpt checkpoints_swa-equal-401-450.ckpt \
      --out callbacks/EfficientConformerCTCSmall/checkpoints_450.ckpt \
      --with-tokenizer
"""

import argparse
import os
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", required=True)
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--with-tokenizer", action="store_true",
                   help="extract the pickled sentencepiece tokenizer and "
                        "write it to the config's tokenizer_path")
    p.add_argument("--tokenizer_out", default=None,
                   help="override output path for the extracted .model")
    args = p.parse_args()

    from efficientconformer_tpu.utils import spm_shim

    spm_shim.install()  # lets torch.load unpickle the tokenizer entry

    import torch
    import jax
    import jax.numpy as jnp

    from efficientconformer_tpu.config import load_config
    from efficientconformer_tpu.runtime import example_microbatch
    from efficientconformer_tpu.training.trainer import Trainer
    from efficientconformer_tpu.training import checkpoint
    from efficientconformer_tpu.utils import torch_compat as TC

    config = load_config(args.config_file)
    ckpt = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    sd = ckpt["model_state_dict"] if "model_state_dict" in ckpt else ckpt

    interctc = tuple(config.encoder_params.get("interctc_blocks", ()))
    params, stats = TC.convert_model(sd, config.model_type, interctc)

    trainer = Trainer(config)
    state = trainer.init_state(example_microbatch(config))
    TC.assert_trees_match(state.params, params)
    TC.assert_trees_match(state.batch_stats, stats)
    state = state.replace(
        params=jax.tree.map(jnp.asarray, params),
        batch_stats=jax.tree.map(jnp.asarray, stats),
        step=jnp.asarray(int(ckpt.get("model_step", 0)), jnp.int32),
    )
    checkpoint.save(args.out, state, save_optimizer=False)
    n = sum(int(p.size) for p in jax.tree.leaves(state.params))
    print(f"imported {n} parameters (step {int(state.step)}) -> {args.out}")

    if args.with_tokenizer:
        tok_entry = ckpt.get("tokenizer")
        if tok_entry is None:
            print("checkpoint carries no tokenizer entry; skipping")
            return
        proto = tok_entry.serialized_model_proto()
        tok_path = args.tokenizer_out or config.tokenizer_params.get(
            "tokenizer_path")
        os.makedirs(os.path.dirname(tok_path) or ".", exist_ok=True)
        with open(tok_path, "wb") as f:
            f.write(proto)
        from efficientconformer_tpu.data.tokenizer import BpeTokenizer

        tok = BpeTokenizer.load(tok_path)
        want = int(config.tokenizer_params.get("vocab_size", tok.vocab_size()))
        if tok.vocab_size() != want:
            print(f"WARNING: extracted vocab size {tok.vocab_size()} != "
                  f"config vocab_size {want}")
        print(f"extracted tokenizer ({tok.vocab_size()} pieces) -> {tok_path}")


if __name__ == "__main__":
    main()
