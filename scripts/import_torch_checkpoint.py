#!/usr/bin/env python
"""Import a reference PyTorch checkpoint into this framework's format.

The reference saves ``{"model_state_dict", "optimizer_state_dict",
"model_step", "tokenizer", "is_distributed"}`` via torch.save
(reference models/model.py:346-384). This tool converts the model weights
with utils.torch_compat and writes a framework checkpoint loadable by
``--initial_epoch`` (optimizer state is not convertible across frameworks
and is re-initialised).

Usage:
  python scripts/import_torch_checkpoint.py \
      --config_file configs/EfficientConformerCTCSmall.json \
      --torch_ckpt checkpoints_swa-equal-401-450.ckpt \
      --out callbacks/EfficientConformerCTCSmall/checkpoints_450.ckpt
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", required=True)
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

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


if __name__ == "__main__":
    main()
