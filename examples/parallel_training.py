#!/usr/bin/env python
"""Train over a (data, seq, model) mesh — runnable anywhere.

Demonstrates the three composable parallelism axes beyond the reference's
data-parallel DDP (reference main.py:35,217-220):

  * data:  batch sharding; gradient psum inserted by XLA (parallel/mesh.py)
  * seq:   sequence parallelism — encoder activations sharded along TIME;
           GSPMD derives conv halo exchanges and attention K/V gathers
           (parallel/mesh.seq_constraint). For long-audio training where one
           chip cannot hold an utterance's activations.
  * model: Megatron-style tensor parallelism over FFN/attention projections
           (parallel/mesh.shard_params).

Without TPU hardware this runs on 8 virtual CPU devices, which is exactly
how tests/test_seq_parallel.py asserts SP==DP==TP numerics. On a real pod
slice, remove the virtual-device forcing and jax.distributed.initialize()
per host (see README).

Usage:  python examples/parallel_training.py [--steps 3]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# default: 8 virtual CPU devices (a sitecustomize may pre-set JAX_PLATFORMS
# to a hardware backend — jax.config.update below overrides it, the env var
# alone would not). --real-devices uses whatever hardware JAX finds.
if "--real-devices" not in sys.argv:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax

if "--real-devices" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--real-devices", action="store_true",
                    help="use the hardware JAX finds instead of 8 virtual "
                         "CPU devices")
    args = ap.parse_args()

    from efficientconformer_tpu.config import from_dict
    from efficientconformer_tpu.parallel import mesh as mesh_lib
    from efficientconformer_tpu.training.trainer import Trainer

    cfg = from_dict({
        "model_type": "CTC",
        "model_name": "parallel-demo",
        "encoder_params": {
            "arch": "Conformer", "num_blocks": 4, "dim_model": 32,
            "ff_ratio": 2, "num_heads": 2, "kernel_size": 7, "Pdrop": 0.0,
            "relative_pos_enc": True, "max_pos_encoding": 256,
            "subsampling_module": "Conv2d", "subsampling_layers": 1,
            "subsampling_filters": [16], "subsampling_kernel_size": 3,
            "subsampling_norm": "batch", "subsampling_act": "swish",
            "sample_rate": 16000, "win_length_ms": 25, "hop_length_ms": 10,
            "n_fft": 512, "n_mels": 80, "normalize": False, "mean": 0.0,
            "std": 1.0, "spec_augment": False, "mF": 0, "F": 0, "mT": 0,
            "pS": 0.0,
        },
        "tokenizer_params": {"vocab_size": 32, "vocab_type": "bpe",
                             "tokenizer_path": "/nonexistent"},
        "training_params": {
            "optimizer": "Adam", "beta1": 0.9, "beta2": 0.98, "eps": 1e-9,
            "weight_decay": 1e-6, "lr_schedule": "Constant",
            "lr_value": 1e-3, "mixed_precision": False,
            # the two extension knobs (also CLI: --seq_parallel/--model_parallel)
            "seq_parallel": 2, "model_parallel": 2,
        },
        "decoding_params": {},
    })

    trainer = Trainer(cfg)
    print("mesh:", dict(trainer.mesh.shape))

    # pick an audio length whose frame counts divide the seq axis at every
    # sharding-constraint point (see parallel/mesh.sp_audio_lengths)
    sp = cfg.training_params["seq_parallel"]
    lens = mesh_lib.sp_audio_lengths(cfg.encoder_params, sp, 16000, 32000)
    t = lens[0]
    print(f"seq-parallel-compatible audio length: {t} samples "
          f"(frame schedule {mesh_lib.seq_frame_schedule(cfg.encoder_params, t)})")

    rng = np.random.default_rng(0)
    b = 4  # divisible by the data axis
    micro = {
        "audio": rng.standard_normal((b, t)).astype(np.float32) * 0.1,
        "labels": rng.integers(1, 31, (b, 8)).astype(np.int32),
        "audio_len": np.full((b,), t, np.int32),
        "label_len": np.full((b,), 8, np.int32),
    }

    state = trainer.init_state(micro)
    state = state.replace(
        params=mesh_lib.shard_params(trainer.mesh, state.params))
    batch = mesh_lib.shard_batch(
        trainer.mesh, {k: v[None] for k, v in micro.items()}, batch_axis=1)
    step = trainer.train_step_fn()
    for i in range(args.steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        print(f"step {i + 1}: loss {float(metrics['loss']):.4f} "
              f"grad_norm {float(metrics['grad_norm']):.2f}")

    # proof the parameters really live sharded over the model axis
    k = state.params["encoder"]["block_0"]["ffn1"]["fc1"]["kernel"]
    print("ffn1/fc1 kernel sharding:", k.sharding.spec)


if __name__ == "__main__":
    main()
