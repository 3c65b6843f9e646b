#!/usr/bin/env python
"""Produce a TRAINED checkpoint for the streaming operating-point study
(VERDICT r4 item 3) without LibriSpeech: overfit the real config on the SAME
fixed structured utterances `scripts/streaming_operating_point.py` decodes
(same generator, same seed), so the trained model has confident peaks on
exactly the audio the grid measures.

The reference has no analogue (it assumes real data is present); this is the
harness that validates the random-weight disagreement numbers are the claimed
CONSERVATIVE bound for trained weights.

Usage:
  python scripts/overfit_ckpt.py --out /tmp/ckpt_small.msgpack
      [--config configs/EfficientConformerCTCSmall.json] [--steps 400]
      [--utts 8] [--seconds 12] [--lr 3e-4] [--cpu]
"""

import argparse
import importlib.util
import os
import sys
import time

sys.path.insert(0, ".")


def _structured_audio():
    spec = importlib.util.spec_from_file_location(
        "sop", os.path.join(os.path.dirname(__file__),
                            "streaming_operating_point.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.structured_audio


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    default="configs/EfficientConformerCTCSmall.json")
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--utts", type=int, default=8)
    ap.add_argument("--seconds", type=int, default=12)
    ap.add_argument("--tokens", type=int, default=30,
                    help="label tokens per utterance")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax
    import jax.numpy as jnp

    from efficientconformer_tpu.config import load_config
    from efficientconformer_tpu.training import checkpoint
    from efficientconformer_tpu.training.trainer import Trainer, train_rng

    structured_audio = _structured_audio()

    cfg = load_config(args.config)
    # overfitting setup: constant LR, no augmentation noise sources
    cfg.training_params["lr_schedule"] = "Constant"
    cfg.training_params["lr_value"] = args.lr
    cfg.training_params["accumulated_steps"] = 1
    cfg.training_params["mixed_precision"] = not args.cpu
    cfg.encoder_params["spec_augment"] = False  # augment off: memorize cleanly

    # the SAME audio the operating-point grid decodes: generator seed 0
    rng = np.random.default_rng(0)
    b = args.utts
    t = args.seconds * cfg.encoder_params["sample_rate"]
    audio = np.stack(
        [structured_audio(rng, args.seconds) for _ in range(b)])
    # fixed per-utterance label sequences (any consistent mapping works)
    lrng = np.random.default_rng(1)
    u = args.tokens
    labels = lrng.integers(1, cfg.vocab_size, (b, u)).astype(np.int32)
    micro = {
        "audio": audio,
        "labels": labels,
        "audio_len": np.full((b,), t, np.int32),
        "label_len": np.full((b,), u, np.int32),
    }

    trainer = Trainer(cfg)
    state = trainer.init_state(micro)
    step = trainer.train_step_fn()
    batch = {k: jnp.asarray(v[None]) for k, v in micro.items()}
    key = train_rng(0)

    t0 = time.time()
    loss0 = None
    for i in range(args.steps):
        state, m = step(state, batch, jax.random.fold_in(key, i))
        if i == 0:
            loss0 = float(m["loss"])
        if (i + 1) % 50 == 0:
            print(f"step {i + 1:4d}  loss {float(m['loss']):8.4f}", flush=True)
    lossN = float(m["loss"])
    dt = time.time() - t0
    print(f"overfit: loss {loss0:.3f} -> {lossN:.3f} over {args.steps} steps "
          f"({dt:.0f}s, {1e3 * dt / args.steps:.1f} ms/step)")

    checkpoint.save(args.out, state, save_optimizer=False, fmt="msgpack")
    print("saved:", args.out)


if __name__ == "__main__":
    main()
