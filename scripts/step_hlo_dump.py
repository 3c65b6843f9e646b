#!/usr/bin/env python
"""Dump the full train step's optimized HLO + XLA cost/memory analysis at
HEAD (the byte-budget source for scripts/hlo_traffic.py).

Usage:
  python scripts/step_hlo_dump.py [--config configs/EfficientConformerCTCLarge.json]
      [--batch 16] [--seconds 16] [--out /tmp/step_b16.hlo]

Writes the optimized-HLO text to --out and prints cost_analysis (flops,
bytes accessed) and memory_analysis (arg/output/temp/peak bytes).
Enables the persistent compilation cache (JAX_COMPILATION_CACHE_DIR or
/root/.cache/jax_comp) so repeated measurement runs skip the multi-minute
tunnel compile.
"""

import argparse
import os
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/EfficientConformerCTCLarge.json")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=16.0)
    ap.add_argument("--out", default="/tmp/step_b16.hlo")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from efficientconformer_tpu.config import load_config
    from efficientconformer_tpu.training.trainer import Trainer

    cfg = load_config(args.config)
    cfg.training_params["mixed_precision"] = True
    cfg.training_params["accumulated_steps"] = 1

    t_audio = int(16000 * args.seconds)
    u = max(int(args.seconds * 5.0), 4)
    rng = np.random.default_rng(0)
    micro = {
        "audio": (rng.standard_normal((args.batch, t_audio)) * 0.1).astype(
            np.float32
        ),
        "labels": rng.integers(1, cfg.vocab_size, (args.batch, u)).astype(
            np.int32
        ),
        "audio_len": np.full((args.batch,), t_audio, np.int32),
        "label_len": np.full((args.batch,), u, np.int32),
    }
    trainer = Trainer(cfg)
    state = trainer.init_state(micro)
    batch = {k: jnp.asarray(v)[None] for k, v in micro.items()}
    from efficientconformer_tpu.training.trainer import train_rng
    key = train_rng(0)

    step = trainer.train_step_fn()
    import time

    t0 = time.time()
    comp = step.lower(state, batch, key).compile()
    print(f"compile: {time.time() - t0:.0f}s")
    with open(args.out, "w") as f:
        f.write(comp.as_text())
    print("wrote", args.out, os.path.getsize(args.out) / 1e6, "MB")
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print("cost_analysis:")
    for k in ("flops", "bytes accessed"):
        if k in ca:
            print(f"  {k}: {ca[k]/1e9:.2f} G")
    try:
        ma = comp.memory_analysis()
        print("memory_analysis:")
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "peak_memory_in_bytes"):
            print(f"  {k}: {getattr(ma, k)/1e9:.2f} GB")
    except Exception as e:
        print("memory_analysis unavailable:", e)


if __name__ == "__main__":
    main()
