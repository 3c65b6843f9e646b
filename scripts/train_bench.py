#!/usr/bin/env python
"""Training-step throughput on the real chip.

Times the jitted train step (forward + loss + grads + optimizer update) for a
shipped config on synthetic batches — the production-relevant number for the
960 h LibriSpeech recipe. Dispatches asynchronously and fetches once, like
bench.py (the tunnelled platform's block_until_ready does not synchronise).

Usage:
  python scripts/train_bench.py [--config configs/EfficientConformerCTCSmall.json]
      [--batch 16] [--seconds 10] [--dtype bfloat16] [--pallas-bwd auto|on|off]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/EfficientConformerCTCSmall.json")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "bf16-encoder", "float32"],
                    help="bfloat16 = mixed_precision policy (whole forward); "
                         "bf16-encoder = encoder-only bf16 (pre-round-2 "
                         "behaviour, for comparison); float32 = full fp32")
    ap.add_argument("--pallas-bwd", default="auto", choices=["auto", "on", "off"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--label-hz", type=float, default=5.0,
                    help="synthetic label rate (BPE tokens per audio second)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    import efficientconformer_tpu.ops.pallas_attention as pa
    from efficientconformer_tpu.config import load_config
    from efficientconformer_tpu.training.trainer import Trainer

    if args.pallas_bwd != "auto":
        pa.PALLAS_BWD = args.pallas_bwd == "on"

    cfg = load_config(args.config)
    cfg.training_params["mixed_precision"] = args.dtype == "bfloat16"
    if args.dtype == "bf16-encoder":
        cfg.encoder_params["compute_dtype"] = "bfloat16"
    cfg.training_params["accumulated_steps"] = 1

    t_audio = int(16000 * args.seconds)
    u = max(int(args.seconds * args.label_hz), 4)
    vocab = cfg.vocab_size
    rng = np.random.default_rng(0)
    micro = {
        "audio": (rng.standard_normal((args.batch, t_audio)) * 0.1).astype(np.float32),
        "labels": rng.integers(1, vocab, (args.batch, u)).astype(np.int32),
        "audio_len": np.full((args.batch,), t_audio, np.int32),
        "label_len": np.full((args.batch,), u, np.int32),
    }

    trainer = Trainer(cfg)
    state = trainer.init_state(micro)
    step = trainer.train_step_fn()
    batch = {k: jnp.asarray(v[None]) for k, v in micro.items()}
    from efficientconformer_tpu.training.trainer import train_rng
    key = train_rng(0)

    t0 = time.time()
    state, metrics = step(state, batch, key)
    print(f"compile+first step: {time.time()-t0:.1f}s "
          f"loss={float(metrics['loss']):.3f}", flush=True)
    state, metrics = step(state, batch, key)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, batch, key)
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    audio_s = args.batch * args.seconds

    from efficientconformer_tpu.utils import flops as F

    step_flops = F.flops_of_fn(step, state, batch, key)
    util = F.mfu(step_flops, dt,
                 dtype="bfloat16" if args.dtype != "float32" else "float32")
    print(f"{args.config} batch={args.batch} x {args.seconds:.0f}s "
          f"dtype={args.dtype} pallas_bwd={args.pallas_bwd}:")
    print(f"  {dt*1e3:.1f} ms/step  |  {audio_s/dt:.0f} audio-s/s/chip  "
          f"| loss {loss:.3f}")
    print(f"  {F.format_flops(step_flops)}/step (matmul+conv, fwd+bwd) "
          f"-> {F.format_flops(step_flops/dt)}/s"
          + (f"  |  MFU {util*100:.1f}%" if util is not None else
             "  (MFU n/a: unknown chip peak)"))


if __name__ == "__main__":
    main()
