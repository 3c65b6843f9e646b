#!/usr/bin/env python
"""Root-cause probe for the Large-config train-step batch anti-scaling
(NOTES_ROUND2.md #12: 1107 -> 996 audio-s/s going b=8 -> b=32 at 16 s).

The tunnelled chip exports no profiler traces, so this goes through the
compiler instead: for each batch size it times the step AND dumps XLA's own
compiled-program introspection — cost_analysis (flops/bytes accessed) and
memory_analysis (argument/output/temp/peak bytes) — plus the optimized HLO
to a file for diffing. If throughput falls while flops/audio-s stays flat,
the memory analysis shows whether HBM pressure (temp allocation growth,
rematerialisation) explains it.

Usage: python scripts/anti_scaling_probe.py [--config ...Large.json]
           [--seconds 16] [--batches 8 16 32] [--iters 6]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    default="configs/EfficientConformerCTCLarge.json")
    ap.add_argument("--seconds", type=float, default=16.0)
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--remat", nargs="?", const="full",
                    choices=["full", "dots"], default=None,
                    help="encoder_params['remat']: 'full' recomputes whole "
                         "blocks, 'dots' saves matmul outputs and recomputes "
                         "only elementwise chains")
    ap.add_argument("--hlo-dir", default="/tmp/antiscale_hlo")
    args = ap.parse_args()

    import os

    import numpy as np
    import jax
    import jax.numpy as jnp

    from efficientconformer_tpu.config import load_config
    from efficientconformer_tpu.training.trainer import Trainer
    from efficientconformer_tpu.utils import flops as F

    os.makedirs(args.hlo_dir, exist_ok=True)
    print("device:", jax.devices()[0].device_kind)

    for batch in args.batches:
        cfg = load_config(args.config)
        cfg.training_params["mixed_precision"] = True
        cfg.training_params["accumulated_steps"] = 1
        if args.remat:
            cfg.encoder_params["remat"] = (
                True if args.remat == "full" else args.remat
            )
        t_audio = int(16000 * args.seconds)
        u = max(int(args.seconds * 5.0), 4)
        rng = np.random.default_rng(0)
        micro = {
            "audio": (rng.standard_normal((batch, t_audio)) * 0.1
                      ).astype(np.float32),
            "labels": rng.integers(1, cfg.vocab_size, (batch, u)
                                   ).astype(np.int32),
            "audio_len": np.full((batch,), t_audio, np.int32),
            "label_len": np.full((batch,), u, np.int32),
        }
        trainer = Trainer(cfg)
        state = trainer.init_state(micro)
        step = trainer.train_step_fn()
        dbatch = {k: jnp.asarray(v[None]) for k, v in micro.items()}
        from efficientconformer_tpu.training.trainer import train_rng
        key = train_rng(0)

        # compiled-program introspection
        jitted = jax.jit(step)
        lowered = jitted.lower(state, dbatch, key)
        t0 = time.time()
        compiled = lowered.compile()
        compile_s = time.time() - t0
        mem = compiled.memory_analysis()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        hlo_path = os.path.join(args.hlo_dir, f"large_b{batch}.hlo")
        try:
            with open(hlo_path, "w") as f:
                f.write(compiled.as_text())
        except Exception as e:
            hlo_path = f"(as_text failed: {e!r})"

        state2, metrics = compiled(state, dbatch, key)
        float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state2, metrics = compiled(state2, dbatch, key)
        float(metrics["loss"])
        dt = (time.perf_counter() - t0) / args.iters

        audio_s = batch * args.seconds
        step_flops = F.flops_of_fn(step, state, dbatch, key)
        util = F.mfu(step_flops, dt)
        print(f"\n== batch {batch} x {args.seconds:.0f}s "
              f"(compile {compile_s:.0f}s) ==")
        print(f"  {dt*1e3:8.1f} ms/step  {audio_s/dt:7.0f} audio-s/s  "
              f"{step_flops/1e12:.2f} TF/step  "
              + (f"MFU {util*100:.1f}%" if util is not None else ""))
        if mem is not None:
            gb = 1 << 30
            for k in ("argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes", "generated_code_size_in_bytes"):
                v = getattr(mem, k, None)
                if v is not None:
                    print(f"  {k}: {v/gb:.3f} GiB")
        if cost:
            for k in ("flops", "bytes accessed"):
                if k in cost:
                    print(f"  xla {k}: {cost[k]:.3e}")
        print(f"  hlo: {hlo_path}")


if __name__ == "__main__":
    main()
