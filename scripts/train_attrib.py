#!/usr/bin/env python
"""Attribute the training step's wall time at HEAD by measured decomposition.

The tunnelled TPU backend exports no device traces (utils/profiling.py), so
attribution is done the only trustworthy way available: jit and time each
nested segment of the step separately on the real chip, then difference:

    frontend < encoder fwd < fwd(+loss) < fwd+bwd < full step (+optimizer)

Each segment is timed with the same async-dispatch pattern as train_bench.py.
Alongside, the compiled full step's XLA cost analysis (flops / bytes
accessed) is printed so the byte budget and the measured times can be checked
against the v5e roofs (197 TFLOP/s bf16, ~819 GB/s HBM).

Usage:
  python scripts/train_attrib.py [--config configs/EfficientConformerCTCLarge.json]
      [--batch 16] [--seconds 16] [--iters 10]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def timeit(fn, args, iters, fetch, rebind=None):
    """Dispatch fn iters times, fetch once; returns seconds/iter. ``rebind``
    maps (args, out) -> next args, needed when fn donates an argument."""
    out = fn(*args)
    if rebind:
        args = rebind(args, out)
    fetch(out)  # warm (compiled already by caller)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        if rebind:
            args = rebind(args, out)
    fetch(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/EfficientConformerCTCLarge.json")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=16.0)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--label-hz", type=float, default=5.0)
    ap.add_argument("--ab", action="store_true",
                    help="also measure the full step with the fused rel-pos "
                         "kernel forced off and with the accumulation scan "
                         "forced on (the two round-4 second-pass claims)")
    ap.add_argument("--full-only", action="store_true",
                    help="measure only the full train step (skip segments)")
    args = ap.parse_args()
    import os as _os

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from efficientconformer_tpu.config import load_config
    from efficientconformer_tpu.models import factory
    from efficientconformer_tpu.training.trainer import Trainer
    from efficientconformer_tpu.utils import flops as F

    cfg = load_config(args.config)
    cfg.training_params["mixed_precision"] = True
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
    model, loss_fn, tx = trainer.model, trainer.loss_fn, trainer.tx
    mb = {k: jnp.asarray(v) for k, v in micro.items()}
    batch = {k: v[None] for k, v in mb.items()}
    from efficientconformer_tpu.training.trainer import train_rng
    key = train_rng(0)

    def microbatch_loss(params, batch_stats, mbatch, rng_):
        rngs = {"dropout": jax.random.fold_in(rng_, 0),
                "augment": jax.random.fold_in(rng_, 1)}
        variables = {"params": params, "batch_stats": batch_stats}
        outputs, mutated = factory.apply_model(model, variables, mbatch, True,
                                               rngs=rngs)
        return loss_fn(outputs, mbatch), mutated.get("batch_stats", batch_stats)

    rows = []

    def bench(name, fn, fargs, fetch, rebind=None):
        fl = None
        try:
            fl = F.flops_of_fn(fn, *fargs)
        except Exception:
            pass
        t0 = time.time()
        out = fn(*fargs)
        if rebind:
            fargs = rebind(fargs, out)
        fetch(out)
        compile_s = time.time() - t0
        dt = timeit(fn, fargs, args.iters, fetch, rebind)
        rows.append((name, dt, fl))
        print(f"  {name:<34} {dt*1e3:8.2f} ms/iter  (compile {compile_s:.0f}s"
              + (f", {F.format_flops(fl)}" if fl else "") + ")", flush=True)
        return dt

    print(f"{args.config} b{args.batch} x {args.seconds:.0f}s, "
          f"mixed precision, iters={args.iters}")

    t_fwdbwd = t_fwd = t_opt = t_enc = t_encb = None
    from efficientconformer_tpu.models.model_ctc import ModelCTC
    is_ctc = isinstance(model, ModelCTC)

    if args.full_only:
        pass
    else:
        # --- 2. forward + backward, no optimizer (run BEFORE the donating
        # full step so `state`'s buffers are still live)
        vag = jax.jit(lambda p, bs, m, r: jax.value_and_grad(
            microbatch_loss, has_aux=True)(p, bs, m, r))
        def fetch_vag(out):
            float(out[0][0])
        t_fwdbwd = bench("fwd+bwd (value_and_grad)", vag,
                         (state.params, state.batch_stats, mb, key), fetch_vag)

        # --- 3. forward only (loss)
        fwd = jax.jit(microbatch_loss)
        def fetch_fwd(out):
            float(out[0])
        t_fwd = bench("fwd (+loss)", fwd,
                      (state.params, state.batch_stats, mb, key), fetch_fwd)

        # --- 4. optimizer update alone (on ones-like grads)
        grads = jax.tree.map(jnp.ones_like, state.params)
        import optax
        opt = jax.jit(lambda g, s, p: optax.apply_updates(
            p, tx.update(g, s, p)[0]))
        def fetch_opt(out):
            jax.block_until_ready(out)
            float(jax.tree.leaves(out)[0].reshape(-1)[0])
        t_opt = bench("optimizer update alone", opt,
                      (grads, state.opt_state, state.params), fetch_opt)

    # --- 5. encoder forward only (training=True, no loss)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if is_ctc and not args.full_only:
        enc = jax.jit(lambda v, a, al, r: model.apply(
            v, a, al, True,
            rngs={"dropout": jax.random.fold_in(r, 0),
                  "augment": jax.random.fold_in(r, 1)},
            mutable=["batch_stats"]))
        def fetch_enc(out):
            float(out[0][0].reshape(-1)[0])
        t_enc = bench("model fwd (encoder+head, no loss)", enc,
                      (variables, mb["audio"], mb["audio_len"], key), fetch_enc)

        # --- 6. encoder fwd+bwd with sum() loss (isolates CTC loss cost)
        def sum_loss(p, a, al, r):
            out, _ = model.apply(
                {"params": p, "batch_stats": state.batch_stats}, a, al, True,
                rngs={"dropout": jax.random.fold_in(r, 0),
                      "augment": jax.random.fold_in(r, 1)},
                mutable=["batch_stats"])
            return jnp.sum(out[0].astype(jnp.float32))
        encb = jax.jit(lambda p, a, al, r: jax.value_and_grad(sum_loss)(
            p, a, al, r))
        def fetch_encb(out):
            float(out[0])
        t_encb = bench("model fwd+bwd (sum loss, no CTC)", encb,
                       (state.params, mb["audio"], mb["audio_len"], key),
                       fetch_encb)

    # --- 1. full train step (HEAD path) — donates its state argument, so it
    # runs on a fresh copy and rebinds the returned state each iteration
    step = trainer.train_step_fn()
    def fetch_step(out):
        float(out[1]["loss"])
    def rebind_step(a, out):
        return (out[0], a[1], a[2])
    def fresh():
        return jax.tree.map(jnp.copy, state)
    t_full = bench("full train step", step, (fresh(), batch, key),
                   fetch_step, rebind_step)

    if args.ab:
        # A/B 1: fused rel-pos kernel OFF (XLA factorized path). The env is
        # read at trace time, so a freshly built step re-dispatches.
        _os.environ["ECF_FUSED_RELPOS"] = "0"
        step_nofused = trainer.train_step_fn()
        bench("full step, fused rel-pos OFF", step_nofused,
              (fresh(), batch, key), fetch_step, rebind_step)
        del _os.environ["ECF_FUSED_RELPOS"]
        # A/B 2: force the accumulation lax.scan at accum==1
        _os.environ["ECF_ACCUM_SCAN"] = "1"
        step_scan = trainer.train_step_fn()
        bench("full step, accum scan forced", step_scan,
              (fresh(), batch, key), fetch_step, rebind_step)
        del _os.environ["ECF_ACCUM_SCAN"]

    # --- XLA cost analysis of the full step
    try:
        comp = step.lower(state, batch, key).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        fl = ca.get("flops")
        by = ca.get("bytes accessed")
        print("\nXLA cost analysis (full step):")
        print(f"  flops          : {fl/1e12:.2f} TFLOP -> "
              f"{fl/t_full/1e12:.1f} TFLOP/s ({fl/t_full/197e12*100:.1f}% of "
              "197 bf16 peak)" if fl else "  flops: n/a")
        if by:
            print(f"  bytes accessed : {by/1e9:.2f} GB -> "
                  f"{by/t_full/1e9:.0f} GB/s ({by/t_full/819e9*100:.0f}% of "
                  "819 GB/s HBM roof)")
        for k in sorted(ca):
            if k.startswith("bytes accessed") and k != "bytes accessed":
                pass  # per-space detail too noisy
    except Exception as e:
        print("cost analysis unavailable:", e)

    if t_fwdbwd is not None:
        print("\ndifferences:")
        print(f"  optimizer (full - fwdbwd) : {(t_full - t_fwdbwd)*1e3:8.2f} ms"
              f"   (alone: {t_opt*1e3:.2f})")
        print(f"  backward (fwdbwd - fwd)   : {(t_fwdbwd - t_fwd)*1e3:8.2f} ms")
    if is_ctc and t_enc is not None:
        print(f"  CTC loss fwd (fwd - enc)  : {(t_fwd - t_enc)*1e3:8.2f} ms")
        print(f"  CTC loss fwd+bwd          : {(t_fwdbwd - t_encb)*1e3:8.2f} ms"
              " (vs sum-loss fwd+bwd)")
    audio_s = args.batch * args.seconds
    print(f"\n  {t_full*1e3:.1f} ms/step | {audio_s/t_full:.0f} audio-s/s")


if __name__ == "__main__":
    main()
