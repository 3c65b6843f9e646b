#!/usr/bin/env python
"""Inference-headline sweep (VERDICT r4 item 2): batched greedy CTC decode
RT factor across batch size, utterance length, and the fused rel-pos kernel
A/B, plus the inference MFU/roof numbers.

Usage: python scripts/infer_sweep.py [--batches 32 64 128] [--seconds 10 16]
           [--config configs/EfficientConformerCTCSmall.json] [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    default="configs/EfficientConformerCTCSmall.json")
    ap.add_argument("--batches", type=int, nargs="+", default=[32, 64, 128])
    ap.add_argument("--seconds", type=float, nargs="+", default=[10.0])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--ab", action="store_true",
                    help="A/B the fused rel-pos kernel off per point")
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
    from efficientconformer_tpu.models.model_ctc import (
        ModelCTC, ctc_greedy_collapse,
    )
    from efficientconformer_tpu.utils import flops as F

    cfg = load_config(args.config)
    enc_params = dict(cfg.encoder_params)
    enc_params["compute_dtype"] = "bfloat16"
    model = ModelCTC(encoder_params=enc_params, vocab_size=cfg.vocab_size)

    rng = np.random.default_rng(0)
    variables = None

    def run(batch, seconds, fused):
        nonlocal variables
        t_audio = int(16000 * seconds)
        audio = jnp.asarray(
            rng.standard_normal((batch, t_audio)), jnp.float32) * 0.1
        audio_len = jnp.full((batch,), t_audio, jnp.int32)
        if variables is None:
            variables = model.init(
                jax.random.PRNGKey(0), audio[:1], audio_len[:1])

        if fused is not None:
            os.environ["ECF_FUSED_RELPOS"] = "1" if fused else "0"

        @jax.jit
        def decode(variables, audio, audio_len):
            logits, logits_len, _ = model.apply(
                variables, audio, audio_len, False)
            preds = jnp.argmax(logits, axis=-1)
            return ctc_greedy_collapse(preds, logits_len)

        fl = F.flops_of_fn(decode, variables, audio, audio_len)
        tok, n = decode(variables, audio, audio_len)
        np.asarray(tok), np.asarray(n)
        for _ in range(3):
            tok, n = decode(variables, audio, audio_len)
        np.asarray(tok), np.asarray(n)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            tok, n = decode(variables, audio, audio_len)
        np.asarray(tok), np.asarray(n)
        dt = (time.perf_counter() - t0) / args.iters
        os.environ.pop("ECF_FUSED_RELPOS", None)
        rt = batch * seconds / dt
        mfu = F.mfu(fl, dt, dtype="bfloat16")
        tag = {None: "auto", True: "fused", False: "xla  "}[fused]
        print(f"  b{batch:<4d} {seconds:4.0f}s  {tag}  {dt*1e3:7.2f} ms "
              f"-> {rt:9.0f}x RT   ({F.format_flops(fl)}/call, "
              f"MFU {100*(mfu or 0):.1f}%)", flush=True)
        return rt

    print(f"{args.config}, greedy decode, iters={args.iters}")
    for seconds in args.seconds:
        for batch in args.batches:
            run(batch, seconds, None)
            if args.ab:
                run(batch, seconds, False)


if __name__ == "__main__":
    main()
