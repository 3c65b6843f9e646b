#!/usr/bin/env python
"""Streaming (chunked) inference latency on the real chip.

Measures steady-state per-chunk latency of the overlap-save streaming session
(efficientconformer_tpu/streaming.py) for B concurrent streams, and the
implied capacity in real-time streams per chip.

Usage:
  python scripts/streaming_bench.py [--config configs/EfficientConformerCTCSmall.json]
      [--batch 32] [--chunk-frames 16] [--history 64] [--lookahead 4] [--iters 50]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/EfficientConformerCTCSmall.json")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--chunk-frames", type=int, default=16)
    ap.add_argument("--history", type=int, default=64)
    ap.add_argument("--lookahead", type=int, default=4)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from efficientconformer_tpu import streaming as S
    from efficientconformer_tpu.config import load_config
    from efficientconformer_tpu.models.model_ctc import ModelCTC

    cfg = load_config(args.config)
    enc = dict(cfg.encoder_params)
    enc["compute_dtype"] = "bfloat16"
    model = ModelCTC(encoder_params=enc, vocab_size=cfg.vocab_size)

    sess = S.StreamingEncoderSession(
        encode_fn=None, encoder_params=enc, batch_size=args.batch,
        chunk_frames=args.chunk_frames, history_frames=args.history,
        lookahead_frames=args.lookahead,
    )
    chunk_samples = args.chunk_frames * sess.samples_per_frame
    chunk_seconds = chunk_samples / enc["sample_rate"]

    rng = np.random.default_rng(0)
    warm = jnp.asarray(
        rng.standard_normal((args.batch, sess.window_samples)), jnp.float32
    ) * 0.1
    x_len = jnp.full((args.batch,), sess.window_samples, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), warm[:1], x_len[:1])
    # argmax on device: the per-chunk fetch is (B, chunk) int32 token ids
    encode = jax.jit(
        lambda a, l: jnp.argmax(model.apply(variables, a, l, False)[0], -1)
    )
    sess.encode_fn = encode

    dec = S.StreamingCTC(sess)
    chunk = (rng.standard_normal((args.batch, chunk_samples)) * 0.1).astype(
        np.float32
    )
    # prime: fill history + compile
    t0 = time.time()
    while sess.emitted == 0:
        dec.push(chunk)
    print(f"first emission after {time.time()-t0:.1f}s (compile included)",
          flush=True)

    lat = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        dec.push(chunk)
        lat.append(time.perf_counter() - t0)
    lat = np.array(lat[2:])
    p50, p95 = np.percentile(lat, 50), np.percentile(lat, 95)
    cap = args.batch * chunk_seconds / p50
    print(f"{args.config} B={args.batch} chunk={chunk_seconds*1000:.0f} ms "
          f"window={sess.window_samples/enc['sample_rate']:.2f}s:")
    print(f"  per-chunk latency p50 {p50*1e3:.1f} ms  p95 {p95*1e3:.1f} ms")
    print(f"  -> {cap:.0f} concurrent real-time streams per chip "
          f"(at B={args.batch} lockstep batching)")


if __name__ == "__main__":
    main()
