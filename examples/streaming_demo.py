#!/usr/bin/env python
"""Streaming recognition demo: feed audio chunk-by-chunk, print partial
hypotheses as they stabilise.

Uses the chunked streaming runtime (efficientconformer_tpu/streaming.py):
a device-resident overlap-save window over the unmodified jitted encoder,
with incremental greedy CTC decoding. With no checkpoint/audio given it
builds a tiny synthetic setup (random weights — the transcript is
meaningless, the mechanics are real).

  python examples/streaming_demo.py [--config configs/EfficientConformerCTCSmall.json]
      [--checkpoint callbacks/.../checkpoints_10.ckpt] [--wav path.wav]
      [--chunk-ms 640] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/EfficientConformerCTCSmall.json")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--wav", default=None)
    ap.add_argument("--chunk-ms", type=int, default=640)
    ap.add_argument("--history", type=int, default=64)
    ap.add_argument("--lookahead", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import numpy as np
    import jax
    import jax.numpy as jnp

    from efficientconformer_tpu import streaming as S
    from efficientconformer_tpu.config import load_config
    from efficientconformer_tpu.models.model_ctc import ModelCTC

    cfg = load_config(args.config)
    model = ModelCTC(encoder_params=cfg.encoder_params, vocab_size=cfg.vocab_size)

    if args.wav is not None:
        from efficientconformer_tpu.data.audio_io import load_audio

        samples, _sr = load_audio(args.wav)
        audio = np.asarray(samples, np.float32)[None]
    else:
        rng = np.random.default_rng(0)
        audio = (rng.standard_normal((1, 16000 * 12)) * 0.1).astype(np.float32)
        print("no --wav given: streaming 12 s of synthetic noise")

    x_len = np.array([audio.shape[1]])
    init = model.init(
        jax.random.PRNGKey(0), jnp.asarray(audio[:, :16000]),
        jnp.asarray([16000]),
    )
    if args.checkpoint is not None:
        from flax import serialization

        with open(args.checkpoint, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        init = {"params": raw["params"],
                "batch_stats": raw.get("batch_stats") or {}}
        print(f"restored {args.checkpoint}")

    tokenizer = None
    tok_path = cfg.tokenizer_params.get("tokenizer_path")
    if tok_path and os.path.exists(tok_path):
        from efficientconformer_tpu.data.tokenizer import BpeTokenizer

        tokenizer = BpeTokenizer.load(tok_path)

    encode = jax.jit(
        lambda a, l: jnp.argmax(model.apply(init, a, l, False)[0], -1)
    )
    sess = S.StreamingEncoderSession(
        encode_fn=encode, encoder_params=cfg.encoder_params, batch_size=1,
        history_frames=args.history, lookahead_frames=args.lookahead,
    )
    dec = S.StreamingCTC(sess)

    chunk = int(16000 * args.chunk_ms / 1000)
    for pos in range(0, audio.shape[1], chunk):
        dec.push(audio[:, pos : pos + chunk])
        text = (
            tokenizer.decode(dec.tokens[0]) if tokenizer
            else " ".join(map(str, dec.tokens[0]))
        )
        print(f"[{(pos + chunk) / 16000:5.2f}s] {text!r}")
    dec.finish(x_len)
    text = (
        tokenizer.decode(dec.tokens[0]) if tokenizer
        else " ".join(map(str, dec.tokens[0]))
    )
    print(f"[final ] {text!r}")


if __name__ == "__main__":
    main()
