#!/usr/bin/env python
"""Continuous-batching server demo: several streams with different lengths
and staggered arrivals share one slot pool; tokens print incrementally per
stream as they are emitted, finals as streams drain.

Uses efficientconformer_tpu/serving.py (StreamingServer): ONE compiled
window-step program serves every stream; admission and retirement touch a
single device row each. With no checkpoint given it builds a tiny synthetic
setup (random weights — transcripts are meaningless, the mechanics are real).

  python examples/serving_demo.py [--config configs/EfficientConformerCTCSmall.json]
      [--slots 4] [--streams 6] [--cpu] [--tiny]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


TINY_ENC = dict(
    arch="Conformer", num_blocks=3, dim_model=[16, 24], num_heads=2,
    kernel_size=[7, 7], ff_ratio=2, Pdrop=0.0, conv_stride=2, att_stride=1,
    strided_blocks=[1], expand_blocks=[1], att_group_size=[3, 1],
    relative_pos_enc=True, max_pos_encoding=512, causal=True, left_context=8,
    subsampling_module="Conv2d", subsampling_layers=1,
    subsampling_filters=[16], subsampling_kernel_size=3,
    subsampling_norm="batch", subsampling_act="swish", sample_rate=16000,
    win_length_ms=25, hop_length_ms=10, n_fft=512, n_mels=80,
    normalize=False, mean=0.0, std=1.0, spec_augment=False,
    mF=1, F=10, mT=2, pS=0.05,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/EfficientConformerCTCSmall.json")
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--streams", type=int, default=6)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny causal config instead of the shipped one "
                         "(fast on CPU)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import numpy as np
    import jax
    import jax.numpy as jnp

    from efficientconformer_tpu.config import load_config
    from efficientconformer_tpu.models.model_ctc import ModelCTC
    from efficientconformer_tpu.serving import StreamingServer

    if args.tiny:
        enc, vocab = dict(TINY_ENC), 32
    else:
        cfg = load_config(args.config)
        enc, vocab = dict(cfg.encoder_params), cfg.vocab_size
        enc["compute_dtype"] = "bfloat16"

    model = ModelCTC(encoder_params=enc, vocab_size=vocab)
    rng = np.random.default_rng(0)
    probe = jnp.asarray(rng.standard_normal((1, 8000)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), probe, jnp.array([8000]))
    encode = jax.jit(
        lambda a, l: jnp.argmax(model.apply(variables, a, l, False)[0], -1)
    )

    srv = StreamingServer(
        encode, enc, num_slots=args.slots,
        chunk_frames=9 if args.tiny else 16,
        lookahead_frames=2 if args.tiny else 4,
        history_frames=None if args.tiny else 64,
    )
    print(f"server: {args.slots} slots, window "
          f"{srv.window_samples / enc['sample_rate']:.2f}s, chunk "
          f"{srv.chunk_samples / enc['sample_rate']:.2f}s")

    # synthetic client traffic: staggered arrivals, different lengths
    base = srv.window_samples + 2 * srv.chunk_samples
    streams = {
        f"caller-{i}": (rng.standard_normal(
            base + int(rng.integers(0, 4)) * srv.chunk_samples
        ) * 0.1).astype(np.float32)
        for i in range(args.streams)
    }
    pos = {sid: 0 for sid in streams}
    arrived = {}
    t = 0
    while len(arrived) < len(streams) or any(
        pos[s] < streams[s].size for s in arrived
    ) or srv.active_streams or srv.queued_streams:
        # every "tick" two new callers may arrive and every active caller
        # pushes one chunk of audio
        for sid in list(streams):
            if sid not in arrived and len(arrived) <= t:
                srv.submit(sid)
                arrived[sid] = True
                print(f"[t={t}] {sid} connected "
                      f"({streams[sid].size / enc['sample_rate']:.1f}s)")
        for sid in arrived:
            a = streams[sid]
            if pos[sid] < a.size:
                nxt = min(pos[sid] + srv.chunk_samples, a.size)
                srv.push(sid, a[pos[sid]: nxt])
                pos[sid] = nxt
                if pos[sid] >= a.size:
                    srv.end(sid)
                    print(f"[t={t}] {sid} hung up")
        ev = srv.tick()
        for sid, toks in ev.emitted.items():
            print(f"[t={t}] {sid} partial: +{toks}")
        for sid, toks in ev.finished.items():
            print(f"[t={t}] {sid} FINAL ({len(toks)} tokens): {toks}")
        t += 1
        if t > 500:
            raise RuntimeError("demo did not drain")
    print("all streams served")


if __name__ == "__main__":
    main()
