#!/usr/bin/env python
"""Continuous-batching server throughput on the real chip.

Drives efficientconformer_tpu/serving.py at full occupancy with finite
streams arriving continuously (slot churn included): each stream is a 10 s
utterance; whenever a slot frees, the next queued stream is admitted. This
measures the *serving* capacity — admission, per-slot advance, retirement,
incremental decode — not just the lockstep encoder step.

Reports sustained audio-seconds/second (= concurrent real-time streams per
chip at 1x pacing) and per-tick latency.

Usage:
  python scripts/serving_bench.py [--config configs/EfficientConformerCTCSmall.json]
      [--slots 32] [--chunk-frames 16] [--history 64] [--lookahead 4]
      [--stream-seconds 10] [--streams 96]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/EfficientConformerCTCSmall.json")
    ap.add_argument("--slots", type=int, default=32)
    ap.add_argument("--chunk-frames", type=int, default=16)
    ap.add_argument("--history", type=int, default=64)
    ap.add_argument("--lookahead", type=int, default=4)
    ap.add_argument("--stream-seconds", type=float, default=10.0)
    ap.add_argument("--streams", type=int, default=96)
    ap.add_argument("--max-windows", type=int, default=None,
                    help="cap batched window steps per tick (bounds tick "
                         "latency; work-conserving)")
    ap.add_argument("--decoder", default="ctc", choices=["ctc", "transducer"],
                    help="transducer uses the config's decoder/joint params "
                         "and the on-device greedy decode state pool")
    args = ap.parse_args()

    import os

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from efficientconformer_tpu.config import load_config
    from efficientconformer_tpu.serving import StreamingServer

    cfg = load_config(args.config)
    enc = dict(cfg.encoder_params)
    enc["compute_dtype"] = "bfloat16"

    rng = np.random.default_rng(0)
    n = int(args.stream_seconds * enc["sample_rate"])
    probe = jnp.asarray(rng.standard_normal((1, 8000)), jnp.float32)
    decoder = None
    if args.decoder == "transducer":
        from efficientconformer_tpu.models.transducer import Transducer
        from efficientconformer_tpu.serving import TransducerGreedyDecoder

        model = Transducer(
            encoder_params=enc, decoder_params=cfg.decoder_params,
            joint_params=cfg.joint_params, vocab_size=cfg.vocab_size,
        )
        variables = model.init(
            jax.random.PRNGKey(0), probe, jnp.array([[1, 2, 3]]),
            jnp.array([8000]), jnp.array([3]), False,
        )
        encode = jax.jit(
            lambda a, l: model.apply(
                variables, a, l, False, method=Transducer.encode
            )
        )
        decoder = TransducerGreedyDecoder(model, variables)
    else:
        from efficientconformer_tpu.models.model_ctc import ModelCTC

        model = ModelCTC(encoder_params=enc, vocab_size=cfg.vocab_size)
        variables = model.init(
            jax.random.PRNGKey(0), probe, jnp.array([8000])
        )
        encode = jax.jit(
            lambda a, l: jnp.argmax(
                model.apply(variables, a, l, False)[0], -1
            )
        )

    srv = StreamingServer(
        encode, enc, num_slots=args.slots, chunk_frames=args.chunk_frames,
        history_frames=args.history, lookahead_frames=args.lookahead,
        decoder=decoder, max_windows_per_tick=args.max_windows,
    )
    print(
        f"slots={args.slots} window={srv.window_samples/enc['sample_rate']:.2f}s "
        f"chunk={srv.chunk_samples/enc['sample_rate']:.2f}s",
        flush=True,
    )

    # all streams share one audio buffer (content does not affect timing)
    audio = (rng.standard_normal(n) * 0.1).astype(np.float32)
    for i in range(args.streams):
        sid = f"s{i}"
        srv.submit(sid)
        srv.push(sid, audio)
        srv.end(sid, n)

    # warmup tick compiles the step program and fills first windows
    t0 = time.time()
    srv.tick()
    print(f"first tick (compile included): {time.time()-t0:.1f}s", flush=True)

    done = len(srv._results)
    t0 = time.time()
    lat = []
    while srv.active_streams or srv.queued_streams:
        t1 = time.perf_counter()
        srv.tick()
        lat.append(time.perf_counter() - t1)
    dt = time.time() - t0
    finished = len(srv._results) - done
    audio_s = finished * args.stream_seconds
    lat = np.array(lat)
    p50 = np.percentile(lat, 50) * 1e3
    p95 = np.percentile(lat, 95) * 1e3
    print(
        f"served {finished} streams x {args.stream_seconds:.0f}s in {dt:.1f}s"
        f" -> {audio_s/dt:.0f} audio-s/s (= concurrent 1x real-time streams"
        f" per chip, slot churn included)",
        flush=True,
    )
    print(f"tick latency p50 {p50:.1f} ms  p95 {p95:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
