#!/usr/bin/env python
"""Benchmark: batched greedy CTC inference throughput on the flagship
EfficientConformerCTCSmall, real hardware (TPU when available).

Measures end-to-end greedy decoding — raw waveform in, collapsed token ids out,
frontend + encoder + argmax + collapse all on device — on synthetic 10 s
utterances at batch 32, the same workload class as the reference's
``--mode eval_time`` on LibriSpeech dev-clean (reference model.py:570-625).

Metric: real-time factor per chip (audio-seconds processed per wall-second).
``vs_baseline`` normalises by an ASSUMED reference throughput of 60x real-time
for the PyTorch implementation's batched greedy CTC-Small path on an A100
(the reference publishes no RTF numbers — BASELINE.md; this constant makes the
ratio stable across rounds, not a measured baseline).

Prints exactly one JSON line.
"""

import json
import time

import numpy as np

ASSUMED_REFERENCE_RTF = 60.0
BATCH = 32
SECONDS = 10.0
WARMUP = 3
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    from efficientconformer_tpu.config import load_config
    from efficientconformer_tpu.models.model_ctc import ModelCTC, ctc_greedy_collapse

    cfg = load_config("configs/EfficientConformerCTCSmall.json")
    enc_params = dict(cfg.encoder_params)
    enc_params["compute_dtype"] = "bfloat16"
    model = ModelCTC(encoder_params=enc_params, vocab_size=cfg.vocab_size)

    t_audio = int(16000 * SECONDS)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((BATCH, t_audio)), jnp.float32) * 0.1
    audio_len = jnp.full((BATCH,), t_audio, jnp.int32)

    variables = model.init(jax.random.PRNGKey(0), audio[:1], audio_len[:1])

    @jax.jit
    def decode(variables, audio, audio_len):
        logits, logits_len, _ = model.apply(variables, audio, audio_len, False)
        preds = jnp.argmax(logits, axis=-1)
        return ctc_greedy_collapse(preds, logits_len)

    # NB: block_until_ready does not synchronise on the tunnelled TPU platform,
    # so timing brackets a host fetch. All iterations are dispatched
    # asynchronously and only the last result is fetched: the device executes
    # enqueued programs in order, so this amortises the tunnel's ~26 ms RPC
    # floor across the batch instead of paying it per iteration.
    for _ in range(WARMUP):
        tok, n = decode(variables, audio, audio_len)
        np.asarray(tok), np.asarray(n)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        tok, n = decode(variables, audio, audio_len)
    np.asarray(tok), np.asarray(n)
    dt = time.perf_counter() - t0

    audio_seconds = BATCH * SECONDS * ITERS
    rtf = audio_seconds / dt
    print(
        json.dumps(
            {
                "metric": "ctc_small_batched_greedy_rtf_per_chip",
                "value": round(rtf, 2),
                "unit": "audio_seconds_per_wall_second",
                "vs_baseline": round(rtf / ASSUMED_REFERENCE_RTF, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
