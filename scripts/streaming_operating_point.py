"""Quantify a streaming operating point for the shipped full-context configs.

The shipped EfficientConformer configs are full-context (left = right =
max_pos_encoding, reference models/encoders.py:68 + attentions.py:1377-1403),
so bounded-latency streaming is necessarily approximate: every output frame
depends on the whole utterance. This script measures HOW approximate, at the
token level, across a (history, lookahead) grid on the real
EfficientConformerCTCSmall geometry:

  * truth  = batch greedy CTC decode of the full (padded) utterance
  * stream = StreamingCTC over the same audio at the grid point
  * token disagreement = Levenshtein(stream tokens, truth tokens) / |truth|
  * frame disagreement = argmax mismatch rate over valid frames

and prints a table plus the recommended operating point (the smallest-latency
setting whose token disagreement is <= --target). Algorithmic emission delay
is (chunk + lookahead) output frames x 80 ms (total_stride 8 x 10 ms hop for
the shipped stride schedule); per-window wall time is measured on the active
backend.

Weights default to a fixed-seed random init (structured multi-tone input keeps
the decode non-degenerate); random weights lack a trained model's confident
peaks, so measured disagreement is a CONSERVATIVE (pessimistic) bound for a
trained checkpoint. --ckpt imports a reference torch checkpoint instead.

Usage:
  python scripts/streaming_operating_point.py [--config configs/...json]
      [--utts 8] [--seconds 12] [--chunk 16]
      [--history 32,64,128] [--lookahead 4,8,16,32] [--target 0.05]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def structured_audio(rng, seconds: int, sr: int = 16000) -> np.ndarray:
    """Synthetic but structured audio: random tone segments + noise floor,
    giving the (random-weight) encoder distinct, time-varying frames."""
    t = np.arange(int(seconds * sr)) / sr
    x = 0.02 * rng.standard_normal(t.shape)
    pos = 0.0
    while pos < seconds:
        dur = float(rng.uniform(0.08, 0.4))
        f = float(rng.uniform(80, 4000))
        seg = (t >= pos) & (t < pos + dur)
        x[seg] += float(rng.uniform(0.1, 0.5)) * np.sin(
            2 * np.pi * f * t[seg] + rng.uniform(0, 6.28)
        )
        pos += dur + float(rng.uniform(0.0, 0.15))
    return x.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/EfficientConformerCTCSmall.json")
    ap.add_argument("--ckpt", default=None, help="reference torch ckpt to import")
    ap.add_argument("--native-ckpt", default=None,
                    help="checkpoint saved by this framework (e.g. "
                         "scripts/overfit_ckpt.py) — the TRAINED-regime run")
    ap.add_argument("--utts", type=int, default=8)
    ap.add_argument("--seconds", type=int, default=12)
    ap.add_argument("--chunk", type=int, default=16, help="chunk (output frames)")
    ap.add_argument("--history", default="32,64,128")
    ap.add_argument("--lookahead", default="4,8,16,32")
    ap.add_argument("--target", type=float, default=0.05)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from efficientconformer_tpu import streaming as S
    from efficientconformer_tpu.config import load_config, encoder_output_frames
    from efficientconformer_tpu.models.model_ctc import ModelCTC, ctc_greedy_collapse
    from efficientconformer_tpu.utils.metrics import _edit_distance

    cfg = load_config(args.config)
    enc = cfg.encoder_params
    model = ModelCTC(encoder_params=enc, vocab_size=cfg.vocab_size)

    rng = np.random.default_rng(0)
    b, t = args.utts, args.seconds * enc["sample_rate"]
    audio = np.stack([structured_audio(rng, args.seconds) for _ in range(b)])
    x_len = np.full((b,), t, np.int64)

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(audio[:1]), jnp.asarray(x_len[:1])
    )
    if args.ckpt:
        from efficientconformer_tpu.utils import torch_compat

        variables = torch_compat.load_reference_checkpoint(
            args.ckpt, variables, cfg
        )
    elif args.native_ckpt:
        from efficientconformer_tpu.training import checkpoint

        template = {"params": variables["params"],
                    "batch_stats": variables.get("batch_stats", {}),
                    "opt_state": None, "step": jnp.zeros((), jnp.int32)}
        data = checkpoint._restore(args.native_ckpt, template)
        variables = {"params": data["params"],
                     "batch_stats": data["batch_stats"]}
    encode = jax.jit(lambda a, l: model.apply(variables, a, l, False))

    # ---- truth: padded batch greedy decode (the bucketed-loader pipeline)
    stride = S.total_stride(enc)
    hop_ms = enc["hop_length_ms"]
    pad = np.zeros((b, 80000), np.float32)
    logits, logits_len, _ = encode(
        jnp.asarray(np.concatenate([audio, pad], axis=1)), jnp.asarray(x_len)
    )
    caps = [encoder_output_frames(enc, int(l)) for l in x_len]
    preds = jnp.argmax(logits, axis=-1)
    toks, n_tok = ctc_greedy_collapse(preds, jnp.asarray(caps))
    truth = [
        np.asarray(toks)[i, : int(n_tok[i])].tolist() for i in range(b)
    ]
    n_truth = sum(len(s) for s in truth)
    print(f"# {args.config}: {b} x {args.seconds}s utts, "
          f"{sum(caps)} valid frames, {n_truth} truth tokens "
          f"(weights: "
          f"{'ckpt' if args.ckpt or args.native_ckpt else 'random-init seed 0'})")
    assert n_truth >= 10 * b, "degenerate decode; raise input structure"

    frames_truth = np.asarray(preds)

    hist_grid = [int(x) for x in args.history.split(",")]
    look_grid = [int(x) for x in args.lookahead.split(",")]
    frame_ms = stride * hop_ms
    print(f"# chunk {args.chunk} frames ({args.chunk * frame_ms} ms); emission "
          f"delay = (chunk + lookahead) x {frame_ms} ms")
    print(f"{'history':>8} {'lookahead':>9} {'delay_ms':>8} {'tok_dis':>8} "
          f"{'frame_dis':>9} {'ms/window':>9}")

    results = []
    for history in hist_grid:
        for look in look_grid:
            sess = S.StreamingEncoderSession(
                encode_fn=encode, encoder_params=enc, batch_size=b,
                chunk_frames=args.chunk, history_frames=history,
                lookahead_frames=look,
            )
            dec = S.StreamingCTC(sess)
            t0 = time.perf_counter()
            ems_frames = []
            step = sess.chunk_samples
            n_windows = 0
            for s0 in range(0, t, step):
                got = sess.push(audio[:, s0 : s0 + step])
                dec._consume(got)
                ems_frames += [em for em in got]
                n_windows += len(got)
            got = sess.finish(x_len)
            dec._consume(got, caps)
            ems_frames += got
            n_windows += len(got)
            wall = time.perf_counter() - t0

            # token-level disagreement vs the batch decode
            dist = sum(
                _edit_distance(
                    [str(x) for x in truth[i]], [str(x) for x in dec.tokens[i]]
                )
                for i in range(b)
            )
            tok_dis = dist / max(n_truth, 1)
            # frame-level argmax disagreement over valid frames
            n_bad = n_all = 0
            stream_ids = np.concatenate(
                [np.asarray(jnp.argmax(em.frames[:, em.first : em.last], -1))
                 for em in ems_frames], axis=1,
            )
            for i in range(b):
                c = caps[i]
                n_bad += int((stream_ids[i, :c] != frames_truth[i, :c]).sum())
                n_all += c
            results.append(dict(
                history=history, lookahead=look,
                delay_ms=(args.chunk + look) * frame_ms,
                token_disagreement=round(tok_dis, 4),
                frame_disagreement=round(n_bad / n_all, 4),
                ms_per_window=round(1e3 * wall / max(n_windows, 1), 1),
            ))
            r = results[-1]
            print(f"{history:>8} {look:>9} {r['delay_ms']:>8} "
                  f"{r['token_disagreement']:>8.4f} "
                  f"{r['frame_disagreement']:>9.4f} {r['ms_per_window']:>9}")

    ok = [r for r in results if r["token_disagreement"] <= args.target]
    if ok:
        best = min(ok, key=lambda r: (r["delay_ms"], -r["history"]))
        print(f"\nrecommended (token disagreement <= {args.target:.0%} at "
              f"minimum delay): history={best['history']} "
              f"lookahead={best['lookahead']} -> delay {best['delay_ms']} ms, "
              f"disagreement {best['token_disagreement']:.2%}")
    else:
        print(f"\nno grid point reaches token disagreement <= {args.target:.0%}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
