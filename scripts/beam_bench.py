#!/usr/bin/env python
"""Transducer beam-search wall-clock: on-device vs host-orchestrated.

Runs EfficientConformerTransducerMedium (random weights) on the real chip,
B utterances x SECONDS s, beam width W. Timing fetches results to host
(the tunnel's block_until_ready does not synchronise — NOTES_ROUND1.md).

Usage: python scripts/beam_bench.py [--batch 16] [--beam 16] [--seconds 10]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--beam", type=int, default=16)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--config", default="configs/EfficientConformerTransducerMedium.json")
    p.add_argument("--skip-host", action="store_true")
    p.add_argument("--ngram-entries", type=int, default=0,
                   help="synthesize a LibriSpeech-shaped 6-gram ARPA with "
                        "~this many entries (tests/ngram_synth.py) and run "
                        "the beam with on-device kenlm-style rescoring "
                        "(ngram_alpha 0.3 / beta 1, the shipped transducer "
                        "decoding_params); reports ARPA parse + CSR pack "
                        "times and device table bytes")
    p.add_argument("--blank-bias", type=float, default=0.0,
                   help="add to the joint's blank logit bias. Random weights "
                        "emit max_tokens on every frame (length normalisation "
                        "favours longer hyps at uniform logits) — the "
                        "adversarial worst case for the beam. A positive bias "
                        "emulates a trained model's blank-dominant emission "
                        "profile (the realistic case).")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from efficientconformer_tpu.config import load_config
    from efficientconformer_tpu.models import factory
    from efficientconformer_tpu.decoding.rnnt_beam import beam_search_batched
    from efficientconformer_tpu.decoding.rnnt_beam_device import beam_search_device

    config = load_config(args.config)
    config.encoder_params.pop("compute_dtype", None)
    model, _ = factory.create_model(config)

    t = int(16000 * args.seconds)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.batch, t)).astype(np.float32) * 0.1)
    x_len = jnp.full((args.batch,), t, jnp.int32)

    init_rng = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1),
                "augment": jax.random.PRNGKey(2)}
    y = jnp.zeros((args.batch, 8), jnp.int32)
    y_len = jnp.full((args.batch,), 8, jnp.int32)
    variables = model.init(init_rng, x[:, :16000], y, x_len // args.seconds, y_len, False)
    if args.blank_bias:
        variables = jax.tree_util.tree_map_with_path(
            lambda path, v: v.at[0].add(args.blank_bias)
            if any(getattr(k, "key", None) == "linear_joint" for k in path)
            and getattr(path[-1], "key", None) == "bias" else v,
            variables,
        )
    print(f"model ready; B={args.batch} W={args.beam} audio={args.seconds}s",
          flush=True)

    ng_kwargs = {}
    if args.ngram_entries:
        import tempfile

        sys.path.insert(0, "tests")
        from ngram_synth import synth_arpa
        from efficientconformer_tpu.decoding.ngram import ArpaLM
        from efficientconformer_tpu.decoding.ngram_device import DeviceNgram

        vocab = config.vocab_size
        n = args.ngram_entries
        counts = (0, min(n // 5, vocab * vocab), n // 4, n // 4, n // 4,
                  n - n // 4 * 3 - min(n // 5, vocab * vocab))
        path = tempfile.mktemp(suffix=".arpa")
        t0 = time.time()
        written = synth_arpa(path, vocab=vocab, order=6, counts=counts)
        t_synth = time.time() - t0
        total = sum(written.values())
        t0 = time.time()
        host_lm = ArpaLM(path, ngram_offset=100)
        t_parse = time.time() - t0
        t0 = time.time()
        dev_lm = DeviceNgram(host_lm, vocab_size=vocab)
        t_pack = time.time() - t0
        nbytes = sum(
            int(np.asarray(a).nbytes)
            for a in (dev_lm.score_starts, dev_lm.score_wids,
                      dev_lm.score_vals, dev_lm.trans_starts,
                      dev_lm.trans_wids, dev_lm.trans_vals, dev_lm.backoff,
                      dev_lm.suffix, dev_lm.length, dev_lm.token_wid)
        )
        print(f"ngram: {total} entries (order 6, vocab {vocab}); synth "
              f"{t_synth:.1f}s, ARPA parse {t_parse:.1f}s, CSR pack "
              f"{t_pack:.1f}s, device tables {nbytes/1e6:.1f} MB", flush=True)
        ng_kwargs = dict(ngram=dev_lm, ngram_alpha=0.3, ngram_beta=1.0)

    def run_device():
        return beam_search_device(
            model, variables, x, x_len, beam_size=args.beam, max_tokens=256,
            **ng_kwargs
        )

    # compile
    t0 = time.time()
    out = run_device()
    print(f"device beam compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = run_device()
    dt_dev = time.time() - t0
    rtf_dev = args.batch * args.seconds / dt_dev
    print(f"device beam: {dt_dev:.3f}s for {args.batch}x{args.seconds}s "
          f"({rtf_dev:.0f}x RT), lens={[len(s) for s in out[:4]]}", flush=True)

    if not args.skip_host:
        host_ng = (dict(ngram=host_lm, ngram_alpha=0.3, ngram_beta=1.0)
                   if args.ngram_entries else {})
        t0 = time.time()
        out_h = beam_search_batched(
            model, variables, x, x_len, beam_size=args.beam, **host_ng
        )
        dt_host = time.time() - t0
        # second run (jits cached)
        t0 = time.time()
        out_h = beam_search_batched(
            model, variables, x, x_len, beam_size=args.beam, **host_ng
        )
        dt_host = time.time() - t0
        rtf_host = args.batch * args.seconds / dt_host
        print(f"host beam: {dt_host:.3f}s ({rtf_host:.0f}x RT), "
              f"lens={[len(s) for s in out_h[:4]]}", flush=True)
        print(f"speedup: {dt_host/dt_dev:.1f}x", flush=True)


if __name__ == "__main__":
    main()
