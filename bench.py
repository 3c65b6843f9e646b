#!/usr/bin/env python
"""Benchmark: batched greedy CTC inference throughput on the flagship
EfficientConformerCTCSmall, real hardware (TPU when available).

Measures end-to-end greedy decoding — raw waveform in, collapsed token ids out,
frontend + encoder + argmax + collapse all on device — on synthetic 10 s
utterances at batch 128, the same workload class as the reference's
``--mode eval_time`` on LibriSpeech dev-clean (reference model.py:570-625).
Batch 128 is the measured-best throughput operating point of the round-5
batch sweep (scripts/infer_sweep.py: 31k/37k/54k RT at b32/b64/b128 — the
small-batch program is launch-latency-bound, ~6 ms fixed cost per call);
rounds 1-4 reported b32, so cross-round comparisons should use the b32 row
in BENCH_DETAILS.md.

Metric: real-time factor per chip (audio-seconds processed per wall-second).
``vs_baseline`` is MEASURED: the reference PyTorch implementation
(/root/reference, weight-identical model via utils/torch_compat) runs the same
workload on this host's CPU — the only hardware the reference can run on in
this image — and the ratio is TPU-chip vs reference-on-host-CPU. The published
reference hardware (4x RTX 2080 Ti) is unavailable; BENCH_DETAILS.md records
the raw numbers for both sides plus secondary benchmarks
(``python bench.py --details``).

Prints exactly one JSON line.
"""

import argparse
import json
import sys
import time

import numpy as np

BATCH = 128
SECONDS = 10.0
WARMUP = 3
ITERS = 20


def build_model():
    from efficientconformer_tpu.config import load_config
    from efficientconformer_tpu.models.model_ctc import ModelCTC

    cfg = load_config("configs/EfficientConformerCTCSmall.json")
    enc_params = dict(cfg.encoder_params)
    enc_params["compute_dtype"] = "bfloat16"
    model = ModelCTC(encoder_params=enc_params, vocab_size=cfg.vocab_size)
    return cfg, enc_params, model


def bench_tpu_ctc_greedy(report: dict | None = None):
    import jax
    import jax.numpy as jnp

    from efficientconformer_tpu.models.model_ctc import ctc_greedy_collapse

    cfg, enc_params, model = build_model()
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

    if report is not None:
        from efficientconformer_tpu.utils import flops as F

        report["flops_per_call"] = F.flops_of_fn(
            decode, variables, audio, audio_len)

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
    return BATCH * SECONDS * ITERS / dt


def bench_train_step(config_name: str, batch: int, seconds: float,
                     iters: int = 8) -> dict:
    """One jitted train step (fwd+loss+bwd+update) for a shipped config on
    synthetic data: ms/step, audio-s/s, exact matmul+conv FLOPs, MFU."""
    import jax
    import jax.numpy as jnp

    from efficientconformer_tpu.config import load_config
    from efficientconformer_tpu.training.trainer import Trainer
    from efficientconformer_tpu.utils import flops as F

    cfg = load_config(f"configs/{config_name}.json")
    cfg.training_params["mixed_precision"] = True
    cfg.training_params["accumulated_steps"] = 1

    t_audio = int(16000 * seconds)
    u = max(int(seconds * 5.0), 4)
    rng = np.random.default_rng(0)
    micro = {
        "audio": (rng.standard_normal((batch, t_audio)) * 0.1).astype(np.float32),
        "labels": rng.integers(1, cfg.vocab_size, (batch, u)).astype(np.int32),
        "audio_len": np.full((batch,), t_audio, np.int32),
        "label_len": np.full((batch,), u, np.int32),
    }
    trainer = Trainer(cfg)
    state = trainer.init_state(micro)
    step = trainer.train_step_fn()
    dbatch = {k: jnp.asarray(v[None]) for k, v in micro.items()}
    from efficientconformer_tpu.training.trainer import train_rng
    key = train_rng(0)

    state, metrics = step(state, dbatch, key)   # compile
    float(metrics["loss"])
    state, metrics = step(state, dbatch, key)   # warm
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, dbatch, key)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters

    step_flops = F.flops_of_fn(step, state, dbatch, key)
    return {
        "ms_per_step": dt * 1e3,
        "audio_s_per_s": batch * seconds / dt,
        "tflops_per_step": step_flops / 1e12,
        "mfu": F.mfu(step_flops, dt, dtype="bfloat16"),
    }


BASELINE_CACHE = "bench_baseline.json"


def bench_reference_torch_cpu(iters: int = 2, use_cache: bool = True):
    """The reference implementation's greedy CTC path (encoder forward +
    argmax + host collapse, reference model_ctc.py:90-136) on host CPU.

    The measurement (~20 min: torch on this host's single vCPU) is cached in
    ``bench_baseline.json`` keyed by the workload shape — the reference's code
    never changes, so re-measuring every round only burns driver wall-clock.
    Delete the file or pass --remeasure-baseline to re-measure."""
    key = f"ctc_small_greedy_b{BATCH}x{SECONDS:.0f}s_host_cpu"
    if use_cache:
        try:
            with open(BASELINE_CACHE) as fh:
                cached = json.load(fh)
            if key in cached:
                return cached[key]["rtf"]
        except (OSError, ValueError):
            pass
    rtf = _measure_reference_torch_cpu(iters)
    if rtf is not None:
        try:
            with open(BASELINE_CACHE) as fh:
                cached = json.load(fh)
        except (OSError, ValueError):
            cached = {}
        cached[key] = {
            "rtf": round(rtf, 2),
            "what": "reference PyTorch greedy CTC (encoder fwd + argmax + "
                    "host collapse), /root/reference, this host's CPU",
            "iters": iters,
        }
        with open(BASELINE_CACHE, "w") as fh:
            json.dump(cached, fh, indent=1)
    return rtf


def _measure_reference_torch_cpu(iters: int = 2):
    sys.path.insert(0, "tests")
    try:
        import torch
        from torch_ref import import_reference
    except ImportError:
        return None
    ref = import_reference()
    cfg, enc_params, _ = build_model()
    ep = dict(cfg.encoder_params)
    ep["vocab_size"] = cfg.vocab_size
    torch.manual_seed(0)
    enc = ref.encoders.ConformerEncoder(ep).eval()
    fc = torch.nn.Linear(cfg.encoder_out_dim, cfg.vocab_size).eval()
    t_audio = int(16000 * SECONDS)
    rng = np.random.default_rng(0)
    x = torch.from_numpy(
        (rng.standard_normal((BATCH, t_audio)) * 0.1).astype(np.float32)
    )
    x_len = torch.full((BATCH,), t_audio, dtype=torch.long)
    with torch.no_grad():
        f, f_len, _ = enc(x, x_len)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            f, f_len, _ = enc(x, x_len)
            logits = fc(f)
            preds = logits.argmax(-1)
            # per-sample python collapse loop, as the reference does
            for b in range(BATCH):
                seq, prev = [], -1
                for t in range(int(f_len[b])):
                    p = int(preds[b, t])
                    if p != 0 and p != prev:
                        seq.append(p)
                    prev = p
        dt = time.perf_counter() - t0
    return BATCH * SECONDS * iters / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--details", action="store_true",
                    help="also measure secondary benchmarks and write "
                         "BENCH_DETAILS.md")
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--remeasure-baseline", action="store_true",
                    help="ignore bench_baseline.json and re-measure the "
                         "reference PyTorch CPU side")
    args = ap.parse_args()

    # the tunnelled TPU backend can hang indefinitely at init when the remote
    # pool is unavailable; probe it in a subprocess with a deadline so the
    # bench fails loudly (one JSON line with an error field) instead of
    # hanging the driver
    import subprocess

    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            timeout=240, capture_output=True, text=True,
        )
        backend_ok = probe.returncode == 0
        err = (probe.stderr or "").strip().splitlines()[-1:] or [""]
    except subprocess.TimeoutExpired:
        backend_ok, err = False, ["backend init timed out after 240s"]
    if not backend_ok:
        print(json.dumps({
            "metric": "ctc_small_batched_greedy_rtf_per_chip",
            "value": None, "unit": "audio_seconds_per_wall_second",
            "vs_baseline": None,
            "error": f"device backend unavailable: {err[0][:200]}",
        }))
        return

    report = {}
    rtf = bench_tpu_ctc_greedy(report)
    ref_rtf = None if args.skip_baseline else bench_reference_torch_cpu(
        use_cache=not args.remeasure_baseline
    )
    vs = round(rtf / ref_rtf, 1) if ref_rtf else None

    # inference MFU: flops of one decode call / (call wall-time * chip peak)
    inf_mfu_line = ""
    flops_call = report.get("flops_per_call")
    if flops_call:
        from efficientconformer_tpu.utils import flops as F

        call_s = BATCH * SECONDS / rtf
        u = F.mfu(flops_call, call_s, dtype="bfloat16")
        inf_mfu_line = (
            f"- Inference arithmetic: {F.format_flops(flops_call)}/batch "
            f"(matmul+conv) -> {F.format_flops(flops_call / call_s)}/s"
            + (f", **MFU {u*100:.1f}%**" if u is not None else
               " (MFU n/a off-TPU)")
            + " — greedy CTC inference is HBM/latency-bound at Small size, "
              "not MXU-bound; train MFU below is the utilisation headline"
        )

    if args.details:
        lines = [
            "# Benchmark details (bench.py --details)",
            "",
            f"- CTC Small batched greedy, TPU chip: **{rtf:.0f}x RT** "
            f"(batch {BATCH} x {SECONDS:.0f}s, bf16)",
        ]
        if inf_mfu_line:
            lines.append(inf_mfu_line)
        if ref_rtf:
            lines.append(
                f"- Reference PyTorch greedy CTC on host CPU (same workload, "
                f"measured): {ref_rtf:.1f}x RT -> ratio {rtf / ref_rtf:.0f}x "
                f"(hardware-asymmetric: one v5e chip vs host CPU; the "
                f"reference's published GPUs are not available in this image)"
            )
        lines += ["", "## Training (fwd+bwd+update, bf16, measured)", ""]
        for name, batch, secs in (
            ("EfficientConformerCTCSmall", 16, 10.0),
            ("EfficientConformerCTCLarge", 8, 16.0),
            ("EfficientConformerTransducerMedium", 8, 10.0),
        ):
            try:
                r = bench_train_step(name, batch, secs)
                mfu_s = (f"MFU {r['mfu']*100:.1f}%" if r["mfu"] is not None
                         else "MFU n/a")
                lines.append(
                    f"- {name} b={batch}x{secs:.0f}s: "
                    f"**{r['ms_per_step']:.1f} ms/step** "
                    f"({r['audio_s_per_s']:.0f} audio-s/s/chip), "
                    f"{r['tflops_per_step']:.2f} TF/step -> {mfu_s}")
            except Exception as e:  # keep the primary metric robust
                lines.append(f"- {name}: train bench failed: {e!r}")
        with open("BENCH_DETAILS.md", "w") as f:
            f.write("\n".join(lines) + "\n")

    print(json.dumps({
        "metric": "ctc_small_batched_greedy_rtf_per_chip",
        "value": round(rtf, 2),
        "unit": "audio_seconds_per_wall_second",
        "vs_baseline": vs if vs is not None else 0.0,
    }))


if __name__ == "__main__":
    main()
