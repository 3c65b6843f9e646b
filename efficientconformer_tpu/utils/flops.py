"""Matmul/conv FLOP accounting and MFU (model FLOPs utilisation).

The reference has no utilisation accounting at all (its ``eval_time`` modes
are wall-clock only, reference models/model.py:570-625); "is N ms/step good?"
is unanswerable there. Here FLOPs are counted *exactly* from the jaxpr of the
jitted program — every ``dot_general`` and ``conv_general_dilated``, including
those autodiff emits for the backward pass — so MFU is
``counted_flops / (step_seconds * chip_peak_flops)`` with no hand-derived
per-architecture formula to drift out of date.

Counting rules (the standard MFU convention, scaling-book style):
  - a dot_general contracting K over an output of size M*N costs 2*M*N*K;
  - a conv costs 2 * output_elements * (kernel_elements * in_channels / groups)
    (feature_group_count divides the contraction);
  - elementwise / softmax / norm FLOPs are NOT counted (they are HBM-bound,
    not MXU work — counting them would flatter MFU);
  - scan bodies multiply by trip count; while_loop bodies are counted once
    per ``while_trip_estimate`` (0 by default: decode loops have
    data-dependent trip counts, so report them separately).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.extend import core as _jex_core


def _dot_flops(eqn) -> int:
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    k = 1
    for d in lc:
        k *= lhs.shape[d]
    batch = 1
    for d in lb:
        batch *= lhs.shape[d]
    m = 1
    for d in range(len(lhs.shape)):
        if d not in lc and d not in lb:
            m *= lhs.shape[d]
    n = 1
    for d in range(len(rhs.shape)):
        if d not in rc and d not in rb:
            n *= rhs.shape[d]
    return 2 * batch * m * n * k


import functools


@functools.lru_cache(maxsize=None)
def _valid_tap_fraction(
    in_ext: int, k_ext: int, o_ext: int, stride: int,
    pad_lo: int, lhs_dil: int, rhs_dil: int,
) -> float:
    """Fraction of the nominal out*kernel tap pairs on one spatial axis that
    actually land on input (not padding / dilation holes).

    Matters for the convs autodiff emits: the input-gradient of a conv whose
    kernel spans the whole axis (e.g. layers.FlattenDense's 1xM projection)
    lowers to a transposed conv where only 1 of K taps is real — the nominal
    count would overstate the step's FLOPs by the kernel extent (observed:
    +2.5 TF/step phantom FLOPs on CTC Large). Ordinary convs keep the
    nominal count (SAME-padding edge taps ARE materialised MXU work): the
    correction applies only when the dilated kernel is wider than the
    dilated input — the degenerate transposed-conv regime, where XLA
    rewrites to a matmul and the nominal taps are pure phantom."""
    dil_in = (in_ext - 1) * lhs_dil + 1
    dil_k = (k_ext - 1) * rhs_dil + 1
    if dil_k <= dil_in:
        return 1.0
    taps = 0
    for o in range(o_ext):
        base = o * stride - pad_lo
        for k in range(k_ext):
            pos = base + k * rhs_dil
            if 0 <= pos < dil_in and pos % lhs_dil == 0:
                taps += 1
    return taps / float(o_ext * k_ext)


def _conv_flops(eqn) -> int:
    lhs = eqn.invars[0].aval  # input
    rhs = eqn.invars[1].aval  # kernel
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    bgc = eqn.params.get("batch_group_count", 1)
    # kernel spatial elements * input-channels-per-group
    kshape = rhs.shape
    spatial = 1
    for d in range(len(kshape)):
        if d not in (dn.rhs_spec[0], dn.rhs_spec[1]):
            spatial *= kshape[d]
    in_per_group = kshape[dn.rhs_spec[1]]
    out_elems = int(np.prod(out.shape))
    frac = 1.0
    strides = eqn.params.get("window_strides")
    pads = eqn.params.get("padding")
    lhs_dil = eqn.params.get("lhs_dilation") or (1,) * len(strides)
    rhs_dil = eqn.params.get("rhs_dilation") or (1,) * len(strides)
    for ax in range(len(strides)):
        frac *= _valid_tap_fraction(
            int(lhs.shape[dn.lhs_spec[2 + ax]]),
            int(rhs.shape[dn.rhs_spec[2 + ax]]),
            int(out.shape[dn.out_spec[2 + ax]]),
            int(strides[ax]), int(pads[ax][0]),
            int(lhs_dil[ax]), int(rhs_dil[ax]),
        )
    return int(2 * out_elems * spatial * in_per_group * frac) // max(bgc, 1)


def count_flops(jaxpr, while_trip_estimate: int = 0) -> int:
    """Total matmul+conv FLOPs of a (closed) jaxpr, recursing into all
    sub-jaxprs. ``scan`` bodies are multiplied by their trip count."""
    total = 0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            total += _dot_flops(eqn)
        elif prim == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif prim == "scan":
            body = eqn.params["jaxpr"].jaxpr
            total += eqn.params["length"] * count_flops(body, while_trip_estimate)
        elif prim == "while":
            body = eqn.params["body_jaxpr"].jaxpr
            total += while_trip_estimate * count_flops(body, while_trip_estimate)
        elif prim == "cond":
            branches = eqn.params["branches"]
            if branches:
                total += max(count_flops(b.jaxpr, while_trip_estimate)
                             for b in branches)
        elif prim == "pallas_call":
            # Prefer the kernel's declared CostEstimate: our kernels declare
            # SEMANTIC (unpadded) matmul FLOPs there, keeping MFU on the
            # model-FLOPs convention (padded lane dims would flatter it).
            # Fallback: the kernel jaxpr is the PER-BLOCK program, so its
            # dots run once per grid point (counted at padded shapes).
            ce = eqn.params.get("cost_estimate")
            if ce is not None and getattr(ce, "flops", None):
                total += int(ce.flops)
            else:
                grid = eqn.params["grid_mapping"].grid
                n_blocks = 1
                for g in grid:
                    n_blocks *= int(g)
                total += n_blocks * count_flops(
                    eqn.params["jaxpr"], while_trip_estimate
                )
        else:
            # generic recursion: pjit, remat/checkpoint, custom_vjp/jvp, ...
            for v in eqn.params.values():
                if isinstance(v, _jex_core.ClosedJaxpr):
                    total += count_flops(v.jaxpr, while_trip_estimate)
                elif isinstance(v, _jex_core.Jaxpr):
                    total += count_flops(v, while_trip_estimate)
                elif isinstance(v, (tuple, list)):
                    for it in v:
                        if isinstance(it, _jex_core.ClosedJaxpr):
                            total += count_flops(it.jaxpr, while_trip_estimate)
                        elif isinstance(it, _jex_core.Jaxpr):
                            total += count_flops(it, while_trip_estimate)
    return total


def flops_of_fn(fn, *args, while_trip_estimate: int = 0, **kwargs) -> int:
    """Trace ``fn`` at the given arguments and count its matmul/conv FLOPs."""
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    return count_flops(jaxpr.jaxpr, while_trip_estimate)


# ---------------------------------------------------------------------------
# chip peak FLOP/s (dense, no sparsity), per Google's published specs
# ---------------------------------------------------------------------------

_PEAK_FLOPS = {
    # device_kind substring (lowercase) -> (bf16 peak, fp32 peak) FLOP/s
    "v2": (45e12, 45e12),
    "v3": (123e12, 123e12),
    "v4": (275e12, 275e12),
    "v5 lite": (197e12, 98.5e12),
    "v5e": (197e12, 98.5e12),
    "v5p": (459e12, 459e12),
    "v6 lite": (918e12, 459e12),
    "v6e": (918e12, 459e12),
}


def device_peak_flops(device=None, dtype: str = "bfloat16") -> Optional[float]:
    """Peak dense FLOP/s of the chip, or None if unknown (e.g. CPU)."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, (bf16, fp32) in _PEAK_FLOPS.items():
        if key in kind:
            return bf16 if "bf" in dtype or "16" in dtype else fp32
    return None


def mfu(step_flops: int, step_seconds: float,
        device=None, dtype: str = "bfloat16") -> Optional[float]:
    """Model FLOPs utilisation in [0, 1]; None when the chip peak is unknown."""
    peak = device_peak_flops(device, dtype)
    if not peak or step_seconds <= 0:
        return None
    return step_flops / (step_seconds * peak)


def format_flops(n: float) -> str:
    for unit, scale in (("TF", 1e12), ("GF", 1e9), ("MF", 1e6)):
        if n >= scale:
            return f"{n / scale:.2f} {unit}"
    return f"{n:.0f} F"
