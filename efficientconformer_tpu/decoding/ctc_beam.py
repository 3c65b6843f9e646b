"""CTC prefix beam search with optional n-gram fusion.

Replaces the ctcdecode C++ extension (reference model_ctc.py:138-181):
prefix beam search over device-computed log-probs with KenLM-style scoring
hooks (alpha * lm_log10prob + beta per emitted token, the ctcdecode/parlance
convention the reference uses with ngram_alpha/ngram_beta).

The search is host-side over (T, V) numpy log-probs; the encoder forward,
softmax and temperature run on device. A C++ implementation with the same
interface lives in native/ (used when built) — this module is the reference
implementation and fallback.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

from efficientconformer_tpu.decoding.ngram import ArpaLM

LOG0 = -1e30


def _logaddexp(a: float, b: float) -> float:
    if a < b:
        a, b = b, a
    if b <= LOG0 / 2:
        return a
    return a + math.log1p(math.exp(b - a))


def ctc_prefix_beam_search(
    log_probs: np.ndarray,          # (T, V), natural-log probabilities
    seq_len: int,
    beam_size: int = 16,
    blank: int = 0,
    lm: Optional[ArpaLM] = None,
    alpha: float = 0.0,
    beta: float = 0.0,
    cutoff_top_n: Optional[int] = None,
) -> List[int]:
    """Returns the best token sequence for one utterance."""
    # beams: prefix tuple -> (p_blank, p_nonblank, lm_state, lm_score)
    start_state = lm.start_state() if lm is not None else ()
    beams = {(): (0.0, LOG0, start_state, 0.0)}

    v = log_probs.shape[1]
    top_n = min(cutoff_top_n or v, v)

    for t in range(seq_len):
        lp = log_probs[t]
        cand = np.argsort(lp)[-top_n:] if top_n < v else range(v)
        next_beams: dict = {}

        def get(prefix, state):
            if prefix not in next_beams:
                next_beams[prefix] = [LOG0, LOG0, state, 0.0]
            return next_beams[prefix]

        for prefix, (pb, pnb, state, lm_sc) in beams.items():
            p_tot = _logaddexp(pb, pnb)
            for c in cand:
                c = int(c)
                p = float(lp[c])
                if c == blank:
                    e = get(prefix, state)
                    e[0] = _logaddexp(e[0], p_tot + p)
                    e[2], e[3] = state, lm_sc
                    continue
                last = prefix[-1] if prefix else None
                if c == last:
                    # repeat without blank: extends the same prefix's nonblank
                    e = get(prefix, state)
                    e[1] = _logaddexp(e[1], pnb + p)
                    e[2], e[3] = state, lm_sc
                    # with blank in between: new prefix
                    new_prefix = prefix + (c,)
                    ns, nsc = state, lm_sc
                    if lm is not None and alpha:
                        w_lp, ns = lm.score(state, c)
                        nsc = lm_sc + alpha * w_lp + beta
                    e2 = get(new_prefix, ns)
                    e2[1] = _logaddexp(e2[1], pb + p)
                    e2[2], e2[3] = ns, nsc
                else:
                    new_prefix = prefix + (c,)
                    ns, nsc = state, lm_sc
                    if lm is not None and alpha:
                        w_lp, ns = lm.score(state, c)
                        nsc = lm_sc + alpha * w_lp + beta
                    e = get(new_prefix, ns)
                    e[1] = _logaddexp(e[1], p_tot + p)
                    e[2], e[3] = ns, nsc

        # prune to beam_size by total (acoustic + lm) score
        scored = sorted(
            next_beams.items(),
            key=lambda kv: _logaddexp(kv[1][0], kv[1][1]) + kv[1][3],
            reverse=True,
        )[:beam_size]
        beams = {k: tuple(vv) for k, vv in scored}

    best = max(
        beams.items(), key=lambda kv: _logaddexp(kv[1][0], kv[1][1]) + kv[1][3]
    )
    return list(best[0])


def beam_search_batch(
    log_probs: np.ndarray,          # (B, T, V)
    seq_lens: np.ndarray,
    beam_size: int = 16,
    lm_path: Optional[str] = None,
    alpha: float = 0.0,
    beta: float = 0.0,
    ngram_offset: int = 100,
    use_native: bool = True,
    cutoff_top_n: int = 0,
    num_workers: int = 8,
) -> List[List[int]]:
    """Batch beam search; prefers the C++ implementation when built.

    cutoff_top_n: per-frame candidate pruning (ctcdecode parameter); 0 keeps
    the full vocabulary like the reference (model_ctc.py:150). Utterances are
    decoded across ``num_workers`` threads (the C++ search releases the GIL
    during ctypes calls; mirrors the reference's num_processes=8).
    """
    from efficientconformer_tpu.decoding import native_binding as nb

    if use_native and nb.available():
        lm = None
        if lm_path:
            try:
                lm = nb.NativeArpa(lm_path, ngram_offset)
            except FileNotFoundError:
                print("Ngram language model not found...")

        def one(b):
            return nb.ctc_beam_search_native(
                log_probs[b], int(seq_lens[b]), beam_size, 0, lm, alpha, beta,
                cutoff_top_n,
            )

        n = log_probs.shape[0]
        if num_workers > 1 and n > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=num_workers) as ex:
                return list(ex.map(one, range(n)))
        return [one(b) for b in range(n)]

    from efficientconformer_tpu.decoding.ngram import try_load

    lm = try_load(lm_path, ngram_offset) if lm_path else None
    return [
        ctc_prefix_beam_search(
            log_probs[b], int(seq_lens[b]), beam_size, 0, lm, alpha, beta
        )
        for b in range(log_probs.shape[0])
    ]
