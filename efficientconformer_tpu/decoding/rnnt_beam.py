"""Transducer beam search with neural-LM shallow fusion and n-gram rescoring.

Semantics follow reference models/transducer.py:188-326 (Graves A/B hypothesis
sets, best-hyp expansion until B holds beam_size hyps per frame, length-
normalised selection, lm_weight * log-softmax fusion, ngram_alpha * BaseScore +
ngram_beta rescoring with per-hyp LM states).

Host-orchestrated: the prediction-network and joint steps are jitted device
calls; hypothesis bookkeeping stays on host. Decoder hidden states are jax
arrays carried per hypothesis (cheap: (layers, 1, H)).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from efficientconformer_tpu.decoding.ngram import ArpaLM
from efficientconformer_tpu.models.transducer import Transducer


@dataclass
class Hyp:
    prediction: List[int]
    logp_score: float
    hidden: object = None
    hidden_lm: object = None
    ngram_state: tuple = ()

    @property
    def norm_score(self) -> float:
        return self.logp_score / len(self.prediction)


def beam_search(
    model: Transducer,
    variables,
    x: jnp.ndarray,
    x_len: jnp.ndarray,
    *,
    beam_size: int = 16,
    tmp: float = 1.0,
    lm_model=None,
    lm_variables=None,
    lm_weight: float = 0.0,
    lm_tmp: float = 1.0,
    ngram: Optional[ArpaLM] = None,
    ngram_alpha: float = 0.0,
    ngram_beta: float = 0.0,
    ref_topk: bool = False,
) -> List[List[int]]:
    """Returns token sequences for the batch.

    ``ref_topk=True`` reproduces the reference's raw top-k routing EXACTLY
    (reference transducer.py:275-319): one top-``beam_size`` over the FULL
    fused vocabulary per pop, blank extending into B only when blank is in
    that top-k, every other top-k label extending into A. The default (False)
    is the repo's Graves formulation — blank always extends into B plus the
    top-k NON-blank labels into A — which guarantees per-frame termination;
    the two agree whenever blank stays inside the top-k (the trained-model
    regime). Under ``ref_topk`` the expansion loop has no natural bound, so a
    safety cap raises rather than silently diverging from the reference.
    """
    f, f_len, _ = model.apply(variables, x, x_len, False, method=Transducer.encode)

    dec_step = jax.jit(
        lambda tok, carry: model.apply(
            variables, tok, carry, method=Transducer.decode_step
        )
    )
    joint_step = jax.jit(
        lambda f_t, g: model.apply(variables, f_t, g, method=Transducer.joint_step)
    )
    if lm_model is not None:
        lm_step = jax.jit(
            lambda tok, carry: lm_model.apply(
                lm_variables, tok, carry, method=type(lm_model).step
            )
        )

    init_carry = model.apply(variables, 1, method=Transducer.decoder_init_carry)

    results = []
    for b in range(x.shape[0]):
        beams = [
            Hyp(
                prediction=[0],
                logp_score=0.0,
                hidden=init_carry,
                hidden_lm=(
                    lm_model.apply(lm_variables, 1, method=type(lm_model).init_carry)
                    if lm_model is not None
                    else None
                ),
                ngram_state=ngram.start_state() if ngram is not None else (),
            )
        ]
        for t in range(int(f_len[b])):
            a_hyps = beams
            beams = []
            # Expansion loop (reference transducer.py:236-319): repeatedly pop
            # the best hypothesis, extend by blank into B and by the top-k
            # non-blank labels into A. Unlike the reference's raw topk (which
            # can starve B of blank extensions and stall when blank falls out
            # of the top-k), the blank extension is always emitted — this is
            # Graves' formulation and guarantees termination.
            expansions = 0
            max_exp = 100 * beam_size if ref_topk else 3 * beam_size
            while len(beams) < beam_size and expansions < max_exp:
                expansions += 1
                best = max(a_hyps, key=Hyp.norm_score.fget)
                a_hyps.remove(best)

                tok = jnp.array([best.prediction[-1]], jnp.int32)
                g, hidden = dec_step(tok, best.hidden)
                logits = joint_step(f[b : b + 1, t], g)[0] / tmp
                logp = jax.nn.log_softmax(logits)
                if lm_model is not None and lm_weight:
                    lm_logits, hidden_lm = lm_step(tok, best.hidden_lm)
                    logp = logp + lm_weight * jax.nn.log_softmax(
                        lm_logits[0] / lm_tmp
                    )
                logp = np.asarray(logp)

                if ref_topk:
                    # reference routing: top-k over the FULL vocab (stable
                    # descending = torch.topk's lowest-index-first on ties)
                    topk = np.argsort(-logp, kind="stable")[:beam_size]
                    if 0 in topk:
                        beams.append(
                            Hyp(
                                prediction=best.prediction[:],
                                logp_score=best.logp_score + float(logp[0]),
                                hidden=best.hidden,
                                hidden_lm=best.hidden_lm,
                                ngram_state=best.ngram_state,
                            )
                        )
                    topk = topk[topk != 0]
                else:
                    # blank extension -> B (always)
                    beams.append(
                        Hyp(
                            prediction=best.prediction[:],
                            logp_score=best.logp_score + float(logp[0]),
                            hidden=best.hidden,
                            hidden_lm=best.hidden_lm,
                            ngram_state=best.ngram_state,
                        )
                    )
                    # top-k non-blank extensions -> A
                    topk = np.argsort(logp[1:])[-beam_size:][::-1] + 1
                for c in topk:
                    c = int(c)
                    hyp = Hyp(
                        prediction=best.prediction[:] + [c],
                        logp_score=best.logp_score + float(logp[c]),
                        hidden=hidden,
                        hidden_lm=(
                            hidden_lm
                            if lm_model is not None and lm_weight
                            else best.hidden_lm
                        ),
                        ngram_state=best.ngram_state,
                    )
                    if ngram is not None and ngram_alpha:
                        sc, ns = ngram.score(best.ngram_state, c)
                        hyp.logp_score += ngram_alpha * sc + ngram_beta
                        hyp.ngram_state = ns
                    a_hyps.append(hyp)
            if ref_topk and len(beams) < beam_size:
                raise RuntimeError(
                    "ref_topk beam search hit the expansion safety cap "
                    f"({max_exp}) with only {len(beams)}/{beam_size} blank "
                    "extensions — the reference's unbounded loop would spin "
                    "here; this model/input keeps blank out of the top-k."
                )
        best = max(beams, key=Hyp.norm_score.fget)
        results.append(best.prediction[1:])
    return results


def beam_search_batched(
    model: Transducer,
    variables,
    x: jnp.ndarray,
    x_len: jnp.ndarray,
    *,
    beam_size: int = 16,
    tmp: float = 1.0,
    lm_model=None,
    lm_variables=None,
    lm_weight: float = 0.0,
    lm_tmp: float = 1.0,
    ngram: Optional[ArpaLM] = None,
    ngram_alpha: float = 0.0,
    ngram_beta: float = 0.0,
    ref_topk: bool = False,
) -> List[List[int]]:
    """Beam search with expansions batched across utterances.

    Per-sample semantics are identical to ``beam_search`` (each utterance runs
    its own Graves expansion loop) but every expansion wave issues ONE
    prediction-network/joint device call covering all still-active samples —
    ~B x fewer host-device round trips. Finished samples idle with dummy
    tokens until the wave drains.

    Neural-LM shallow fusion (reference transducer.py:260-273): the LM step is
    batched across the wave exactly like the prediction-network step. Requires
    a fixed-shape LM carry (RNN LM); the caller routes growing-cache LMs
    (Transformer) through the per-sample ``beam_search``.
    """
    f, f_len, _ = model.apply(variables, x, x_len, False, method=Transducer.encode)
    bsz = x.shape[0]
    use_lm = lm_model is not None and lm_weight

    dec_step = jax.jit(
        lambda tok, carry: model.apply(
            variables, tok, carry, method=Transducer.decode_step
        )
    )
    joint_step = jax.jit(
        lambda f_t, g: model.apply(variables, f_t, g, method=Transducer.joint_step)
    )
    init_carry = model.apply(variables, bsz, method=Transducer.decoder_init_carry)
    if use_lm:
        lm_step = jax.jit(
            lambda tok, carry: lm_model.apply(
                lm_variables, tok, carry, method=type(lm_model).step
            )
        )
        lm_init_carry = lm_model.apply(
            lm_variables, bsz, method=type(lm_model).init_carry
        )

    def carry_slice(carry, idx):
        return jax.tree.map(lambda c: _take_batch(c, idx), carry)

    # per-sample state
    beams = [
        [Hyp([0], 0.0, hidden=carry_slice(init_carry, b),
             hidden_lm=carry_slice(lm_init_carry, b) if use_lm else None,
             ngram_state=ngram.start_state() if ngram is not None else ())]
        for b in range(bsz)
    ]
    t_ptr = [0] * bsz
    a_hyps: List[List[Hyp]] = [[] for _ in range(bsz)]
    new_beams: List[List[Hyp]] = [[] for _ in range(bsz)]
    expansions = [0] * bsz
    in_frame = [False] * bsz

    f_len_host = [int(v) for v in f_len]

    def frame_done(b):
        return t_ptr[b] >= f_len_host[b]

    while not all(frame_done(b) for b in range(bsz)):
        # start a new frame where needed
        for b in range(bsz):
            if frame_done(b) or in_frame[b]:
                continue
            a_hyps[b] = beams[b]
            new_beams[b] = []
            expansions[b] = 0
            in_frame[b] = True

        # one expansion wave: pop each active sample's best hypothesis
        active = [b for b in range(bsz) if in_frame[b] and not frame_done(b)]
        bests = {}
        for b in active:
            best = max(a_hyps[b], key=Hyp.norm_score.fget)
            a_hyps[b].remove(best)
            bests[b] = best

        toks = np.zeros((bsz,), np.int32)
        f_rows = np.zeros((bsz,), np.int64)
        for b in active:
            toks[b] = bests[b].prediction[-1]
            f_rows[b] = min(t_ptr[b], f.shape[1] - 1)
        carry = _stack_carries(
            [bests[b].hidden if b in bests else carry_slice(init_carry, 0)
             for b in range(bsz)]
        )
        g, hidden = dec_step(jnp.asarray(toks), carry)
        logits = joint_step(f[jnp.arange(bsz), jnp.asarray(f_rows)], g) / tmp
        logp = jax.nn.log_softmax(logits, axis=-1)
        if use_lm:
            lm_carry = _stack_carries(
                [bests[b].hidden_lm if b in bests else carry_slice(lm_init_carry, 0)
                 for b in range(bsz)]
            )
            lm_logits, lm_hidden = lm_step(jnp.asarray(toks), lm_carry)
            logp = logp + lm_weight * jax.nn.log_softmax(
                lm_logits / lm_tmp, axis=-1
            )
        logp = np.asarray(logp)

        max_exp = 100 * beam_size if ref_topk else 3 * beam_size
        for b in active:
            best = bests[b]
            expansions[b] += 1
            hid_b = carry_slice(hidden, b)
            lm_hid_b = carry_slice(lm_hidden, b) if use_lm else None
            if ref_topk:
                # reference routing (transducer.py:275-319): one top-k over
                # the full vocab; blank -> B only when inside the top-k
                topk = np.argsort(-logp[b], kind="stable")[:beam_size]
                if 0 in topk:
                    new_beams[b].append(
                        Hyp(best.prediction[:],
                            best.logp_score + float(logp[b, 0]),
                            hidden=best.hidden, hidden_lm=best.hidden_lm,
                            ngram_state=best.ngram_state)
                    )
                topk = topk[topk != 0]
            else:
                new_beams[b].append(
                    Hyp(best.prediction[:], best.logp_score + float(logp[b, 0]),
                        hidden=best.hidden, hidden_lm=best.hidden_lm,
                        ngram_state=best.ngram_state)
                )
                topk = np.argsort(logp[b, 1:])[-beam_size:][::-1] + 1
            for c in topk:
                c = int(c)
                hyp = Hyp(best.prediction[:] + [c],
                          best.logp_score + float(logp[b, c]),
                          hidden=hid_b,
                          hidden_lm=lm_hid_b if use_lm else best.hidden_lm,
                          ngram_state=best.ngram_state)
                if ngram is not None and ngram_alpha:
                    sc, ns = ngram.score(best.ngram_state, c)
                    hyp.logp_score += ngram_alpha * sc + ngram_beta
                    hyp.ngram_state = ns
                a_hyps[b].append(hyp)

            if len(new_beams[b]) >= beam_size or expansions[b] >= max_exp:
                if ref_topk and len(new_beams[b]) < beam_size:
                    raise RuntimeError(
                        "ref_topk beam search hit the expansion safety cap "
                        f"({max_exp}) with {len(new_beams[b])}/{beam_size} "
                        "blank extensions"
                    )
                beams[b] = new_beams[b]
                t_ptr[b] += 1
                in_frame[b] = False

    return [max(bs, key=Hyp.norm_score.fget).prediction[1:] for bs in beams]


def _take_batch(c, idx):
    """Slice batch entry ``idx`` (keeping the axis) from a carry array whose
    batch axis is the LSTM (layers, B, H) middle axis or axis 0 of KV caches."""
    if c.ndim == 3:  # (layers, B, H)
        return c[:, idx : idx + 1]
    return c[idx : idx + 1]


def _stack_carries(carries):
    def cat(*xs):
        axis = 1 if xs[0].ndim == 3 else 0
        return jnp.concatenate(xs, axis=axis)

    return jax.tree.map(cat, *carries)
