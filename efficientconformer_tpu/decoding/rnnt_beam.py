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
) -> List[List[int]]:
    """Returns token sequences for the batch."""
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
            while len(beams) < beam_size and expansions < 3 * beam_size:
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

                # blank extension -> B
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
        best = max(beams, key=Hyp.norm_score.fget)
        results.append(best.prediction[1:])
    return results
