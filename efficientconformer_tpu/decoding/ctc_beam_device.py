"""Fully on-device CTC prefix beam search (with optional n-gram fusion).

The host implementations (decoding/ctc_beam.py Python spec and the C++
native/ctc_beam.cpp, replacing the reference's ctcdecode extension,
reference model_ctc.py:138-181) walk a prefix dict per utterance on the
host. CTC beam search is *frame-synchronous* — unlike the transducer beam
there are no sequential pops — so it vectorises cleanly over (batch, W)
beams: one ``lax.scan`` over frames, everything else batched.

Exact prefix-merge without a dict: the W live beams always hold DISTINCT
prefixes (an invariant of pruning, see below), so the only cross-beam merge
the dict performs is "extension of beam i with token c equals existing beam
j's prefix" (e.g. beams 'A' and 'AB': 'A'+B folds into 'AB''s non-blank
mass). That is detected with a per-frame (W, W) parent matrix
``eq[j, i] = len_j == len_i + 1 and prefix_j[:len_i] == prefix_i`` over the
token buffers; at most one parent can match per beam. Extensions absorbed
this way are masked out of the candidate pool, so every pool entry is a
distinct prefix and ``top_k`` pruning preserves the invariant.

N-gram fusion uses the device-resident packed-trie scorer
(decoding/ngram_device.DeviceNgram): ``alpha * log10P(c | prefix) + beta``
per emitted token, the ctcdecode/parlance convention the host spec follows.
LM state is one int32 node per beam, advanced on extension.

Semantics match ``decoding/ctc_beam.ctc_prefix_beam_search`` (no
cutoff_top_n — the device version always scores the full vocabulary);
equality is tested on random log-probs with and without an LM.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

LOG0 = -1e30


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, LOG0 / 2)
    return jnp.where(
        m <= LOG0 / 2, LOG0,
        m + jnp.log1p(jnp.exp(jnp.minimum(a, b) - m_safe)),
    )


def ctc_beam_search_device(
    log_probs: jnp.ndarray,      # (B, T, V) natural-log probabilities
    seq_len: jnp.ndarray,        # (B,)
    beam_size: int = 16,
    blank: int = 0,
    ngram=None,                  # DeviceNgram (or ArpaLM, converted)
    alpha: float = 0.0,
    beta: float = 0.0,
    max_len: Optional[int] = None,
) -> List[List[int]]:
    """Batched prefix beam search; returns the best token sequence per
    utterance."""
    if ngram is not None and alpha:
        from efficientconformer_tpu.decoding.ngram_device import as_device_ngram

        ngram = as_device_ngram(ngram, log_probs.shape[-1])
    else:
        ngram = None
    u_cap = int(max_len if max_len is not None else log_probs.shape[1])
    key = (beam_size, blank, id(ngram) if ngram is not None else None,
           float(alpha), float(beta), u_cap)
    fn = _CACHE.get(key)
    if fn is None:
        fn = jax.jit(
            functools.partial(
                _impl, beam_size=beam_size, blank=blank, ngram=ngram,
                alpha=alpha, beta=beta, u_cap=u_cap,
            )
        )
        _CACHE[key] = fn
    tokens, n_tok = fn(log_probs, seq_len)
    tokens, n_tok = np.asarray(tokens), np.asarray(n_tok)
    return [tokens[i, : n_tok[i]].tolist() for i in range(tokens.shape[0])]


_CACHE: dict = {}


def _impl(log_probs, seq_len, *, beam_size, blank, ngram, alpha, beta, u_cap):
    b, t_max, v = log_probs.shape
    w = beam_size
    use_ng = ngram is not None and alpha
    ar_b = jnp.arange(b)[:, None]
    ar_w = jnp.arange(w)[None, :]

    state = {
        "pref": jnp.zeros((b, w, u_cap), jnp.int32),
        "plen": jnp.zeros((b, w), jnp.int32),
        # slot 0 = the empty prefix (p_blank = 1); others invalid
        "pb": jnp.where(ar_w == 0, 0.0, LOG0) * jnp.ones((b, 1)),
        "pnb": jnp.full((b, w), LOG0),
        "lmsc": jnp.zeros((b, w), jnp.float32),
    }
    if use_ng:
        state["node"] = ngram.start_state((b, w))

    def frame(state, inp):
        lp, active = inp                      # (B, V), (B,)
        pref, plen = state["pref"], state["plen"]
        pb, pnb, lmsc = state["pb"], state["pnb"], state["lmsc"]
        ptot = _logaddexp(pb, pnb)
        valid = ptot > LOG0 / 2               # (B, W)

        last = jnp.where(
            plen > 0,
            jnp.take_along_axis(
                pref, jnp.maximum(plen - 1, 0)[..., None], axis=-1
            )[..., 0],
            -1,
        )                                     # (B, W), -1 for empty
        p_last = jnp.take_along_axis(
            lp, jnp.maximum(last, 0), axis=-1
        )                                     # (B, W)

        # ---- same-prefix entries: blank + repeat-without-blank
        pb_new = ptot + lp[:, blank][:, None]
        pnb_same = jnp.where(plen > 0, pnb + p_last, LOG0)

        # ---- parent matrix: eq[b, j, i] = prefix_j == prefix_i + last_j
        pos = jnp.arange(u_cap)[None, None, None, :]
        same_tok = pref[:, :, None, :] == pref[:, None, :, :]   # (B, j, i, U)
        within = pos < plen[:, None, :, None]                   # parent len
        match = jnp.all(same_tok | ~within, axis=-1)
        eq = (
            (plen[:, :, None] == plen[:, None, :] + 1)
            & match
            & valid[:, None, :]
            & valid[:, :, None]
        )                                     # (B, j, i)
        has_par = jnp.any(eq, axis=-1)
        par = jnp.argmax(eq, axis=-1)         # (B, W) parent index
        par_pb = jnp.take_along_axis(pb, par, axis=-1)
        par_ptot = jnp.take_along_axis(ptot, par, axis=-1)
        par_last = jnp.take_along_axis(last, par, axis=-1)
        ext_into = jnp.where(
            has_par,
            jnp.where(last == par_last, par_pb, par_ptot) + p_last,
            LOG0,
        )
        pnb_new = _logaddexp(pnb_same, ext_into)
        score_same = _logaddexp(pb_new, pnb_new) + lmsc

        # ---- extension candidates (i, c): new prefix = prefix_i + c
        base = jnp.where(
            jnp.arange(v)[None, None, :] == last[..., None], pb[..., None],
            ptot[..., None],
        )                                     # (B, W, V)
        ext_pnb = base + lp[:, None, :]
        if use_ng:
            lm_add = alpha * ngram.score_from(
                jnp.broadcast_to(state["node"][..., None], (b, w, v)),
                jnp.broadcast_to(jnp.arange(v)[None, None, :], (b, w, v)),
            ) + beta
        else:
            lm_add = jnp.zeros((b, w, v), jnp.float32)
        ext_score = ext_pnb + (lmsc[..., None] + lm_add)

        # absorbed[i, c]: some beam j already IS prefix_i + c (scatter-or
        # over j; .max handles the duplicate (0, 0) indices of non-parents)
        absorbed = jnp.zeros((b, w, v), jnp.int32).at[
            ar_b, jnp.where(has_par, par, 0), jnp.maximum(last, 0)
        ].max((has_par & (last >= 0)).astype(jnp.int32)).astype(bool)
        dead = (
            absorbed
            | (jnp.arange(v)[None, None, :] == blank)
            | ~valid[..., None]
            | (plen[..., None] >= u_cap)
        )
        ext_score = jnp.where(dead, LOG0, ext_score)

        # ---- prune: top-W over [W same] ++ [W*V extensions]
        pool = jnp.concatenate(
            [score_same, ext_score.reshape(b, w * v)], axis=-1
        )
        top_score, top_idx = jax.lax.top_k(pool, w)       # (B, W)
        is_same = top_idx < w
        src = jnp.where(is_same, top_idx, (top_idx - w) // v)   # source beam
        tok = jnp.where(is_same, 0, (top_idx - w) % v)          # ext token

        def pick(a):
            return jnp.take_along_axis(
                a, src.reshape(src.shape + (1,) * (a.ndim - 2)), axis=1
            )

        new_pref = pick(pref)
        new_plen = jnp.take_along_axis(plen, src, axis=-1)
        # append the extension token
        new_pref = new_pref.at[ar_b, ar_w, jnp.minimum(new_plen, u_cap - 1)].set(
            jnp.where(is_same, new_pref[ar_b, ar_w,
                                        jnp.minimum(new_plen, u_cap - 1)], tok)
        )
        new_plen = new_plen + (~is_same).astype(jnp.int32)

        new_pb = jnp.where(is_same, jnp.take_along_axis(pb_new, src, -1), LOG0)
        new_pnb = jnp.where(
            is_same,
            jnp.take_along_axis(pnb_new, src, -1),
            jnp.take_along_axis(
                ext_pnb.reshape(b, w * v),
                jnp.maximum(top_idx - w, 0), -1,
            ),
        )
        new_lmsc = jnp.take_along_axis(lmsc, src, -1) + jnp.where(
            is_same, 0.0,
            jnp.take_along_axis(
                lm_add.reshape(b, w * v), jnp.maximum(top_idx - w, 0), -1
            ),
        )
        # entries that fell off the pool (score LOG0) must stay invalid
        new_pb = jnp.where(top_score > LOG0 / 2, new_pb, LOG0)
        new_pnb = jnp.where(top_score > LOG0 / 2, new_pnb, LOG0)

        new_state = {
            "pref": new_pref, "plen": new_plen,
            "pb": new_pb, "pnb": new_pnb, "lmsc": new_lmsc,
        }
        if use_ng:
            src_node = jnp.take_along_axis(state["node"], src, -1)
            adv = ngram.advance_node(src_node, tok)
            new_state["node"] = jnp.where(is_same, src_node, adv)

        # inactive frames (t >= seq_len): keep the old state
        keep = active[:, None]
        out = {}
        for k in state:
            m = keep.reshape((b, 1) + (1,) * (state[k].ndim - 2))
            out[k] = jnp.where(m, new_state[k], state[k])
        return out, None

    ts = jnp.arange(t_max)
    active = ts[None, :] < seq_len[:, None]                  # (B, T)
    state, _ = jax.lax.scan(
        frame, state,
        (jnp.moveaxis(log_probs, 1, 0), jnp.moveaxis(active, 1, 0)),
    )

    score = _logaddexp(state["pb"], state["pnb"]) + state["lmsc"]
    best = jnp.argmax(score, axis=-1)
    tokens = jnp.take_along_axis(
        state["pref"], best[:, None, None], axis=1
    )[:, 0]
    n_tok = jnp.take_along_axis(state["plen"], best[:, None], axis=-1)[:, 0]
    return tokens, n_tok
