"""Fully on-device transducer beam search.

One jit-compiled program: encode -> ``lax.while_loop`` over encoder frames,
with the frame's expansion loop run as a ``fori_loop`` of EXACT sequential
pops, lock-stepped across the batch. This reproduces the host implementation
(decoding/rnnt_beam.py, reference models/transducer.py:188-326 semantics)
pop-for-pop:

  * per frame, the best hypothesis (by length-normalised score, earliest
    index on ties — matching Python ``max`` over the hypothesis list) is
    popped from A;
  * its blank extension is appended to B in ARRIVAL order (one per pop, so a
    frame performs exactly ``beam_size`` pops);
  * its top-W token extensions are appended to A (A capacity W + W*W,
    exact — the host never prunes A within a frame);
  * decoder/LM hidden states follow the host's lagging convention: a
    hypothesis stores the state BEFORE its last token; the pop replays
    dec_step(last_token, state).

The payoff is latency: the host pays a device round trip per pop
(W * T_frames round trips per batch); here the entire search is one XLA
program — the pops become W sequential (B,)-shaped dec/joint steps per
frame with no host synchronisation.

Optional neural-LM shallow fusion (reference transducer.py:260-273) for LMs
with fixed-shape carries (RNN LMs): logP += lm_weight *
log_softmax(lm_logits / lm_tmp) over the full vocabulary, blank included,
exactly like the reference.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from efficientconformer_tpu.models.transducer import Transducer

NEG = -1.0e30


def beam_search_device(
    model: Transducer,
    variables,
    x: jnp.ndarray,
    x_len: jnp.ndarray,
    *,
    beam_size: int = 16,
    tmp: float = 1.0,
    max_tokens: int = 256,
    lm_model=None,
    lm_variables=None,
    lm_weight: float = 0.0,
    lm_tmp: float = 1.0,
) -> List[List[int]]:
    """Returns decoded token id sequences (list per batch element)."""
    key = (id(model), beam_size, max_tokens,
           id(lm_model) if lm_model is not None else None,
           float(lm_weight), float(lm_tmp), float(tmp))
    fn = _CACHE.get(key)
    if fn is None:
        fn = jax.jit(
            functools.partial(
                _beam_impl,
                model=model,
                beam_size=beam_size,
                tmp=tmp,
                max_tokens=max_tokens,
                lm_model=lm_model,
                lm_weight=lm_weight,
                lm_tmp=lm_tmp,
            )
        )
        _CACHE[key] = fn
    tokens, n_tok = fn(variables, lm_variables, x, x_len)
    tokens, n_tok = np.asarray(tokens), np.asarray(n_tok)
    return [tokens[b, : n_tok[b]].tolist() for b in range(tokens.shape[0])]


_CACHE: dict = {}


# ---------------------------------------------------------------------------
# Carry layout helpers. Decoder/LM carries have a batch axis that is either
# leading (KV caches: (batch, ...)) or axis 1 of (layers, batch, hidden)
# LSTM states. For slot storage we normalise to batch-leading (B, slots, ...).
# ---------------------------------------------------------------------------


def _moved_flags(template, batch):
    """Per-leaf: True when the model layout is (layers, batch, ...) and the
    storage layout must move the batch axis to the front. Computed once from
    the template so the inverse mapping is unambiguous even when
    num_layers == batch."""
    return jax.tree.map(lambda a: a.shape[0] != batch, template)


def _carry_store(carry, moved):
    """Model-layout carry -> storage layout (batch-leading)."""
    return jax.tree.map(
        lambda a, m: jnp.moveaxis(a, 1, 0) if m else a, carry, moved
    )


def _carry_model(carry, moved):
    """Storage layout -> model layout."""
    return jax.tree.map(
        lambda a, m: jnp.moveaxis(a, 0, 1) if m else a, carry, moved
    )


def _slot_gather(tree, idx):
    """Leaves (B, C, ...), idx (B,) -> (B, ...): pick one slot per sample."""
    def g(a):
        ix = idx.reshape((-1,) + (1,) * (a.ndim - 1))
        return jnp.take_along_axis(a, ix, axis=1)[:, 0]
    return jax.tree.map(g, tree)


def _slot_set(tree, idx, value):
    """Write value (B, ...) into slot idx (B,) of tree leaves (B, C, ...)."""
    def s(a, v):
        b = a.shape[0]
        return a.at[jnp.arange(b), idx].set(v)
    return jax.tree.map(s, tree, value)


def _beam_impl(variables, lm_variables, x, x_len, *, model, beam_size, tmp,
               max_tokens, lm_model, lm_weight, lm_tmp):
    f, f_len, _ = model.apply(variables, x, x_len, False, method=Transducer.encode)
    b = f.shape[0]
    w = beam_size
    cap = w + w * w                     # frame-initial W + W children per pop
    use_lm = lm_model is not None and lm_weight

    dec_template = model.apply(variables, b, method=Transducer.decoder_init_carry)
    dec_moved = _moved_flags(dec_template, b)

    def dec_step(tok, carry_store):
        g, nc = model.apply(
            variables, tok, _carry_model(carry_store, dec_moved),
            method=Transducer.decode_step,
        )
        return g, _carry_store(nc, dec_moved)

    def joint_step(f_t, g):
        return model.apply(variables, f_t, g, method=Transducer.joint_step)

    if use_lm:
        # fixed-shape LM carry (RNN state, or a static-capacity KV cache for
        # Transformer LMs) so hypothesis states can be stacked/gathered
        lm_template = lm_model.apply(
            lm_variables, b, max_tokens + 1,
            method=type(lm_model).init_carry_fixed,
        )
        lm_moved = _moved_flags(lm_template, b)

        def lm_step(tok, carry_store):
            logits, nc = lm_model.apply(
                lm_variables, tok, _carry_model(carry_store, lm_moved),
                method=type(lm_model).step,
            )
            return logits, _carry_store(nc, lm_moved)

        lm_init = _carry_store(lm_template, lm_moved)
    else:
        lm_init = ()

    dec_init = _carry_store(dec_template, dec_moved)

    def tile_slots(tree, n):
        return jax.tree.map(
            lambda a: jnp.broadcast_to(
                a[:, None], (a.shape[0], n) + a.shape[1:]
            ),
            tree,
        )

    # Frame-boundary beam state (the host's B list), W slots in arrival order.
    beams = {
        "score": jnp.where(jnp.arange(w)[None, :] == 0, 0.0, NEG)
        * jnp.ones((b, 1)),
        "tokens": jnp.zeros((b, w, max_tokens), jnp.int32),
        "n_tok": jnp.zeros((b, w), jnp.int32),
        "last_tok": jnp.zeros((b, w), jnp.int32),
        "carry": tile_slots(dec_init, w),        # lagging (pre-last-token)
        "lm_carry": tile_slots(lm_init, w),
    }

    def frame_body(state):
        t = state["t"]
        f_t = f[jnp.arange(b), jnp.minimum(t, f.shape[1] - 1)]
        active = t < f_len                                   # (B,)

        prev = state["beams"]
        pad = cap - w
        a_set = {
            "score": jnp.pad(prev["score"], ((0, 0), (0, pad)),
                             constant_values=NEG),
            "tokens": jnp.pad(prev["tokens"], ((0, 0), (0, pad), (0, 0))),
            "n_tok": jnp.pad(prev["n_tok"], ((0, 0), (0, pad))),
            "last_tok": jnp.pad(prev["last_tok"], ((0, 0), (0, pad))),
            "carry": jax.tree.map(
                lambda a_: jnp.pad(
                    a_, ((0, 0), (0, pad)) + ((0, 0),) * (a_.ndim - 2)
                ),
                prev["carry"],
            ),
            "lm_carry": jax.tree.map(
                lambda a_: jnp.pad(
                    a_, ((0, 0), (0, pad)) + ((0, 0),) * (a_.ndim - 2)
                ),
                prev["lm_carry"],
            ),
        }
        pool = jax.tree.map(jnp.zeros_like, prev)
        pool["score"] = jnp.full((b, w), NEG)

        def pop(e, carry):
            a, pool = carry
            # ---- pop the best hypothesis (norm score, earliest index wins
            # ties, matching Python max over the ordered list)
            prio = jnp.where(
                a["score"] > NEG / 2,
                a["score"] / (1.0 + a["n_tok"].astype(jnp.float32)),
                NEG,
            )
            p = jnp.argmax(prio, axis=1)                      # (B,)
            popped = {k: _slot_gather(a[k], p)
                      for k in ("score", "tokens", "n_tok", "last_tok")}
            popped["carry"] = _slot_gather(a["carry"], p)
            popped["lm_carry"] = _slot_gather(a["lm_carry"], p)
            a = dict(a, score=a["score"].at[jnp.arange(b), p].set(NEG))

            # ---- replay the popped hyp's last token (host lagging-state
            # convention), then score its extensions
            g, new_carry = dec_step(popped["last_tok"], popped["carry"])
            logits = joint_step(f_t, g) / tmp
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            if use_lm:
                lm_logits, new_lm_carry = lm_step(
                    popped["last_tok"], popped["lm_carry"]
                )
                logp = logp + lm_weight * jax.nn.log_softmax(
                    lm_logits.astype(jnp.float32) / lm_tmp, axis=-1
                )
            else:
                new_lm_carry = popped["lm_carry"]

            # ---- blank extension -> pool slot e (arrival order)
            e_idx = jnp.full((b,), e, jnp.int32)
            pool = {
                "score": pool["score"].at[:, e].set(
                    popped["score"] + logp[:, 0]
                ),
                "tokens": _slot_set(pool["tokens"], e_idx, popped["tokens"]),
                "n_tok": pool["n_tok"].at[:, e].set(popped["n_tok"]),
                "last_tok": pool["last_tok"].at[:, e].set(popped["last_tok"]),
                "carry": _slot_set(pool["carry"], e_idx, popped["carry"]),
                "lm_carry": _slot_set(
                    pool["lm_carry"], e_idx, popped["lm_carry"]
                ),
            }

            # ---- top-W token extensions -> A slots [w + e*w : w + (e+1)*w]
            tok_lp, toks = jax.lax.top_k(logp[:, 1:], w)      # (B, W)
            toks = toks + 1
            child_scores = jnp.where(
                (popped["n_tok"] < max_tokens)[:, None],
                popped["score"][:, None] + tok_lp,
                NEG,
            )
            n_new = jnp.minimum(popped["n_tok"], max_tokens - 1)
            base = popped["tokens"]                           # (B, U)
            child_tokens = jnp.broadcast_to(
                base[:, None], (b, w, max_tokens)
            ).at[jnp.arange(b)[:, None], jnp.arange(w)[None, :],
                 n_new[:, None]].set(toks)
            slot0 = w + e * w

            def put(arr, update):
                return jax.lax.dynamic_update_slice_in_dim(
                    arr, update.astype(arr.dtype), slot0, axis=1
                )

            a = {
                "score": put(a["score"], child_scores),
                "tokens": put(a["tokens"], child_tokens),
                "n_tok": put(
                    a["n_tok"], (popped["n_tok"] + 1)[:, None].repeat(w, 1)
                ),
                "last_tok": put(a["last_tok"], toks),
                "carry": jax.tree.map(
                    lambda arr, v: put(
                        arr,
                        jnp.broadcast_to(v[:, None], (b, w) + v.shape[1:]),
                    ),
                    a["carry"], new_carry,
                ),
                "lm_carry": jax.tree.map(
                    lambda arr, v: put(
                        arr,
                        jnp.broadcast_to(v[:, None], (b, w) + v.shape[1:]),
                    ),
                    a["lm_carry"], new_lm_carry,
                ),
            }
            return (a, pool)

        _, pool_final = jax.lax.fori_loop(0, w, pop, (a_set, pool))

        # frozen samples (t >= f_len) keep their previous beams
        def keep(new, old):
            m = active.reshape((b,) + (1,) * (new.ndim - 1))
            return jnp.where(m, new, old)

        next_beams = jax.tree.map(keep, pool_final, prev)
        return {"t": t + 1, "beams": next_beams}

    state = jax.lax.while_loop(
        lambda s: jnp.any(s["t"] < f_len),
        frame_body,
        {"t": jnp.zeros((b,), jnp.int32), "beams": beams},
    )

    # Length-normalised selection (reference transducer.py:326: the leading
    # blank makes len(prediction) == 1 + emitted tokens). argmax picks the
    # earliest slot on ties, like Python max over the B list.
    final = state["beams"]
    norm = jnp.where(
        final["score"] > NEG / 2,
        final["score"] / (1.0 + final["n_tok"].astype(jnp.float32)),
        NEG,
    )
    best = jnp.argmax(norm, axis=1)
    tokens = _slot_gather(final["tokens"], best)
    n_tok = jnp.take_along_axis(final["n_tok"], best[:, None], axis=1)[:, 0]
    return tokens, n_tok
