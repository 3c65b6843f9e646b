"""Fully on-device transducer beam search.

One jit-compiled program: encode -> ``lax.while_loop`` over encoder frames,
with the frame's expansion loop run as EXACT sequential pops, lock-stepped
across the batch. This reproduces the host implementation
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

Structural optimisation — the **blank-coasting fast path** (EXACT, changes no
outcome): a hypothesis's replay ``dec_step(last_token, lagging_carry)`` — the
decoder output ``g``, the post-replay carry, and (under fusion) the LM
log-softmax — depends only on the token history, never on the frame, so every
frame-boundary beam slot caches them from the pop that created it. Each frame
then starts with ONE batched joint over the cached ``g``s, giving the fused
extension log-probs of all W frame-initial hypotheses. If for every sample
``max_i child_prio_i <= min_i prio_i`` (the best possible token extension
cannot outrank any frame-initial hypothesis — ties lose to frame-initial
hyps, which precede children in A slot order), the W pops provably pop
exactly the frame-initial beams in priority order and only their blank
extensions survive: the frame reduces to ``score += logp(blank)`` under that
permutation, with no prediction-network work at all. Such frames run in an
inner ``lax.while_loop`` with a tiny body; the full pop loop runs only for
frames where a token extension is in contention. ``lax.cond`` is deliberately
NOT used: on TPU its fixed per-iteration cost exceeds the work it would skip
at these shapes (measured; see NOTES_ROUND2.md).

The payoff is latency: the host pays a device round trip per pop
(W * T_frames round trips per batch); here the entire search is one XLA
program, and blank-coasting frames (the common case for trained models,
especially at small batch) skip their W sequential pops entirely.

Optional neural-LM shallow fusion (reference transducer.py:260-273) for LMs
with fixed-shape carries (RNN LMs, or Transformer LMs via the static-capacity
KV cache): logP += lm_weight * log_softmax(lm_logits / lm_tmp) over the full
vocabulary, blank included, exactly like the reference.
"""

from __future__ import annotations

import functools
from typing import List

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
    ngram=None,
    ngram_alpha: float = 0.0,
    ngram_beta: float = 0.0,
    ref_topk: bool = False,
) -> List[List[int]]:
    """Returns decoded token id sequences (list per batch element).

    ``ref_topk=True`` switches the expansion routing to the reference's raw
    top-k semantics (reference transducer.py:275-319, see rnnt_beam.py): one
    top-``beam_size`` over the full fused vocabulary per pop; the popped
    hypothesis extends into B only when blank is inside that top-k. The pop
    loop then needs a dynamic trip count (a pop may add nothing to B); it is
    capped at ``3 * beam_size`` pops per frame — exact as long as every frame
    fills its B within the cap (guaranteed in the trained-model regime where
    blank dominates; the host ``ref_topk`` raises on cap-hit, and the parity
    suite cross-checks the two).

    ``ngram`` is a decoding.ngram_device.DeviceNgram (an ArpaLM is converted
    automatically): kenlm-style rescoring of token extensions
    (reference transducer.py:309-317) runs entirely on device. The LM state
    is NOT threaded through the beam carries — it is rebuilt per pop from
    the popped hypothesis's token buffer (DeviceNgram.context_node), which
    is exact and avoids a measured ~150x nested-loop slowdown that ANY extra
    carried per-slot array incurs on v5e."""
    if ngram is not None and ngram_alpha:
        from efficientconformer_tpu.decoding.ngram_device import as_device_ngram

        ngram = as_device_ngram(ngram, model.vocab_size)
    else:
        ngram = None
    key = (id(model), beam_size, max_tokens,
           id(lm_model) if lm_model is not None else None,
           float(lm_weight), float(lm_tmp), float(tmp),
           id(ngram) if ngram is not None else None,
           float(ngram_alpha), float(ngram_beta), bool(ref_topk))
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
                ngram=ngram,
                ngram_alpha=ngram_alpha,
                ngram_beta=ngram_beta,
                ref_topk=ref_topk,
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
        return a.at[jnp.arange(b), idx].set(v.astype(a.dtype))
    return jax.tree.map(s, tree, value)


def _slot_permute(tree, order):
    """Leaves (B, W, ...), order (B, W) -> slots reordered per sample."""
    def g(a):
        ix = order.reshape(order.shape + (1,) * (a.ndim - 2))
        return jnp.take_along_axis(a, ix, axis=1)
    return jax.tree.map(g, tree)


def _tile_slots(tree, n):
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a[:, None], (a.shape[0], n) + a.shape[1:]),
        tree,
    )


def _pad_slots(tree, pad):
    return jax.tree.map(
        lambda a: jnp.pad(a, ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2)),
        tree,
    )


def _beam_impl(variables, lm_variables, x, x_len, *, model, beam_size, tmp,
               max_tokens, lm_model, lm_weight, lm_tmp,
               ngram=None, ngram_alpha=0.0, ngram_beta=0.0, ref_topk=False):
    f, f_len, _ = model.apply(variables, x, x_len, False, method=Transducer.encode)
    b = f.shape[0]
    w = beam_size
    pop_cap = 3 * w if ref_topk else w  # pops per frame (Graves: exactly W)
    cap = w + pop_cap * w               # frame-initial W + W children per pop
    use_lm = lm_model is not None and lm_weight
    use_ng = ngram is not None and ngram_alpha
    if use_ng:
        # exact static upper bound on one extension's n-gram contribution,
        # for the blank-coasting predicate
        ng_bound = ngram_beta + (
            ngram_alpha * ngram.score_max
            if ngram_alpha >= 0
            else ngram_alpha * ngram.score_min
        )

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

    dec_init = _carry_store(dec_template, dec_moved)

    # Replay of the start hypothesis (last_tok = 0 on the initial carry) —
    # cached into every initial beam slot, like any later pop would cache it.
    zeros_tok = jnp.zeros((b,), jnp.int32)
    g0, nc0 = dec_step(zeros_tok, dec_init)
    if use_lm:
        lm_logits0, lm_nc0 = lm_step(zeros_tok, lm_init)
        lm_lp0 = jax.nn.log_softmax(
            lm_logits0.astype(jnp.float32) / lm_tmp, axis=-1
        )

    # Frame-boundary beam state (the host's B list), W slots in arrival order.
    # Per slot: token history, the LAGGING decoder/LM carries (the state
    # BEFORE last_tok — replayed by the pop loop), and the CACHED replay
    # products (decoder output g, post-replay carries, LM log-softmax) that
    # power the fast path and seed children without recomputation.
    beams = {
        "score": jnp.where(jnp.arange(w)[None, :] == 0, 0.0, NEG)
        * jnp.ones((b, 1)),
        "tokens": jnp.zeros((b, w, max_tokens), jnp.int32),
        "n_tok": jnp.zeros((b, w), jnp.int32),
        "last_tok": jnp.zeros((b, w), jnp.int32),
        "carry": _tile_slots(dec_init, w),       # lagging
        "g": _tile_slots(g0, w),                 # cached replay products
        "carry_next": _tile_slots(nc0, w),
    }
    if use_lm:
        beams["lm_carry"] = _tile_slots(lm_init, w)      # lagging
        beams["lm_lp"] = _tile_slots(lm_lp0, w)
        beams["lm_carry_next"] = _tile_slots(lm_nc0, w)

    def frame_inputs(t, bm):
        """Per-frame precomputation from the cached replay products: the
        fused extension log-probs of every frame-initial hypothesis (one
        batched joint — no prediction-network work) and the exact
        fast-path predicate."""
        f_t = f[jnp.arange(b), jnp.minimum(t, f.shape[1] - 1)]
        active = t < f_len
        f_w = jnp.broadcast_to(f_t[:, None], (b, w) + f_t.shape[1:])
        logits0 = joint_step(f_w, bm["g"]) / tmp          # (B, W, V)
        fused0 = jax.nn.log_softmax(logits0.astype(jnp.float32), axis=-1)
        if use_lm:
            fused0 = fused0 + lm_weight * bm["lm_lp"]

        valid = bm["score"] > NEG / 2
        n_f = bm["n_tok"].astype(jnp.float32)
        prio = jnp.where(valid, bm["score"] / (1.0 + n_f), NEG)
        best_tok_lp = jnp.max(fused0[..., 1:], axis=-1)
        if use_ng:
            best_tok_lp = best_tok_lp + ng_bound
        child_prio = jnp.where(
            valid & (bm["n_tok"] < max_tokens),
            (bm["score"] + best_tok_lp) / (2.0 + n_f),
            NEG,
        )
        fast_b = jnp.all(valid, axis=1) & (
            jnp.max(child_prio, axis=1) <= jnp.min(prio, axis=1)
        )
        if ref_topk:
            # the fast path additionally requires blank inside the top-W of
            # every frame-initial hypothesis's fused log-probs (else a pop
            # would emit nothing into B); blank (index 0) wins value ties
            n_greater = jnp.sum(fused0[..., 1:] > fused0[..., :1], axis=-1)
            fast_b = fast_b & jnp.all(n_greater <= w - 1, axis=1)
        fast = jnp.all(fast_b | ~active)
        return f_t, active, fused0, prio, fast

    def keep_active(active, new, old):
        def k(nv, ov):
            m = active.reshape((b,) + (1,) * (nv.ndim - 1))
            return jnp.where(m, nv, ov)
        return jax.tree.map(k, new, old)

    def fast_frame(s):
        """All W pops provably pop the frame-initial beams in priority order
        (earliest slot on ties) and only blank extensions survive: apply the
        permutation and the blank score in O(W) vector ops."""
        prev = s["beams"]
        order = jnp.argsort(-s["prio"], axis=1)           # stable
        nb = _slot_permute(prev, order)
        nb["score"] = jnp.take_along_axis(
            prev["score"] + s["fused0"][..., 0], order, axis=1
        )
        nb = keep_active(s["active"], nb, prev)
        t = s["t"] + s["active"].astype(jnp.int32)
        f_t, active, fused0, prio, fast = frame_inputs(t, nb)
        return {"t": t, "beams": nb, "f_t": f_t, "active": active,
                "fused0": fused0, "prio": prio, "fast": fast}

    def slow_frame(s):
        """The exact sequential pop loop. Every pop replays the popped
        hypothesis's last token through the prediction network (and LM);
        frame-initial pops take their extension log-probs from the batched
        ``fused0`` (numerically identical input to the fast-path predicate),
        child pops from their own replay."""
        prev = s["beams"]
        f_t, active, fused0 = s["f_t"], s["active"], s["fused0"]
        pad = cap - w
        a_set = {
            "score": jnp.pad(prev["score"], ((0, 0), (0, pad)),
                             constant_values=NEG),
            "tokens": jnp.pad(prev["tokens"], ((0, 0), (0, pad), (0, 0))),
            "n_tok": jnp.pad(prev["n_tok"], ((0, 0), (0, pad))),
            "last_tok": jnp.pad(prev["last_tok"], ((0, 0), (0, pad))),
            "carry": _pad_slots(prev["carry"], pad),
        }
        if use_lm:
            a_set["lm_carry"] = _pad_slots(prev["lm_carry"], pad)
        pool = jax.tree.map(jnp.zeros_like, prev)
        pool["score"] = jnp.full((b, w), NEG)

        def pop(carry):
            a_in, pool, b_count, e = carry
            # samples still filling their B pool this frame (Graves: every
            # pop emits, so b_count == e and this is just ``active``)
            frame_active = active & (b_count < w)
            # ---- pop the best hypothesis (norm score, earliest index wins
            # ties, matching Python max over the ordered list)
            prio_a = jnp.where(
                a_in["score"] > NEG / 2,
                a_in["score"] / (1.0 + a_in["n_tok"].astype(jnp.float32)),
                NEG,
            )
            p = jnp.argmax(prio_a, axis=1)                # (B,)
            popped = {k: _slot_gather(a_in[k], p) for k in a_in}
            a = dict(a_in, score=a_in["score"].at[jnp.arange(b), p].set(NEG))

            # ---- replay the popped hyp's last token (host lagging-state
            # convention); frame-initial slots (p < w) swap in their cached
            # batched-joint log-probs so predicate and execution agree
            is_ini = p < w
            p_ini = jnp.minimum(p, w - 1)
            g_c, nc_c = dec_step(popped["last_tok"], popped["carry"])
            logits_c = joint_step(f_t, g_c) / tmp
            logp = jax.nn.log_softmax(logits_c.astype(jnp.float32), axis=-1)
            logp = jnp.where(
                is_ini[:, None], fused0[jnp.arange(b), p_ini], logp
            )
            if use_lm:
                lm_logits_c, lm_nc_c = lm_step(
                    popped["last_tok"], popped["lm_carry"]
                )
                lm_lp = jax.nn.log_softmax(
                    lm_logits_c.astype(jnp.float32) / lm_tmp, axis=-1
                )
                logp = jnp.where(
                    is_ini[:, None], logp, logp + lm_weight * lm_lp
                )

            # ---- routing: which labels extend into A, and whether this pop
            # emits a blank extension into B
            if ref_topk:
                # reference semantics: ONE top-W over the full vocab; blank
                # extends into B only when inside it (its top-k slot is then
                # dead as a child); lax.top_k ties resolve to the lowest
                # index, so blank wins value ties like torch.topk
                tok_lp, toks = jax.lax.top_k(logp, w)      # (B, W)
                blank_pos = toks == 0
                emit = jnp.any(blank_pos, axis=1) & frame_active
            else:
                tok_lp, toks = jax.lax.top_k(logp[:, 1:], w)
                toks = toks + 1
                blank_pos = jnp.zeros_like(toks, dtype=bool)
                emit = frame_active

            # ---- blank extension -> pool slot b_count (arrival order; in
            # Graves mode b_count == e), with the replay products cached for
            # the fast path of later frames
            e_idx = b_count
            entry = {
                "score": popped["score"] + logp[:, 0],
                "tokens": popped["tokens"],
                "n_tok": popped["n_tok"],
                "last_tok": popped["last_tok"],
                "carry": popped["carry"],
                "g": g_c,
                "carry_next": nc_c,
            }
            if use_lm:
                entry["lm_carry"] = popped["lm_carry"]
                entry["lm_lp"] = lm_lp
                entry["lm_carry_next"] = lm_nc_c
            pool = keep_active(emit, _slot_set(pool, e_idx, entry), pool)

            # ---- top-W token extensions -> A slots [w+e*w : w+(e+1)*w];
            # their lagging carry is the popped hyp's post-replay carry
            if use_ng:
                # kenlm-style rescoring of the chosen extensions (host
                # rnnt_beam.py / reference transducer.py:309-317: applied
                # AFTER top-k candidate selection, to each created hyp).
                # Context node rebuilt from the popped token buffer — no LM
                # state in the beam carries (see beam_search_device).
                ctx = ngram.context_node(popped["tokens"], popped["n_tok"])
                ng_sc = ngram.score_from(
                    jnp.broadcast_to(ctx[:, None], (b, w)), toks
                )
                tok_lp = tok_lp + ngram_alpha * ng_sc + ngram_beta
            child_scores = jnp.where(
                (popped["n_tok"] < max_tokens)[:, None] & ~blank_pos,
                popped["score"][:, None] + tok_lp,
                NEG,
            )
            n_new = jnp.minimum(popped["n_tok"], max_tokens - 1)
            base = popped["tokens"]                        # (B, U)
            child_tokens = jnp.broadcast_to(
                base[:, None], (b, w, max_tokens)
            ).at[jnp.arange(b)[:, None], jnp.arange(w)[None, :],
                 n_new[:, None]].set(toks)
            slot0 = w + e * w

            def put(arr, update):
                return jax.lax.dynamic_update_slice_in_dim(
                    arr, update.astype(arr.dtype), slot0, axis=1
                )

            def put_bcast(arr, v):
                return put(
                    arr, jnp.broadcast_to(v[:, None], (b, w) + v.shape[1:])
                )

            a_next = {
                "score": put(a["score"], child_scores),
                "tokens": put(a["tokens"], child_tokens),
                "n_tok": put(
                    a["n_tok"], (popped["n_tok"] + 1)[:, None].repeat(w, 1)
                ),
                "last_tok": put(a["last_tok"], toks),
                "carry": jax.tree.map(put_bcast, a["carry"], nc_c),
            }
            if use_lm:
                a_next["lm_carry"] = jax.tree.map(
                    put_bcast, a["lm_carry"], lm_nc_c
                )
            # samples done with their frame (or inactive) keep their state
            a_next = keep_active(frame_active, a_next, a_in)
            return (a_next, pool, b_count + emit.astype(jnp.int32), e + 1)

        def pops_left(carry):
            _, _, b_count, e = carry
            if ref_topk:
                return (e < pop_cap) & jnp.any(active & (b_count < w))
            return e < w

        _, pool_final, _, _ = jax.lax.while_loop(
            pops_left, pop,
            (a_set, pool, jnp.zeros((b,), jnp.int32), jnp.int32(0)),
        )

        nb = keep_active(active, pool_final, prev)
        t = s["t"] + active.astype(jnp.int32)
        f_t, active, fused0, prio, fast = frame_inputs(t, nb)
        return {"t": t, "beams": nb, "f_t": f_t, "active": active,
                "fused0": fused0, "prio": prio, "fast": fast}

    t0 = jnp.zeros((b,), jnp.int32)
    f_t0, active0, fused00, prio0, fast0 = frame_inputs(t0, beams)
    state = {"t": t0, "beams": beams, "f_t": f_t0, "active": active0,
             "fused0": fused00, "prio": prio0, "fast": fast0}

    def any_left(s):
        return jnp.any(s["t"] < f_len)

    def outer_body(s):
        # run consecutive provably-blank-coasting frames with the tiny body
        s = jax.lax.while_loop(
            lambda ss: ss["fast"] & jnp.any(ss["t"] < f_len),
            fast_frame,
            s,
        )
        # then one full pop-loop frame (a no-op via keep_active when the
        # fast run exhausted all samples — at most one spurious frame)
        return slow_frame(s)

    state = jax.lax.while_loop(any_left, outer_body, state)

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
