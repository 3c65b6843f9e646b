"""Transducer model (reference models/transducer.py).

Encoder + prediction network + joint. The training pass produces the full
(B, T, U+1, V) joint lattice for the RNN-T loss. Greedy decoding is a single
jit-compiled ``lax.while_loop`` over lock-stepped per-sample state machines —
the reference's per-sample host Python loop (transducer.py:139-186) is the #1
latency bottleneck this redesign removes. Two exact implementations of the
same state machine: "frame" (one iteration per frame/emission, tiny (B, D)
matmuls) and the default "label" (label-looping: one iteration per EMISSION,
the joint evaluated for all frames per iteration as one MXU-shaped (B, T, V)
matmul and blank runs skipped in a single step — see ``_greedy_label_loop``).
Beam search with LM fusion lives in ``decoding/rnnt_beam.py``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from efficientconformer_tpu.models.decoders import DECODERS
from efficientconformer_tpu.models.encoders import ConformerEncoder
from efficientconformer_tpu.models.joint_networks import JointNetwork


class Transducer(nn.Module):
    encoder_params: dict
    decoder_params: dict
    joint_params: dict
    vocab_size: int
    vn_std: Optional[float] = None   # variational noise on the prediction net

    def setup(self):
        self.encoder = ConformerEncoder(params=self.encoder_params, name="encoder")
        self.decoder = DECODERS[self.decoder_params["arch"]](
            params=self.decoder_params, vn_std=self.vn_std, name="decoder"
        )
        self.joint_network = JointNetwork(
            vocab_size=self.vocab_size,
            params=self.joint_params,
            vn_std=self.vn_std,
            name="joint_network",
        )

    def __call__(self, x, y, x_len, y_len, train: bool = False):
        """Full lattice pass for training.

        y (B, U) labels; a leading blank is prepended internally
        (reference transducer.py:96-98). Returns (logits (B, T, U+1, V), f_len).
        """
        f, f_len, _ = self.encoder(x, x_len, train)
        y_in = jnp.pad(y, ((0, 0), (1, 0)))  # blank-start
        g = self.decoder(y_in, y_len + 1, train)
        logits = self.joint_network(f, g)
        return logits, f_len

    def encode(self, x, x_len, train: bool = False):
        return self.encoder(x, x_len, train)

    def decode_step(self, y_t, carry):
        """One prediction-network step: (B,) tokens -> ((B, Dd), carry)."""
        return self.decoder.step(y_t, carry)

    def joint_step(self, f_t, g_t):
        """(B, De) x (B, Dd) -> (B, V)."""
        return self.joint_network.step(f_t, g_t)

    def joint_project(self, f):
        """(B, T, De) -> (B, T, Dj) pre-projected frames for joint_row."""
        return self.joint_network.project_encoder(f)

    def joint_row(self, pf, g_t):
        """(B, T, Dj) x (B, Dd) -> (B, T, V): one decoder state vs all frames."""
        return self.joint_network.row(pf, g_t)

    def decoder_init_carry(self, batch: int):
        return self.decoder.init_carry(batch)


def greedy_decode(
    model: Transducer,
    variables,
    x: jnp.ndarray,
    x_len: jnp.ndarray,
    max_tokens: int,
    max_consec_dec_steps: int = 5,
    algo: str = "label",
):
    """Batched label-synchronous greedy decode, fully on device.

    Per-sample state machine (semantics of reference transducer.py:148-186):
    at (frame t, decoder output g): pred = argmax joint(f_t, g);
    blank or consecutive-emission cap -> advance frame; token -> append token,
    advance decoder. All samples step in lock-step inside one lax.while_loop;
    finished samples idle until the last one drains.

    ``algo``: "label" (default; label-looping — one iteration per emission,
    blanks skipped in batched joint rows, see ``_greedy_label_loop``) or
    "frame" (frame-synchronous, one iteration per frame/emission). Both are
    exact implementations of the same state machine; tests assert equality.

    Returns (tokens (B, max_tokens), counts (B,)).
    """
    key = (id(model), max_tokens, max_consec_dec_steps, algo)
    fn = _DECODE_CACHE.get(key)
    if fn is None:
        fn = jax.jit(
            functools.partial(
                _greedy_decode_impl,
                model=model,
                max_tokens=max_tokens,
                max_consec_dec_steps=max_consec_dec_steps,
                algo=algo,
            )
        )
        _DECODE_CACHE[key] = fn
    return fn(variables, x, x_len)


_DECODE_CACHE: dict = {}
_GREEDY_LOOPS = {"frame": None, "label": None}  # filled after definitions


def _greedy_decode_impl(
    variables, x, x_len, *, model, max_tokens, max_consec_dec_steps, algo
):
    f, f_len, _ = model.apply(variables, x, x_len, False, method=Transducer.encode)
    state = _greedy_init_state(model, variables, f.shape[0], max_tokens)
    out = _GREEDY_LOOPS[algo](
        variables, f, f_len, state, model=model, max_tokens=max_tokens,
        max_consec_dec_steps=max_consec_dec_steps,
    )
    return out["tokens"], out["n_tok"]


def _greedy_init_state(model, variables, b: int, max_tokens: int):
    carry0 = model.apply(variables, b, method=Transducer.decoder_init_carry)
    g0, carry0 = model.apply(
        variables, jnp.zeros((b,), jnp.int32), carry0,
        method=Transducer.decode_step,
    )
    return dict(
        consec=jnp.zeros((b,), jnp.int32),
        g=g0,
        carry=carry0,
        tokens=jnp.zeros((b, max_tokens), jnp.int32),
        n_tok=jnp.zeros((b,), jnp.int32),
    )


def greedy_decode_stream(
    model,
    variables,
    f: jnp.ndarray,
    f_len: jnp.ndarray,
    state=None,
    *,
    f_start=None,
    max_tokens: int,
    max_consec_dec_steps: int = 5,
    algo: str = "label",
):
    """Chunk-streaming variant of the greedy loop: decodes the encoder frames
    ``f[:, f_start:f_len]`` (per sample) starting from a carried ``state``
    (decoder carry, last decoder output, consecutive-emission counter, token
    buffer) and returns the new state. Frame-sequential per sample, so
    running chunk-by-chunk produces exactly the full-utterance decode;
    ``f`` can stay on device as a whole streaming window
    (streaming.StreamingTransducer). ``algo`` as in ``greedy_decode``."""
    if state is None:
        state = _greedy_init_state(model, variables, f.shape[0], max_tokens)
    if f_start is None:
        f_start = jnp.zeros((f.shape[0],), jnp.int32)
    key = (id(model), max_tokens, max_consec_dec_steps, "stream", algo)
    fn = _DECODE_CACHE.get(key)
    if fn is None:
        fn = jax.jit(
            functools.partial(
                _GREEDY_LOOPS[algo],
                model=model,
                max_tokens=max_tokens,
                max_consec_dec_steps=max_consec_dec_steps,
            )
        )
        _DECODE_CACHE[key] = fn
    return fn(variables, f, f_len, state, f_start)


def _greedy_frames_loop(
    variables, f, f_len, init, f_start=None, *, model, max_tokens,
    max_consec_dec_steps
):
    b = f.shape[0]

    def dec_step(tok, carry):
        return model.apply(variables, tok, carry, method=Transducer.decode_step)

    def joint_step(f_t, g_t):
        return model.apply(variables, f_t, g_t, method=Transducer.joint_step)

    t0 = jnp.zeros((b,), jnp.int32) if f_start is None else f_start
    state = dict(t=t0, **init)

    def cond(s):
        return jnp.any(s["t"] < f_len)

    def body(s):
        active = s["t"] < f_len
        f_t = f[jnp.arange(b), jnp.minimum(s["t"], f.shape[1] - 1)]
        logits = joint_step(f_t, s["g"])
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        emit = (
            active
            & (pred != 0)
            & (s["consec"] < max_consec_dec_steps)
            & (s["n_tok"] < max_tokens)
        )
        advance = active & ~emit

        # commit emitted tokens
        pos = jnp.where(emit, s["n_tok"], max_tokens)
        tokens = s["tokens"].at[jnp.arange(b), pos].set(pred, mode="drop")
        n_tok = s["n_tok"] + emit.astype(jnp.int32)

        # advance prediction net only where a token was emitted
        g_new, carry_new = dec_step(jnp.where(emit, pred, 0), s["carry"])
        g = jnp.where(emit[:, None], g_new, s["g"])
        carry = jax.tree.map(
            lambda new, old: jnp.where(_bcast(emit, new), new, old),
            carry_new,
            s["carry"],
        )

        return dict(
            t=s["t"] + advance.astype(jnp.int32),
            consec=jnp.where(emit, s["consec"] + 1, 0),
            g=g,
            carry=carry,
            tokens=tokens,
            n_tok=n_tok,
        )

    out = jax.lax.while_loop(cond, body, state)
    out.pop("t")
    return out


def _greedy_label_loop(
    variables, f, f_len, init, f_start=None, *, model, max_tokens,
    max_consec_dec_steps
):
    """Label-looping greedy decode: iterate per EMISSION, not per frame.

    The frame-synchronous loop (``_greedy_frames_loop``) runs one while-loop
    iteration per frame-advance *or* emission, each doing (B, D)-sized matmuls
    — latency-bound on TPU (the MXU idles between tiny sequential steps). The
    key observation (NeMo's label-looping, also Seki et al. 2019): between two
    emissions the decoder state g is CONSTANT, so the joint over every frame
    can be computed in ONE batched (B, T, V) matmul and the blank run skipped
    in a single step. Iterations ≈ max tokens emitted per sample (+1), ~3-5x
    fewer than frames+tokens for speech, and each iteration is MXU-shaped.

    State-machine equivalence with the frame-sync loop (asserted in
    tests/test_models.py): at state (t, consec, g), the frame-sync loop
    advances through blank frames with g unchanged until the first frame j
    where argmax(joint(f_j, g)) != blank (scanning from t if consec < cap,
    else t+1 — the consecutive-emission cap forces one advance), then emits
    there: consec' = consec+1 if j == t else 1. If no such frame (or the
    token budget is spent), it advances to f_len with consec reset — exactly
    what this loop computes per iteration.
    """
    b, T = f.shape[0], f.shape[1]

    def dec_step(tok, carry):
        return model.apply(variables, tok, carry, method=Transducer.decode_step)

    pf = model.apply(variables, f, method=Transducer.joint_project)

    def joint_row(g_t):
        return model.apply(variables, pf, g_t, method=Transducer.joint_row)

    t0 = jnp.zeros((b,), jnp.int32) if f_start is None else f_start
    f_len = f_len.astype(jnp.int32)
    state = dict(t=t0, **init)
    frames = jnp.arange(T, dtype=jnp.int32)[None, :]

    def cond(s):
        return jnp.any(s["t"] < f_len)

    def body(s):
        t_star = jnp.where(
            s["consec"] >= max_consec_dec_steps, s["t"] + 1, s["t"]
        )
        pred = jnp.argmax(joint_row(s["g"]), axis=-1).astype(jnp.int32)
        nonblank = (
            (frames >= t_star[:, None])
            & (frames < f_len[:, None])
            & (pred != 0)
        )
        has = jnp.any(nonblank, axis=1)
        j = jnp.argmax(nonblank, axis=1).astype(jnp.int32)
        emit = has & (s["n_tok"] < max_tokens) & (s["t"] < f_len)
        if max_consec_dec_steps < 1:
            # degenerate static cap: the frame-sync loop (consec < cap never
            # true) emits nothing — match it instead of emitting at t+1
            emit = emit & False
        tok = pred[jnp.arange(b), j]

        pos = jnp.where(emit, s["n_tok"], max_tokens)
        tokens = s["tokens"].at[jnp.arange(b), pos].set(tok, mode="drop")
        n_tok = s["n_tok"] + emit.astype(jnp.int32)

        g_new, carry_new = dec_step(jnp.where(emit, tok, 0), s["carry"])
        g = jnp.where(emit[:, None], g_new, s["g"])
        carry = jax.tree.map(
            lambda new, old: jnp.where(_bcast(emit, new), new, old),
            carry_new,
            s["carry"],
        )

        return dict(
            t=jnp.where(emit, j, f_len),
            consec=jnp.where(
                emit, jnp.where(j == s["t"], s["consec"] + 1, 1), 0
            ),
            g=g,
            carry=carry,
            tokens=tokens,
            n_tok=n_tok,
        )

    out = jax.lax.while_loop(cond, body, state)
    out.pop("t")
    return out


def _bcast(emit: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a (B,) bool along the batch axis of ``target``.

    Decoder carries are either (num_layers, B, H) LSTM states or (B, Th, D)
    KV caches; the batch axis is the one matching emit's length."""
    for axis in range(target.ndim):
        if target.shape[axis] == emit.shape[0]:
            shape = [1] * target.ndim
            shape[axis] = emit.shape[0]
            return emit.reshape(shape)
    raise ValueError(f"no batch axis in {target.shape}")


_GREEDY_LOOPS["frame"] = _greedy_frames_loop
_GREEDY_LOOPS["label"] = _greedy_label_loop
