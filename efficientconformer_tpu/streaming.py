"""Chunked streaming inference runtime (overlap-save).

The reference implements the streaming *architecture* — causal convs,
``StreamingMask`` left/right context windows, attention KV hidden states
(reference models/attentions.py:576-581,1321-1403, models/encoders.py:68) —
but ships no incremental runtime: its evaluation always consumes the full
utterance. This module adds a TPU-native streaming session on top of the
*unmodified* encoder: overlap-save windows with static shapes, so the same
jit-compiled encoder program serves both batch and streaming paths (one XLA
compilation per window geometry, reused for the life of the session).

How it works
------------
Output frame ``j`` of the encoder is aligned to mel frame ``j * S`` (each
stride-2 stage maps output ``i`` to inputs centred at ``2 i``; the length
formula ``(l - 1) // 2 + 1`` preserves this), and mel frame ``m`` is centred
at sample ``m * hop``. A window that starts at mel frame ``base * S``
therefore computes absolute output frames ``base .. base + W``, and only the
interior ``chunk`` frames are emitted: ``history`` frames of left margin
re-establish attention/conv context, ``lookahead`` frames of right margin
absorb the subsampling convs' right context and the STFT edge effects.

Exactness: the emitted frames are numerically identical to the batch forward
on the zero-padded utterance once ``history`` covers the encoder's total
LEFT receptive field (``suggested_history_frames``) and ``lookahead`` covers
its total RIGHT receptive field (``suggested_lookahead_frames``). Causal
configs have right field 0 (lookahead 2 absorbs STFT edge effects only);
non-causal configs with finite ``right_context`` windows are exact at a fixed
emission delay of ``suggested_lookahead_frames`` — the retained-lookahead
mode. Full-context configs (every shipped one: left = right =
``max_pos_encoding``) have an unbounded right field, so bounded-latency
streaming is necessarily approximate for them; the boundary error decays
with ``lookahead`` and is measured in tests/test_streaming_runtime.py.

Group/block alignment: grouped attention (G) and local attention (K) tile
from absolute frame 0, so window starts are rounded down to keep every
stage's tiling phase identical to the full-utterance forward
(``_base_alignment``).

Decoding is incremental: CTC greedy collapse carries the previous non-blank
across chunks; transducer greedy decoding threads its decoder carry, joint
state and token buffer through ``models.transducer.greedy_decode_stream``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from efficientconformer_tpu.config import resolve_block_configs


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------


def _strides_per_stage(p: dict) -> list[int]:
    """Cumulative output-stride (in mel frames) entering each block."""
    s = 1
    out = []
    for b in resolve_block_configs(p):
        out.append(s)
        if b.stride > 1:
            s *= b.stride
    return out


def total_stride(p: dict) -> int:
    """Mel frames per encoder output frame (subsampling x block strides)."""
    s = 2 ** p.get("subsampling_layers", 1)
    for b in resolve_block_configs(p):
        if b.stride > 1:
            s *= b.stride
    return s


def _base_alignment(p: dict) -> int:
    """Window starts (in output frames) must keep every grouped/local
    attention stage's tiling phase: ``base * ratio ≡ 0 (mod G or K)`` where
    ``ratio`` is output frames per stage frame."""
    sub = 2 ** p.get("subsampling_layers", 1)
    s_out_mel = total_stride(p)
    align = 1
    for b, s_in in zip(resolve_block_configs(p), _strides_per_stage(p)):
        ratio = s_out_mel // (sub * s_in)  # output stride / stage stride
        for tile in (b.att_group_size, b.att_kernel_size or 1):
            if tile and tile > 1:
                align = math.lcm(align, tile // math.gcd(tile, ratio))
    return align


def suggested_lookahead_frames(p: dict) -> int:
    """Right receptive field of the whole encoder, in output frames — the
    retained lookahead that makes non-causal streaming EXACT: emit frame ``j``
    only once ``suggested_lookahead_frames`` future frames are in the window,
    so every attention window (``right_context``, reference
    models/attentions.py:1377-1403), same-padding conv right half, grouped /
    local tiling spill and the subsampling stack's right margin see the same
    future the batch forward sees.

    Causal configs need 0. Full-context configs (the 14 shipped ones:
    left = right = max_pos_encoding, reference models/encoders.py:68) return
    a value on the order of max_pos_encoding — i.e. "the whole utterance" —
    signalling that bounded-latency streaming is necessarily approximate for
    them; pick a finite ``lookahead_frames`` and measure the boundary error
    (tests/test_streaming_runtime.py does)."""
    if p.get("causal", False):
        return 0
    sub = 2 ** p.get("subsampling_layers", 1)
    s_out_mel = total_stride(p)
    right_att = p.get("right_context", p["max_pos_encoding"])
    total_mel = 2 * sub  # subsampling conv stack + STFT edge margin
    for b, s_in in zip(resolve_block_configs(p), _strides_per_stage(p)):
        stage_mel = sub * s_in
        # attention window + grouped/local tiling spill (a query's group /
        # local block may extend up to tile-1 frames past it) + conv right half
        right_ext = right_att + b.kernel_size // 2
        for tile in (b.att_group_size, b.att_kernel_size or 1):
            if tile and tile > 1:
                right_ext += tile - 1
        total_mel += right_ext * stage_mel
    return -(-total_mel // s_out_mel)  # ceil to output frames


def suggested_history_frames(p: dict) -> int:
    """Left receptive field of the whole encoder, in output frames: per block
    the attention left context (``left_context``, default full) plus the conv
    kernel, at that block's frame rate, summed and converted to output rate."""
    sub = 2 ** p.get("subsampling_layers", 1)
    s_out_mel = total_stride(p)
    left_att = p.get("left_context", p["max_pos_encoding"])
    total_mel = 2 * sub  # subsampling conv stack context (kernel 3, pad 1)
    for b, s_in in zip(resolve_block_configs(p), _strides_per_stage(p)):
        stage_mel = sub * s_in
        total_mel += (left_att + b.kernel_size) * stage_mel
    return -(-total_mel // s_out_mel)  # ceil to output frames


# ---------------------------------------------------------------------------
# encoder session
# ---------------------------------------------------------------------------


@dataclass
class Emission:
    """One window's worth of encoder output. ``frames`` is the DEVICE array
    for the whole window; the new frames are the local range
    ``[first, last)``, at absolute output-frame position ``start``. Consumers
    that stay on device (transducer decode) index ``frames`` directly; host
    consumers use ``valid`` (fetches only the emitted slice)."""

    frames: object               # device array (B, window_frames, ...)
    first: int
    last: int
    start: int                   # absolute frame index of `first`

    @property
    def valid(self) -> np.ndarray:
        return np.asarray(self.frames[:, self.first : self.last])


@dataclass
class StreamingEncoderSession:
    """Overlap-save streaming wrapper around any ``(audio, x_len) ->
    (frames, ...)`` encoder function.

    The rolling window lives ON DEVICE: each step uploads only the new chunk
    of samples and shifts the device buffer inside one jit program (host->
    device traffic per chunk is the chunk, not the window — through a
    tunnelled chip this is the difference between ~2.5 s and ~40 ms per
    step; on any host it is the minimal-transfer design). ``encode_fn`` may
    return anything whose leading result has a (B, frames, ...) layout —
    e.g. logits, encoder frames, or device argmax ids. Frame counts are in
    encoder *output* frames; sizes are converted to samples internally.
    """

    encode_fn: Callable         # (audio (B, T), x_len (B,)) -> (frames, ...)
    encoder_params: dict
    batch_size: int = 1
    chunk_frames: int = 16
    history_frames: Optional[int] = None
    lookahead_frames: int = 2

    def __post_init__(self):
        p = self.encoder_params
        self.hop = p["sample_rate"] * p["hop_length_ms"] // 1000
        self.stride = total_stride(p)                    # mel per output frame
        self.samples_per_frame = self.hop * self.stride  # samples per output
        if self.history_frames is None:
            self.history_frames = suggested_history_frames(p)
        self.align = _base_alignment(p)
        # round history and chunk UP to the tiling alignment: then the window
        # base advances by exactly chunk_frames per step and the device
        # buffer shifts by a constant chunk_samples (one compiled program)
        self.history_frames = -(-self.history_frames // self.align) * self.align
        self.chunk_frames = -(-self.chunk_frames // self.align) * self.align
        self.window_frames = (
            self.history_frames + self.chunk_frames + self.lookahead_frames
        )
        w_mel = self.window_frames * self.stride
        self.window_samples = (w_mel - 1) * self.hop
        self.chunk_samples = self.chunk_frames * self.samples_per_frame
        self._staged = np.zeros((self.batch_size, 0), np.float32)  # not uploaded
        self._received = 0       # samples pushed so far
        self._uploaded = 0       # absolute end of the device window
        self._dev_buf = None     # device (B, window_samples) rolling window
        self._step_fn = None
        self.emitted = 0         # output frames emitted so far
        self.finished = False

    # ---------------------------------------------------------------- sizes

    def _base(self) -> int:
        b = max(0, self.emitted - self.history_frames)
        return (b // self.align) * self.align

    def _need_samples(self, base: int) -> int:
        """Absolute sample count required to run the window at ``base``."""
        return base * self.samples_per_frame + self.window_samples

    # ---------------------------------------------------------------- device

    def _take_staged(self, n: int) -> np.ndarray:
        """Pop ``n`` samples from the staging buffer, zero-padding past the
        end of the received stream (finish-time tail windows)."""
        take = self._staged[:, :n]
        self._staged = self._staged[:, n:]
        if take.shape[1] < n:
            take = np.pad(take, ((0, 0), (0, n - take.shape[1])))
        return take

    def _advance_device_window(self, base: int):
        """Bring the device buffer to cover [base*spf, base*spf + window)."""
        target_end = self._need_samples(base)
        if self._dev_buf is None:
            window = self._take_staged(self.window_samples)
            self._dev_buf = jnp.asarray(window)
            self._uploaded = target_end
            return
        while self._uploaded < target_end:
            delta = min(self.chunk_samples, target_end - self._uploaded)
            chunk = jnp.asarray(self._take_staged(delta))
            if self._step_fn is None:
                self._step_fn = jax.jit(
                    lambda buf, new: jnp.concatenate(
                        [buf[:, new.shape[1] :], new], axis=1
                    )
                )
            self._dev_buf = self._step_fn(self._dev_buf, chunk)
            self._uploaded += delta

    # ---------------------------------------------------------------- push

    def push(self, samples: np.ndarray):
        """Feed (B, n) new samples; returns a list of ``Emission``s
        (possibly empty, possibly several)."""
        assert not self.finished
        samples = np.atleast_2d(np.asarray(samples, np.float32))
        assert samples.shape[0] == self.batch_size
        self._staged = np.concatenate([self._staged, samples], axis=1)
        self._received += samples.shape[1]
        out = []
        while True:
            base = self._base()
            if self._need_samples(base) > self._received:
                break
            out.append(self._run_window(base, x_len=None))
        return out

    def finish(self, x_len: Optional[np.ndarray] = None):
        """End of stream: process the tail (zero-padded windows with real
        lengths, so masks/length formulas behave exactly like the padded
        batch forward). Returns remaining emissions."""
        from efficientconformer_tpu.config import encoder_output_frames

        assert not self.finished
        self.finished = True
        if x_len is None:
            x_len = np.full((self.batch_size,), self._received, np.int64)
        x_len = np.asarray(x_len)
        total_out = int(encoder_output_frames(self.encoder_params, int(x_len.max())))
        out = []
        while self.emitted < total_out:
            base = self._base()
            out.append(self._run_window(base, x_len=x_len, total_out=total_out))
        return out

    # ---------------------------------------------------------------- window

    def _run_window(self, base: int, x_len, total_out: Optional[int] = None):
        self._advance_device_window(base)
        s0 = base * self.samples_per_frame
        if x_len is None:
            w_len = np.full((self.batch_size,), self.window_samples, np.int64)
        else:
            w_len = np.clip(x_len - s0, 0, self.window_samples)
        res = self.encode_fn(self._dev_buf, jnp.asarray(w_len))
        frames = res[0] if isinstance(res, (tuple, list)) else res

        first = self.emitted - base                       # local emit start
        if total_out is not None and base + self.window_frames >= total_out:
            last = total_out - base                       # final window: tail
        else:
            last = self.window_frames - self.lookahead_frames
        em = Emission(frames=frames, first=first, last=last, start=self.emitted)
        self.emitted = base + last
        return em


# ---------------------------------------------------------------------------
# recognizers
# ---------------------------------------------------------------------------


@dataclass
class StreamingCTC:
    """Streaming greedy CTC: session emissions -> incremental collapse
    (reference decode semantics, model_ctc.py:90-136, carried across chunks).
    If ``encode_fn`` returns logits, argmax runs on device and only the
    emitted id slice is fetched; an ``encode_fn`` that already returns
    argmax ids (B, frames) works too and fetches even less."""

    session: StreamingEncoderSession
    _prev: np.ndarray = field(init=False, default=None)
    tokens: list = field(init=False, default=None)

    def __post_init__(self):
        b = self.session.batch_size
        self._prev = np.full((b,), -1, np.int64)
        self.tokens = [[] for _ in range(b)]

    def _consume(self, emissions, caps=None):
        for em in emissions:
            ids = em.frames
            if ids.ndim == 3:
                ids = jnp.argmax(ids, axis=-1)            # on device
            preds = np.asarray(ids[:, em.first : em.last])  # fetch ints only
            for i in range(preds.shape[0]):
                cap = preds.shape[1] if caps is None else min(
                    preds.shape[1], caps[i] - em.start
                )
                for t in range(max(cap, 0)):
                    tok = int(preds[i, t])
                    if tok != 0 and tok != self._prev[i]:
                        self.tokens[i].append(tok)
                    self._prev[i] = tok

    def push(self, samples):
        self._consume(self.session.push(samples))
        return self.tokens

    def finish(self, x_len=None):
        caps = None
        if x_len is not None:
            from efficientconformer_tpu.config import encoder_output_frames

            caps = [
                encoder_output_frames(self.session.encoder_params, int(l))
                for l in np.atleast_1d(np.asarray(x_len))
            ]
        self._consume(self.session.finish(x_len), caps)
        return self.tokens


@dataclass
class StreamingTransducer:
    """Streaming greedy transducer decoding: the batched on-device greedy
    loop (models/transducer.py) runs per chunk with its decoder carry, joint
    state and token buffer threaded through the session."""

    model: object                 # models.transducer.Transducer
    variables: dict
    session: StreamingEncoderSession
    max_tokens: int = 256
    max_consec_dec_steps: int = 5
    _state: object = field(init=False, default=None)

    def _consume(self, emissions, caps=None):
        from efficientconformer_tpu.models.transducer import greedy_decode_stream

        for em in emissions:
            b = em.frames.shape[0]
            # frames stay on device: the decode loop walks the window's
            # [first, last) range via f_start / f_len
            f_start = jnp.full((b,), em.first, jnp.int32)
            if caps is None:
                f_len = jnp.full((b,), em.last, jnp.int32)
            else:
                f_len = jnp.clip(
                    jnp.asarray(caps, jnp.int32) - (em.start - em.first),
                    em.first, em.last,
                )
            self._state = greedy_decode_stream(
                self.model, self.variables, em.frames, f_len,
                self._state, f_start=f_start, max_tokens=self.max_tokens,
                max_consec_dec_steps=self.max_consec_dec_steps,
            )

    def _tokens(self):
        if self._state is None:
            b = self.session.batch_size
            return np.zeros((b, 0), np.int32), np.zeros((b,), np.int32)
        return np.asarray(self._state["tokens"]), np.asarray(self._state["n_tok"])

    def push(self, samples):
        self._consume(self.session.push(samples))
        return self._tokens()

    def finish(self, x_len=None):
        caps = None
        if x_len is not None:
            from efficientconformer_tpu.config import encoder_output_frames

            caps = [
                encoder_output_frames(self.session.encoder_params, int(l))
                for l in np.atleast_1d(np.asarray(x_len))
            ]
        self._consume(self.session.finish(x_len), caps)
        return self._tokens()
