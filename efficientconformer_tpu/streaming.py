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

Exactness: with a causal config (``causal: true``, finite ``left_context``)
the emitted frames are numerically identical to the batch forward on the
zero-padded utterance once ``history`` covers the encoder's total left
receptive field (sum of per-block attention left context and conv kernels,
see ``suggested_history_frames``). Non-causal configs stream too, but frames
near the chunk boundary see a truncated future context — the standard
latency/accuracy trade-off; larger ``lookahead`` tightens it.

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
class StreamingEncoderSession:
    """Overlap-save streaming wrapper around any ``(audio, x_len) ->
    (frames, f_len, ...)`` encoder function.

    ``encode_fn`` is jit-compiled by the caller (or plain; shapes are static
    per session so jit caches one executable). Frame counts are in encoder
    *output* frames; sizes are converted to samples internally.
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
        # round history UP so aligned bases never shrink the margin
        self.history_frames = -(-self.history_frames // self.align) * self.align
        self.window_frames = (
            self.history_frames + self.chunk_frames + self.lookahead_frames
        )
        assert self.chunk_frames >= self.align, (
            f"chunk_frames must be >= the tiling alignment ({self.align})"
        )
        w_mel = self.window_frames * self.stride
        self.window_samples = (w_mel - 1) * self.hop
        self._buf = np.zeros((self.batch_size, 0), np.float32)
        self._buf_start = 0      # absolute sample index of _buf[:, 0]
        self._received = 0       # samples pushed so far
        self.emitted = 0         # output frames emitted so far
        self.finished = False

    # ---------------------------------------------------------------- sizes

    def _base(self) -> int:
        b = max(0, self.emitted - self.history_frames)
        return (b // self.align) * self.align

    def _need_samples(self, base: int) -> int:
        """Samples required (absolute) to run the window starting at
        output frame ``base``."""
        return base * self.samples_per_frame + self.window_samples

    # ---------------------------------------------------------------- push

    def push(self, samples: np.ndarray):
        """Feed (B, n) new samples; returns a list of (frames (B, c, D),
        start_frame) emissions (possibly empty, possibly several)."""
        assert not self.finished
        samples = np.atleast_2d(np.asarray(samples, np.float32))
        assert samples.shape[0] == self.batch_size
        self._buf = np.concatenate([self._buf, samples], axis=1)
        self._received += samples.shape[1]
        out = []
        while True:
            base = self._base()
            if self._need_samples(base) > self._received:
                break
            out.append(self._run_window(base, x_len=None))
        # drop samples the (monotonic) window start can no longer reach
        keep_from = self._base() * self.samples_per_frame
        if keep_from > self._buf_start:
            self._buf = self._buf[:, keep_from - self._buf_start :]
            self._buf_start = keep_from
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
        s0 = base * self.samples_per_frame
        rel = s0 - self._buf_start
        assert rel >= 0, "window start trimmed away (emitted went backwards?)"
        window = self._buf[:, rel : rel + self.window_samples]
        if window.shape[1] < self.window_samples:
            window = np.pad(
                window, ((0, 0), (0, self.window_samples - window.shape[1]))
            )
        if x_len is None:
            w_len = np.full((self.batch_size,), self.window_samples, np.int64)
        else:
            w_len = np.clip(x_len - s0, 0, self.window_samples)
        res = self.encode_fn(jnp.asarray(window), jnp.asarray(w_len))
        frames = res[0] if isinstance(res, (tuple, list)) else res

        first = self.emitted - base                       # local emit start
        if total_out is not None and base + self.window_frames >= total_out:
            last = total_out - base                       # final window: tail
        else:
            last = self.window_frames - self.lookahead_frames
        emit = np.asarray(frames[:, first:last])
        start = self.emitted
        self.emitted = base + last
        return emit, start


# ---------------------------------------------------------------------------
# recognizers
# ---------------------------------------------------------------------------


@dataclass
class StreamingCTC:
    """Streaming greedy CTC: session emissions -> incremental collapse
    (reference decode semantics, model_ctc.py:90-136, carried across chunks)."""

    session: StreamingEncoderSession
    _prev: np.ndarray = field(init=False, default=None)
    tokens: list = field(init=False, default=None)

    def __post_init__(self):
        b = self.session.batch_size
        self._prev = np.full((b,), -1, np.int64)
        self.tokens = [[] for _ in range(b)]

    def _consume(self, emissions, caps=None):
        for frames, start in emissions:
            preds = np.argmax(frames, axis=-1)            # (B, c)
            for i in range(preds.shape[0]):
                cap = preds.shape[1] if caps is None else min(
                    preds.shape[1], caps[i] - start
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

        for frames, start in emissions:
            if caps is None:
                f_len = jnp.full((frames.shape[0],), frames.shape[1], jnp.int32)
            else:
                f_len = jnp.clip(
                    jnp.asarray(caps, jnp.int32) - start, 0, frames.shape[1]
                )
            self._state = greedy_decode_stream(
                self.model, self.variables, jnp.asarray(frames), f_len,
                self._state, max_tokens=self.max_tokens,
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
