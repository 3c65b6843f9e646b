"""Continuous-batching streaming ASR server (slot-based).

``StreamingEncoderSession`` (streaming.py) batches B streams in LOCKSTEP:
every row pushes the same amount of audio and advances together — the right
shape for benchmarking, the wrong one for serving, where streams begin, end
and stall independently. This module adds the production path the reference
does not have (its evaluation is offline full-utterance only,
reference models/model.py:457-530): a fixed pool of ``num_slots`` device
slots behind ONE compiled window-step program, with per-slot admission,
advance and retirement.

TPU-native design:

* **Static shapes always.** The device step runs over the full slot pool
  every tick; idle rows carry zeros and their outputs are discarded on the
  host. One XLA program per server geometry, compiled once, reused for the
  life of the process — no recompiles when streams come and go.
* **Per-row window advance is a gather.** Each slot's rolling window shifts
  by its own amount (0 for idle rows, up to one chunk for running rows):
  ``concat([buf, new], time)`` then ``take_along_axis`` with a per-row
  dynamic offset. No data-dependent control flow inside jit.
* **Bounded host<->device traffic.** Per tick: the new audio chunks up
  (B x chunk_samples), token ids down. The rolling windows — and, for the
  transducer, the whole decode state — live on device; admission touches
  one row (``dynamic_update_slice``).
* **Same numerics as the single-stream session.** Window geometry, tiling
  alignment and emission bookkeeping are identical to
  ``StreamingEncoderSession`` — a stream served here produces exactly the
  tokens the single-stream runtime produces for it alone
  (tests/test_serving.py), with the same exactness/latency trade documented
  in streaming.py.

Decoders are pluggable: ``CTCGreedyDecoder`` (default; device argmax, host
incremental collapse with the reference's semantics, model_ctc.py:90-136)
and ``TransducerGreedyDecoder`` (the batched on-device greedy loop of
models/transducer.py with per-row frame ranges; per-stream decode state is
a device-resident row, reset by template row-write on slot reuse).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from efficientconformer_tpu.config import encoder_output_frames
from efficientconformer_tpu.streaming import (
    _base_alignment,
    suggested_history_frames,
    total_stride,
)

IDLE, ACTIVE, DRAINING = 0, 1, 2


@dataclass
class _Slot:
    state: int = IDLE
    stream_id: Optional[str] = None
    staged: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    received: int = 0        # samples pushed by the client so far
    uploaded: int = 0        # absolute end of this row's device window
    emitted: int = 0         # encoder output frames emitted so far
    placed: bool = False     # first window uploaded
    x_len: Optional[int] = None   # set at end(); final stream length
    total_out: Optional[int] = None


@dataclass
class TickResult:
    """Outcome of one server tick: per-stream NEW tokens emitted this tick
    and the set of streams that finished (their full token sequence)."""

    emitted: Dict[str, List[int]] = field(default_factory=dict)
    finished: Dict[str, List[int]] = field(default_factory=dict)
    windows_run: int = 0


# ---------------------------------------------------------------------------
# decoders
# ---------------------------------------------------------------------------


class CTCGreedyDecoder:
    """Greedy CTC over the server's window steps: argmax on device (fetch is
    (B, window_frames) int32), incremental collapse with a per-slot carry on
    the host — the reference decode semantics (model_ctc.py:90-136) carried
    across windows, same as streaming.StreamingCTC.

    ``consume`` only BUFFERS the (device array, metas) pair — no host sync —
    so the server can enqueue every window step of a tick back-to-back and
    the device pipeline stays full; ``collect`` resolves the whole tick's
    buffered steps (in order — the collapse carry is order-sensitive) with
    the transfers XLA has already pipelined."""

    def bind(self, server: "StreamingServer"):
        self._prev = [-1] * server.num_slots
        self._toks: List[List[int]] = [[] for _ in range(server.num_slots)]
        self._pending: List[tuple] = []

    @staticmethod
    def device_post(frames):
        return jnp.argmax(frames, axis=-1) if frames.ndim == 3 else frames

    def consume(self, step_out, metas):
        self._pending.append((step_out, metas))

    def collect(self) -> Dict[int, List[int]]:
        news: Dict[int, List[int]] = {}
        for step_out, metas in self._pending:
            ids = np.asarray(step_out)
            for i, first, last in metas:
                fresh = news.setdefault(i, [])
                for t in range(first, last):
                    tok = int(ids[i, t])
                    if tok != 0 and tok != self._prev[i]:
                        fresh.append(tok)
                        self._toks[i].append(tok)
                    self._prev[i] = tok
        self._pending = []
        return {i: v for i, v in news.items() if v}

    def finalize(self, i: int) -> List[int]:
        return self._toks[i]

    def reset(self, i: int):
        self._prev[i] = -1
        self._toks[i] = []


class TransducerGreedyDecoder:
    """Greedy transducer decoding over the server's window steps: the
    batched on-device loop (models/transducer.py greedy_decode_stream) runs
    per step with per-row frame ranges; rows that did not advance get
    f_start == f_len == 0 and are no-ops. Per-stream decode state (decoder
    carry, joint state, token buffer) is a device-resident row; slot reuse
    resets the row from the init template along each leaf's batch axis."""

    def __init__(self, model, variables, max_tokens: int = 256,
                 max_consec_dec_steps: int = 5):
        self.model = model
        self.variables = variables
        self.max_tokens = max_tokens
        self.max_consec = max_consec_dec_steps

    def bind(self, server: "StreamingServer"):
        from efficientconformer_tpu.models.transducer import _greedy_init_state

        b = server.num_slots
        self._state = _greedy_init_state(
            self.model, self.variables, b, self.max_tokens
        )
        self._n_prev = [0] * b
        self._host_n = None
        self._host_toks = None
        self._dirty = False  # any window step launched since last collect()?

        def _rows_reset(state, template, mask):
            # mask: (num_slots,) bool — True rows revert to the template.
            # One select per leaf for ANY subset of slots: a generation
            # boundary resets all its fresh slots in a single device call
            # instead of num_slots sequential row writes.
            def upd(s, t):
                # the batch axis is the one sized num_slots (decoder carries
                # may be (L, B, H) LSTM states with B not leading)
                for axis in range(s.ndim):
                    if s.shape[axis] == b:
                        shape = [1] * s.ndim
                        shape[axis] = b
                        return jnp.where(mask.reshape(shape), t, s)
                raise ValueError(f"no batch axis in {s.shape}")

            return jax.tree.map(upd, state, template)

        self._template = jax.tree.map(jnp.copy, self._state)
        self._rows_reset = jax.jit(_rows_reset)

    @staticmethod
    def device_post(frames):
        return frames

    def consume(self, step_out, metas):
        """Launch the decode of this window step's frames; async — the new
        device state chains on the previous one, no host sync here."""
        from efficientconformer_tpu.models.transducer import (
            greedy_decode_stream,
        )

        b = step_out.shape[0]
        f_start = np.zeros(b, np.int32)
        f_len = np.zeros(b, np.int32)
        for i, first, last in metas:
            f_start[i] = first
            f_len[i] = last
        self._state = greedy_decode_stream(
            self.model, self.variables, step_out, jnp.asarray(f_len),
            self._state, f_start=jnp.asarray(f_start),
            max_tokens=self.max_tokens,
            max_consec_dec_steps=self.max_consec,
        )
        self._host_n = None  # cache is stale until the next collect()
        self._dirty = True

    def collect(self) -> Dict[int, List[int]]:
        if not self._dirty:
            # no window step ran since the last collect(): the device state
            # is unchanged — skip the host sync of the token buffer entirely
            return {}
        self._dirty = False
        n_tok = np.array(self._state["n_tok"])  # writable copy: reset() zeroes rows
        tokens = np.asarray(self._state["tokens"])
        self._host_n, self._host_toks = n_tok, tokens
        news: Dict[int, List[int]] = {}
        for i in range(n_tok.shape[0]):
            n = int(n_tok[i])
            if n > self._n_prev[i]:
                news[i] = [int(t) for t in tokens[i, self._n_prev[i] : n]]
                self._n_prev[i] = n
        return news

    def finalize(self, i: int) -> List[int]:
        if self._host_n is not None:
            return [int(t) for t in self._host_toks[i, : int(self._host_n[i])]]
        n = int(np.asarray(self._state["n_tok"][i]))
        return [int(t) for t in np.asarray(self._state["tokens"][i, :n])]

    def reset(self, i: int):
        self.reset_many([i])

    def reset_many(self, idxs: List[int]):
        b = self._state["n_tok"].shape[0]
        mask = np.zeros(b, bool)
        mask[idxs] = True
        self._state = self._rows_reset(
            self._state, self._template, jnp.asarray(mask)
        )
        for i in idxs:
            self._n_prev[i] = 0
            if self._host_n is not None:
                self._host_n[i] = 0  # keep the finalize cache row consistent


# ---------------------------------------------------------------------------
# server
# ---------------------------------------------------------------------------


class StreamingServer:
    """Slot-pool continuous batching over a streaming encoder.

    ``encode_fn(audio (B, T), x_len (B,)) -> logits | frames`` — the same
    contract as ``StreamingEncoderSession.encode_fn``; what the decoder needs
    determines which (logits for CTC, encoder frames for the transducer).

    Typical loop::

        srv = StreamingServer(encode_fn, encoder_params, num_slots=16)
        srv.submit("a"); srv.push("a", samples); ...
        events = srv.tick()         # call at the chunk cadence
        srv.end("a")                # client hangup; drained at next ticks
    """

    def __init__(
        self,
        encode_fn: Callable,
        encoder_params: dict,
        num_slots: int = 16,
        chunk_frames: int = 16,
        history_frames: Optional[int] = None,
        lookahead_frames: int = 2,
        decoder=None,
        max_windows_per_tick: Optional[int] = None,
    ):
        p = encoder_params
        self.params = p
        self.num_slots = num_slots
        self.hop = p["sample_rate"] * p["hop_length_ms"] // 1000
        self.stride = total_stride(p)
        self.samples_per_frame = self.hop * self.stride
        self.align = _base_alignment(p)
        if history_frames is None:
            history_frames = suggested_history_frames(p)
        self.history_frames = -(-history_frames // self.align) * self.align
        self.chunk_frames = -(-chunk_frames // self.align) * self.align
        self.lookahead_frames = lookahead_frames
        self.window_frames = (
            self.history_frames + self.chunk_frames + self.lookahead_frames
        )
        w_mel = self.window_frames * self.stride
        self.window_samples = (w_mel - 1) * self.hop
        self.chunk_samples = self.chunk_frames * self.samples_per_frame
        # Bound on batched window steps per tick(). Slots with deeper audio
        # backlog (burst uploads, drain phases) keep their remaining windows
        # for the NEXT tick instead of extending this one — work-conserving
        # (same total windows overall) but every caller sees a bounded tick
        # latency of ~max_windows x one step, instead of the deepest
        # backlog's. None = drain all complete windows per tick (the
        # round-4 behavior; p95 then scales with backlog depth, measured
        # 2.8-3.5 s at 128 slots on saturated offline pushes).
        self.max_windows_per_tick = max_windows_per_tick

        self._slots = [_Slot() for _ in range(num_slots)]
        self._by_id: Dict[str, int] = {}       # stream_id -> slot index
        self._queue: List[str] = []            # submitted, waiting for a slot
        self._pending: Dict[str, _Slot] = {}   # queued streams buffer here
        self._results: Dict[str, List[int]] = {}

        self._buf = jnp.zeros((num_slots, self.window_samples), jnp.float32)
        self._decoder = decoder if decoder is not None else CTCGreedyDecoder()
        self._decoder.bind(self)

        w = self.window_samples
        post = type(self._decoder).device_post

        def _step(buf, new, shift, w_len):
            ext = jnp.concatenate([buf, new], axis=1)
            idx = jnp.arange(w)[None, :] + shift[:, None]
            buf2 = jnp.take_along_axis(ext, idx, axis=1)
            res = encode_fn(buf2, w_len)
            frames = res[0] if isinstance(res, (tuple, list)) else res
            return buf2, post(frames)

        self._step = jax.jit(_step)
        # Batched fresh-window upload: ONE scatter per tick for however many
        # slots were admitted, instead of one dynamic_update_slice launch per
        # slot (64 sequential ~6 ms launches at a generation boundary on the
        # tunnelled backend — the measured tick-p95 tail). The row count is
        # padded to the next power of two by repeating the first (row, idx)
        # pair — duplicate scatter indices carrying identical values are
        # order-independent — so at most log2(num_slots)+1 programs compile.
        self._place_many = jax.jit(lambda buf, rows, idxs: buf.at[idxs].set(rows))

    # ------------------------------------------------------------- client API

    def submit(self, stream_id: str):
        """Register a new stream; admitted to a slot at the next tick with a
        free one (FIFO)."""
        if stream_id in self._by_id or stream_id in self._pending:
            raise ValueError(f"duplicate stream id {stream_id!r}")
        self._pending[stream_id] = _Slot(state=ACTIVE, stream_id=stream_id)
        self._queue.append(stream_id)

    def push(self, stream_id: str, samples: np.ndarray):
        """Append audio samples (1-D float32) to a stream."""
        slot = self._slot_of(stream_id)
        if slot.x_len is not None:
            raise ValueError(f"stream {stream_id!r} already ended")
        samples = np.asarray(samples, np.float32).reshape(-1)
        slot.staged = np.concatenate([slot.staged, samples])
        slot.received += samples.size

    def end(self, stream_id: str, x_len: Optional[int] = None):
        """Mark end of stream; remaining windows are drained (zero-padded
        with the real length, exactly like ``StreamingEncoderSession.finish``)
        over the next ticks."""
        slot = self._slot_of(stream_id)
        slot.x_len = int(slot.received if x_len is None else x_len)
        slot.total_out = int(encoder_output_frames(self.params, slot.x_len))
        slot.state = DRAINING

    def result(self, stream_id: str) -> Optional[List[int]]:
        return self._results.get(stream_id)

    @property
    def active_streams(self) -> int:
        return sum(s.state != IDLE for s in self._slots)

    @property
    def queued_streams(self) -> int:
        return len(self._queue)

    # ---------------------------------------------------------------- serving

    def _slot_of(self, stream_id: str) -> _Slot:
        if stream_id in self._by_id:
            return self._slots[self._by_id[stream_id]]
        if stream_id in self._pending:
            return self._pending[stream_id]
        raise KeyError(f"unknown stream {stream_id!r}")

    def _admit(self):
        admitted = []
        for i, s in enumerate(self._slots):
            if not self._queue:
                break
            if s.state == IDLE:
                sid = self._queue.pop(0)
                slot = self._pending.pop(sid)
                self._slots[i] = slot
                self._by_id[sid] = i
                admitted.append(i)
        if not admitted:
            return
        reset_many = getattr(self._decoder, "reset_many", None)
        if reset_many is not None:
            reset_many(admitted)
        else:
            for i in admitted:
                self._decoder.reset(i)

    def _base(self, slot: _Slot) -> int:
        b = max(0, slot.emitted - self.history_frames)
        return (b // self.align) * self.align

    def _need(self, base: int) -> int:
        return base * self.samples_per_frame + self.window_samples

    def _runnable(self, slot: _Slot) -> bool:
        if slot.state == ACTIVE:
            return slot.received >= self._need(self._base(slot))
        if slot.state == DRAINING:
            return slot.emitted < slot.total_out
        return False

    def _take_staged(self, slot: _Slot, n: int) -> np.ndarray:
        take = slot.staged[:n]
        slot.staged = slot.staged[n:]
        if take.size < n:
            take = np.pad(take, (0, n - take.size))
        return take

    def _finish_slot(self, i: int, out: TickResult):
        s = self._slots[i]
        toks = self._decoder.finalize(i)
        self._results[s.stream_id] = toks
        out.finished[s.stream_id] = toks
        del self._by_id[s.stream_id]
        self._slots[i] = _Slot()

    def tick(self) -> TickResult:
        """Admit queued streams, then run batched window steps until no slot
        has a complete window pending. Returns the tokens emitted this tick
        and any finished streams."""
        self._admit()
        out = TickResult()
        finish_order: List[int] = []

        # degenerate zero-length streams finish immediately
        for i, s in enumerate(self._slots):
            if s.state == DRAINING and s.total_out == 0:
                self._finish_slot(i, out)
        self._admit()

        # fresh slots: upload every first window in ONE batched scatter
        fresh_idx: List[int] = []
        fresh_rows: List[np.ndarray] = []
        for i, s in enumerate(self._slots):
            if s.state != IDLE and not s.placed and self._runnable(s):
                fresh_idx.append(i)
                fresh_rows.append(self._take_staged(s, self.window_samples))
                s.uploaded = self.window_samples
                s.placed = True
        if fresh_idx:
            k = 1
            while k < len(fresh_idx):
                k *= 2
            pad = k - len(fresh_idx)
            idxs = np.asarray(fresh_idx + [fresh_idx[0]] * pad, np.int32)
            rows = np.stack(fresh_rows + [fresh_rows[0]] * pad)
            self._buf = self._place_many(
                self._buf, jnp.asarray(rows), jnp.asarray(idxs)
            )

        while True:
            if (
                self.max_windows_per_tick is not None
                and out.windows_run >= self.max_windows_per_tick
            ):
                break
            run = [
                s.state != IDLE and s.placed and self._runnable(s)
                for s in self._slots
            ]
            if not any(run):
                break
            shift = np.zeros(self.num_slots, np.int32)
            new = np.zeros((self.num_slots, self.chunk_samples), np.float32)
            w_len = np.full(self.num_slots, self.window_samples, np.int64)
            meta = {}
            for i, s in enumerate(self._slots):
                if not run[i]:
                    continue
                base = self._base(s)
                need = self._need(base)
                delta = need - s.uploaded
                assert 0 <= delta <= self.chunk_samples, (delta, base)
                if delta:
                    # gather window = ext[shift : shift+W]; the tail reads
                    # new[:delta], so fill the chunk row from the left
                    new[i, :delta] = self._take_staged(s, delta)
                    shift[i] = delta
                    s.uploaded = need
                s0 = base * self.samples_per_frame
                if s.state == DRAINING:
                    w_len[i] = np.clip(s.x_len - s0, 0, self.window_samples)
                first = s.emitted - base
                if (
                    s.state == DRAINING
                    and base + self.window_frames >= s.total_out
                ):
                    last = s.total_out - base
                else:
                    last = self.window_frames - self.lookahead_frames
                meta[i] = (first, last, base)
            self._buf, step_out = self._step(
                self._buf, jnp.asarray(new), jnp.asarray(shift),
                jnp.asarray(w_len),
            )
            out.windows_run += 1
            # async: buffers/launches only — the tick's window steps enqueue
            # back-to-back and the device pipeline stays full
            self._decoder.consume(
                step_out, [(i, f, l) for i, (f, l, _) in meta.items()]
            )
            for i, (first, last, base) in meta.items():
                s = self._slots[i]
                s.emitted = base + last
                if (
                    s.state == DRAINING
                    and s.emitted >= s.total_out
                    and i not in finish_order
                ):
                    finish_order.append(i)  # not runnable anymore; freed below

        # one host sync for the whole tick
        news_map = self._decoder.collect()
        for i, news in news_map.items():
            s = self._slots[i]
            if s.stream_id is not None and news:
                out.emitted.setdefault(s.stream_id, []).extend(news)
        for i in finish_order:
            self._finish_slot(i, out)
        return out

    def drain(self, max_ticks: int = 10_000) -> Dict[str, List[int]]:
        """Tick until every submitted stream has finished (all remaining
        streams must have been ``end()``-ed). Returns all results."""
        for _ in range(max_ticks):
            self.tick()
            if not self._by_id and not self._queue:
                return dict(self._results)
        raise RuntimeError("drain did not converge (un-ended stream?)")
