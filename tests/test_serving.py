"""Continuous-batching streaming server (efficientconformer_tpu/serving.py).

Contract: a stream served through the slot pool — with other streams coming
and going around it — produces exactly the token sequence the single-stream
``StreamingCTC`` runtime produces for it alone. Slots are reused across
streams; admission is FIFO when the pool is full."""

import numpy as np
import jax
import jax.numpy as jnp

from efficientconformer_tpu import streaming as S
from efficientconformer_tpu.models.model_ctc import ModelCTC
from efficientconformer_tpu.serving import StreamingServer
from tests.test_streaming_runtime import CAUSAL_ENC


def _setup(vocab=9, seed=0):
    model = ModelCTC(encoder_params=CAUSAL_ENC, vocab_size=vocab)
    rng = np.random.default_rng(seed)
    probe = jnp.asarray(rng.standard_normal((1, 8000)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), probe, jnp.array([8000]))
    encode = jax.jit(lambda a, l: model.apply(variables, a, l, False))
    return encode, rng


def _reference_tokens(encode, audio_1d, chunk_frames, lookahead):
    """Single-stream oracle: StreamingCTC over a batch-1 session."""
    sess = S.StreamingEncoderSession(
        encode_fn=encode, encoder_params=CAUSAL_ENC, batch_size=1,
        chunk_frames=chunk_frames, lookahead_frames=lookahead,
    )
    dec = S.StreamingCTC(session=sess)
    dec.push(audio_1d[None, :])
    toks = dec.finish(np.array([audio_1d.size]))
    return list(map(int, toks[0]))


def test_server_matches_single_stream_sessions():
    encode, rng = _setup()
    chunk, look = 9, 2

    # 5 streams, different lengths, served through a 2-slot pool with
    # staggered arrivals — forces slot reuse and queueing
    lengths = [24000, 9000, 31000, 16000, 24000]
    audios = [
        (rng.standard_normal(n) * 0.1).astype(np.float32) for n in lengths
    ]
    want = {
        f"s{i}": _reference_tokens(encode, a, chunk, look)
        for i, a in enumerate(audios)
    }

    srv = StreamingServer(
        encode, CAUSAL_ENC, num_slots=2, chunk_frames=chunk,
        lookahead_frames=look,
    )
    # staggered schedule: push in uneven bites, submit late arrivals midway
    srv.submit("s0"); srv.submit("s1")
    pos = {f"s{i}": 0 for i in range(len(audios))}

    def feed(sid, n):
        i = int(sid[1:])
        a = audios[i]
        take = a[pos[sid]: pos[sid] + n]
        if take.size:
            srv.push(sid, take)
        pos[sid] += take.size
        if pos[sid] >= a.size and pos[sid] > 0:
            ended.add(sid)

    ended = set()
    feed("s0", 7000); feed("s1", 9000)
    srv.end("s1")
    srv.tick()
    srv.submit("s2"); feed("s2", 15000)
    feed("s0", 17000); srv.end("s0")
    srv.tick()
    srv.submit("s3"); srv.submit("s4")
    feed("s3", 16000); srv.end("s3")
    feed("s2", 16000); srv.end("s2")
    srv.tick()
    feed("s4", 24000); srv.end("s4")

    got = srv.drain()
    assert set(got) == set(want)
    for sid in want:
        assert got[sid] == want[sid], sid


def test_server_emits_incrementally_and_reports_finished():
    encode, rng = _setup(seed=3)
    audio = (rng.standard_normal(30000) * 0.1).astype(np.float32)

    srv = StreamingServer(
        encode, CAUSAL_ENC, num_slots=1, chunk_frames=9, lookahead_frames=2,
    )
    srv.submit("a")
    srv.push("a", audio)
    r1 = srv.tick()
    # with the full utterance staged, the first tick should already run
    # several windows and emit tokens incrementally
    assert r1.windows_run >= 1
    srv.end("a")
    res = srv.drain()
    all_emitted = list(r1.emitted.get("a", []))
    # stitched incremental emissions == final result
    want = _reference_tokens(encode, audio, 9, 2)
    assert res["a"] == want
    assert all(t in res["a"] for t in all_emitted)


def test_zero_length_stream():
    """A stream ended with no audio still drains cleanly and matches the
    single-stream session (encoder_output_frames(p, 0) >= 1: the length
    formulas emit at least one frame for an empty utterance, same as the
    zero-padded batch forward)."""
    encode, _ = _setup()
    want = _reference_tokens(encode, np.zeros(0, np.float32), 9, 2)
    srv = StreamingServer(
        encode, CAUSAL_ENC, num_slots=1, chunk_frames=9, lookahead_frames=2
    )
    srv.submit("empty")
    srv.end("empty")
    res = srv.drain()
    assert res["empty"] == want


def test_transducer_server_matches_single_stream():
    """Transducer decoding through the slot pool: device decode state rows
    survive slot churn and match the single-stream StreamingTransducer."""
    from efficientconformer_tpu.models.transducer import Transducer
    from efficientconformer_tpu.serving import TransducerGreedyDecoder
    from tests.test_models import TINY_DEC, TINY_JOINT

    model = Transducer(
        encoder_params=CAUSAL_ENC, decoder_params=TINY_DEC,
        joint_params=TINY_JOINT, vocab_size=9,
    )
    rng = np.random.default_rng(7)
    probe = jnp.asarray(rng.standard_normal((1, 16000)), jnp.float32) * 0.1
    variables = model.init(
        jax.random.PRNGKey(2), probe, jnp.array([[1, 2, 3]]),
        jnp.array([16000]), jnp.array([3]), False,
    )
    encode = jax.jit(
        lambda a, l: model.apply(variables, a, l, False, method=Transducer.encode)
    )
    chunk, look, max_tokens = 9, 2, 64

    lengths = [24000, 10000, 17000]
    audios = [
        (rng.standard_normal(n) * 0.1).astype(np.float32) for n in lengths
    ]

    def oracle(a):
        sess = S.StreamingEncoderSession(
            encode_fn=encode, encoder_params=CAUSAL_ENC, batch_size=1,
            chunk_frames=chunk, lookahead_frames=look,
        )
        dec = S.StreamingTransducer(
            model=model, variables=variables, session=sess,
            max_tokens=max_tokens,
        )
        dec.push(a[None, :])
        toks, n = dec.finish(np.array([a.size]))
        return toks[0, : int(n[0])].tolist()

    want = {f"t{i}": oracle(a) for i, a in enumerate(audios)}

    srv = StreamingServer(
        encode, CAUSAL_ENC, num_slots=2, chunk_frames=chunk,
        lookahead_frames=look,
        decoder=TransducerGreedyDecoder(model, variables, max_tokens=max_tokens),
    )
    # staggered: t0+t1 first (fills the 2-slot pool), t2 queued behind them
    srv.submit("t0"); srv.push("t0", audios[0][:9000])
    srv.submit("t1"); srv.push("t1", audios[1]); srv.end("t1")
    srv.tick()
    srv.submit("t2"); srv.push("t2", audios[2]); srv.end("t2")
    srv.push("t0", audios[0][9000:]); srv.end("t0")
    got = srv.drain()
    assert set(got) == set(want)
    for sid in want:
        assert got[sid] == want[sid], sid


def test_max_windows_per_tick_is_work_conserving():
    """A capped server produces exactly the uncapped results; every tick runs
    at most the cap's window steps (the p95 tick-latency bound), with the
    leftover backlog carried to later ticks."""
    encode, rng = _setup(seed=5)
    chunk, look = 9, 2
    # long enough that each utterance spans several windows (the default
    # history covers ~24k-sample utterances in one window)
    lengths = [60000, 45000, 90000]
    audios = [
        (rng.standard_normal(n) * 0.1).astype(np.float32) for n in lengths
    ]
    want = {
        f"s{i}": _reference_tokens(encode, a, chunk, look)
        for i, a in enumerate(audios)
    }

    srv = StreamingServer(
        encode, CAUSAL_ENC, num_slots=2, chunk_frames=chunk,
        lookahead_frames=look, max_windows_per_tick=1,
    )
    for i, a in enumerate(audios):
        srv.submit(f"s{i}")
        srv.push(f"s{i}", a)       # whole utterance staged: deep backlog
        srv.end(f"s{i}")
    ticks = 0
    while srv.active_streams or srv.queued_streams:
        out = srv.tick()
        assert out.windows_run <= 1
        ticks += 1
        assert ticks < 200
    got = srv._results
    assert set(got) == set(want)
    for sid in want:
        assert got[sid] == want[sid], sid
    assert ticks >= 8  # the cap actually split the backlog across many ticks


def test_generation_boundary_churn_batched_admission():
    """All slots finish in the same tick and a full new generation is
    admitted at once — the batched fresh-window scatter (including its
    power-of-two padding: 3 fresh rows pad to 4) and multi-row decoder
    reset must produce exactly the single-stream tokens for every stream."""
    encode, rng = _setup(seed=7)
    chunk, look = 9, 2

    n_slots, n_streams = 3, 9  # 3 generations, each admitting 3 at once
    lengths = [21000, 21000, 21000, 16000, 24000, 19000, 9000, 31000, 21000]
    audios = [
        (rng.standard_normal(n) * 0.1).astype(np.float32) for n in lengths
    ]
    want = {
        f"g{i}": _reference_tokens(encode, a, chunk, look)
        for i, a in enumerate(audios)
    }

    srv = StreamingServer(
        encode, CAUSAL_ENC, num_slots=n_slots, chunk_frames=chunk,
        lookahead_frames=look,
    )
    # saturated offline pushes: every stream fully staged up-front, so each
    # generation's admissions land in one tick together
    for i, a in enumerate(audios):
        sid = f"g{i}"
        srv.submit(sid)
        srv.push(sid, a)
        srv.end(sid)

    while srv.active_streams or srv.queued_streams:
        srv.tick()

    for sid in want:
        assert srv.result(sid) == want[sid], sid
