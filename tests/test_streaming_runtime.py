"""Chunked streaming runtime (efficientconformer_tpu/streaming.py).

Exactness contract: for causal configs (causal=True, finite left_context)
chunk-by-chunk emission equals the batch forward on the zero-padded
utterance, including a grouped-attention stage (window tiling alignment)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientconformer_tpu import streaming as S
from efficientconformer_tpu.config import encoder_output_frames
from efficientconformer_tpu.models.model_ctc import ModelCTC, ctc_greedy_collapse
from efficientconformer_tpu.models.transducer import (
    Transducer,
    greedy_decode,
    greedy_decode_stream,
)
from tests.test_models import TINY_DEC, TINY_ENC, TINY_JOINT

CAUSAL_ENC = dict(
    TINY_ENC,
    num_blocks=3,
    dim_model=[16, 24],
    num_heads=2,
    kernel_size=[7, 7],
    att_group_size=[3, 1],
    strided_blocks=[1],
    expand_blocks=[1],
    conv_stride=2,
    att_stride=1,
    causal=True,
    left_context=8,
)


def test_geometry_helpers():
    assert S.total_stride(CAUSAL_ENC) == 4           # sub 2 x block stride 2
    # stage-1 grouped G=3 at 2 stage-frames per output frame -> base align 3
    assert S._base_alignment(CAUSAL_ENC) == 3
    assert S.suggested_history_frames(CAUSAL_ENC) >= 8


def _ctc_setup(b=2, seconds=2.0, seed=0):
    model = ModelCTC(encoder_params=CAUSAL_ENC, vocab_size=9)
    t = int(16000 * seconds)
    rng = np.random.default_rng(seed)
    audio = jnp.asarray(rng.standard_normal((b, t)), jnp.float32) * 0.1
    x_len = jnp.array([t, t - 5000])
    variables = model.init(jax.random.PRNGKey(0), audio[:1], x_len[:1])
    return model, variables, audio, x_len


def test_streaming_ctc_matches_batch_forward():
    model, variables, audio, x_len = _ctc_setup()
    encode = jax.jit(lambda a, l: model.apply(variables, a, l, False))

    sess = S.StreamingEncoderSession(
        encode_fn=encode, encoder_params=CAUSAL_ENC, batch_size=2,
        chunk_frames=9, lookahead_frames=2,
    )
    emissions = []
    # drip-feed in uneven pushes to exercise buffering
    pos, total = 0, audio.shape[1]
    for n in (5000, 12000, 3000, 20000):
        emissions += sess.push(np.asarray(audio[:, pos : pos + n]))
        pos += n
    emissions += sess.push(np.asarray(audio[:, pos:]))
    emissions += sess.finish(np.asarray(x_len))

    got = np.concatenate([em.valid for em in emissions], axis=1)
    assert emissions[0].start == 0
    total_out = encoder_output_frames(CAUSAL_ENC, int(x_len.max()))
    assert got.shape[1] == total_out

    # batch forward on the zero-padded utterance (same padding the batch
    # pipeline uses), valid lengths via x_len
    pad = np.zeros((2, sess.window_samples), np.float32)
    full_audio = jnp.concatenate([audio, jnp.asarray(pad)], axis=1)
    want, want_len, _ = model.apply(variables, full_audio, x_len, False)
    # compare each stream's VALID frames: past a stream's own length the
    # batch forward masks its keys (frames there are meaningless padding
    # output and legitimately differ mid-stream)
    for i in range(2):
        cap = encoder_output_frames(CAUSAL_ENC, int(x_len[i]))
        np.testing.assert_allclose(
            got[i, :cap], np.asarray(want)[i, :cap], rtol=2e-5, atol=2e-5
        )

    # incremental greedy collapse == batch collapse on valid frames
    dec = S.StreamingCTC(S.StreamingEncoderSession(
        encode_fn=encode, encoder_params=CAUSAL_ENC, batch_size=2,
        chunk_frames=9, lookahead_frames=2,
    ))
    dec.push(np.asarray(audio))
    toks = dec.finish(np.asarray(x_len))
    preds = jnp.argmax(want, axis=-1)
    ref_toks, ref_n = ctc_greedy_collapse(preds, want_len)
    for i in range(2):
        assert toks[i] == np.asarray(ref_toks)[i, : int(ref_n[i])].tolist()


def test_streaming_transducer_matches_full_greedy():
    model = Transducer(
        encoder_params=CAUSAL_ENC, decoder_params=TINY_DEC,
        joint_params=TINY_JOINT, vocab_size=9,
    )
    b, t = 2, 32000
    rng = np.random.default_rng(3)
    audio = jnp.asarray(rng.standard_normal((b, t)), jnp.float32) * 0.1
    x_len = jnp.array([t, t - 7000])
    y = jnp.array([[1, 2, 3], [4, 5, 0]])
    y_len = jnp.array([3, 2])
    variables = model.init(jax.random.PRNGKey(2), audio, y, x_len, y_len, False)

    max_tokens = 64
    full_toks, full_n = greedy_decode(model, variables, audio, x_len, max_tokens)

    encode = jax.jit(
        lambda a, l: model.apply(variables, a, l, False, method=Transducer.encode)
    )
    sess = S.StreamingEncoderSession(
        encode_fn=encode, encoder_params=CAUSAL_ENC, batch_size=b,
        chunk_frames=9, lookahead_frames=2,
    )
    dec = S.StreamingTransducer(
        model=model, variables=variables, session=sess, max_tokens=max_tokens,
    )
    dec.push(np.asarray(audio[:, :10000]))
    dec.push(np.asarray(audio[:, 10000:]))
    toks, n = dec.finish(np.asarray(x_len))

    assert n.tolist() == np.asarray(full_n).tolist()
    for i in range(b):
        assert toks[i, : n[i]].tolist() == np.asarray(full_toks)[i, : n[i]].tolist()


def test_streaming_local_attention_exact():
    """Causal local (blockwise) attention: window starts must also align to
    the K-frame tiling; exactness holds like the grouped case."""
    enc = dict(
        TINY_ENC,
        num_blocks=2,
        dim_model=16,
        num_heads=2,
        kernel_size=7,
        att_kernel_size=4,
        causal=True,
        left_context=8,
    )
    model = ModelCTC(encoder_params=enc, vocab_size=9)
    b, t = 1, 24000
    audio = jnp.asarray(
        np.random.default_rng(7).standard_normal((b, t)), jnp.float32
    ) * 0.1
    x_len = jnp.array([t])
    variables = model.init(jax.random.PRNGKey(4), audio, x_len)
    encode = jax.jit(lambda a, l: model.apply(variables, a, l, False))

    sess = S.StreamingEncoderSession(
        encode_fn=encode, encoder_params=enc, batch_size=b,
        chunk_frames=8, lookahead_frames=2,
    )
    assert sess.align % 2 == 0   # K=4 at 2 stage-frames/output -> align 2
    ems = sess.push(np.asarray(audio)) + sess.finish(np.asarray(x_len))
    got = np.concatenate([em.valid for em in ems], axis=1)

    pad = np.zeros((b, sess.window_samples), np.float32)
    want, _, _ = model.apply(
        variables, jnp.concatenate([audio, jnp.asarray(pad)], axis=1),
        x_len, False,
    )
    cap = encoder_output_frames(enc, t)
    assert got.shape[1] == cap
    np.testing.assert_allclose(
        got[0], np.asarray(want)[0, :cap], rtol=2e-5, atol=2e-5
    )


def test_streaming_noncausal_smoke():
    """Non-causal configs stream too (approximate near chunk edges): the
    session must run and emit the full frame count."""
    enc = dict(TINY_ENC)
    model = ModelCTC(encoder_params=enc, vocab_size=9)
    t = 16000
    audio = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, t)), jnp.float32
    ) * 0.1
    x_len = jnp.array([t])
    variables = model.init(jax.random.PRNGKey(0), audio, x_len)
    encode = jax.jit(lambda a, l: model.apply(variables, a, l, False))
    sess = S.StreamingEncoderSession(
        encode_fn=encode, encoder_params=enc, batch_size=1,
        chunk_frames=8, history_frames=32, lookahead_frames=8,
    )
    ems = sess.push(np.asarray(audio)) + sess.finish(np.asarray(x_len))
    got = np.concatenate([em.valid for em in ems], axis=1)
    assert got.shape[1] == encoder_output_frames(enc, t)
