"""On-device transducer beam search vs the host implementations.

On a trained (unambiguous) model the fully on-device beam must agree exactly
with the host-orchestrated batched beam — which itself equals the per-sample
reference semantics (tests/test_beam_batched.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from efficientconformer_tpu.decoding.rnnt_beam import beam_search_batched
from efficientconformer_tpu.decoding.rnnt_beam_device import beam_search_device
from tests.test_models import build_tiny_transducer


@pytest.fixture(scope="module")
def trained_transducer():
    """Tiny transducer overfit on one batch until the search is unambiguous."""
    from tests.test_convergence import make_cfg
    from efficientconformer_tpu.training.trainer import Trainer

    trainer = Trainer(make_cfg("Transducer", lr=3e-3))
    rng = np.random.default_rng(0)
    b, t = 2, 8000
    micro = {
        "audio": rng.standard_normal((b, t)).astype(np.float32) * 0.1,
        "labels": np.array([[3, 5, 2], [7, 1, 4]], np.int32),
        "audio_len": np.full((b,), t, np.int32),
        "label_len": np.full((b,), 3, np.int32),
    }
    state = trainer.init_state(micro)
    step = trainer.train_step_fn()
    batch = {k: jnp.asarray(v[None]) for k, v in micro.items()}
    key = jax.random.PRNGKey(0)
    for _ in range(450):
        state, m = step(state, batch, key)
    assert float(m["loss"]) < 0.2, float(m["loss"])
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return (trainer.model, variables,
            jnp.asarray(micro["audio"]), jnp.asarray(micro["audio_len"]))


def test_device_beam_matches_host_when_unambiguous(trained_transducer):
    model, variables, x, x_len = trained_transducer
    want = beam_search_batched(model, variables, x, x_len, beam_size=3)
    got = beam_search_device(model, variables, x, x_len, beam_size=3,
                             max_tokens=32)
    assert got == want
    # sanity: the search actually recovers the overfit labels
    assert got == [[3, 5, 2], [7, 1, 4]]


def test_device_beam_valid_on_ambiguous_model():
    """On an untrained (ambiguous) model the searches may tie-break
    differently; the device beam must still terminate with valid sequences."""
    model, variables, x, x_len, y, y_len = build_tiny_transducer()
    out_w4 = beam_search_device(model, variables, x, x_len, beam_size=4,
                                max_tokens=32)
    assert len(out_w4) == x.shape[0]
    for seq in out_w4:
        assert all(0 < t for t in seq)
        assert len(seq) <= 32


def test_device_beam_with_rnn_lm_fusion(trained_transducer):
    from efficientconformer_tpu.models.lm import LanguageModel

    model, variables, x, x_len = trained_transducer
    lm = LanguageModel(
        lm_params={"arch": "RNN", "num_layers": 1, "dim_model": 12,
                   "vocab_size": 9},
        vocab_size=9,
    )
    lm_vars = lm.init(
        jax.random.PRNGKey(7), jnp.zeros((1, 4), jnp.int32), None, False
    )
    kw = dict(lm_model=lm, lm_variables=lm_vars, lm_weight=0.4, lm_tmp=1.0)
    want = beam_search_batched(model, variables, x, x_len, beam_size=3, **kw)
    got = beam_search_device(model, variables, x, x_len, beam_size=3,
                             max_tokens=32, **kw)
    assert got == want


def test_device_beam_with_ngram_rescoring(trained_transducer, tmp_path):
    """Device beam with the device-resident ARPA scorer must equal the host
    beam with the host ArpaLM, pop for pop (kenlm rescoring semantics,
    reference transducer.py:309-317)."""
    model, variables, x, x_len = trained_transducer
    p = tmp_path / "lm.arpa"
    # bigram over the token chars (offset 100) incl. backoffs
    uni = "\n".join(
        f"-{0.4 + 0.1 * i:.1f}\t{chr(i + 100)}\t-0.3" for i in range(1, 9)
    )
    bi = "-0.2\t" + chr(103) + " " + chr(105) + "\n-0.3\t" + chr(
        105
    ) + " " + chr(102)
    p.write_text(
        "\\data\\\nngram 1=8\nngram 2=2\n\n\\1-grams:\n" + uni +
        "\n\n\\2-grams:\n" + bi + "\n\n\\end\\\n"
    )
    from efficientconformer_tpu.decoding.ngram import ArpaLM

    arpa = ArpaLM(str(p), 100)
    kw = dict(ngram_alpha=0.5, ngram_beta=0.3)
    want = beam_search_batched(
        model, variables, x, x_len, beam_size=3, ngram=arpa, **kw
    )
    got = beam_search_device(
        model, variables, x, x_len, beam_size=3, max_tokens=32,
        ngram=arpa, **kw
    )
    assert got == want
