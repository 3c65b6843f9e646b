"""Batched transducer beam search must match the per-sample implementation."""

import numpy as np
import pytest

from efficientconformer_tpu.decoding.rnnt_beam import beam_search, beam_search_batched
from tests.test_models import build_tiny_transducer


def test_batched_beam_matches_per_sample():
    model, variables, x, x_len, y, y_len = build_tiny_transducer()
    want = beam_search(model, variables, x, x_len, beam_size=3)
    got = beam_search_batched(model, variables, x, x_len, beam_size=3)
    assert got == want


def test_batched_beam_with_neural_lm_fusion():
    """Shallow fusion: batched ≡ per-sample, and fusion actually changes the
    search (reference transducer.py:260-273 semantics)."""
    import jax
    import jax.numpy as jnp
    from efficientconformer_tpu.models.lm import LanguageModel

    model, variables, x, x_len, y, y_len = build_tiny_transducer()
    lm = LanguageModel(
        lm_params={"arch": "RNN", "num_layers": 1, "dim_model": 12,
                   "vocab_size": 9},
        vocab_size=9,
    )
    lm_vars = lm.init(
        jax.random.PRNGKey(7), jnp.zeros((1, 4), jnp.int32), None, False
    )
    kw = dict(lm_model=lm, lm_variables=lm_vars, lm_weight=0.6, lm_tmp=1.0)
    want = beam_search(model, variables, x, x_len, beam_size=3, **kw)
    got = beam_search_batched(model, variables, x, x_len, beam_size=3, **kw)
    assert got == want


def test_batched_beam_with_ngram(tmp_path):
    model, variables, x, x_len, y, y_len = build_tiny_transducer()
    p = tmp_path / "lm.arpa"
    grams = "\n".join(f"-0.5\t{chr(i + 100)}" for i in range(1, 9))
    p.write_text(f"\\data\\\nngram 1=8\n\n\\1-grams:\n{grams}\n\n\\end\\\n")
    from efficientconformer_tpu.decoding.ngram import ArpaLM

    lm = ArpaLM(str(p), 100)
    want = beam_search(model, variables, x, x_len, beam_size=2,
                       ngram=lm, ngram_alpha=0.3, ngram_beta=0.5)
    got = beam_search_batched(model, variables, x, x_len, beam_size=2,
                              ngram=lm, ngram_alpha=0.3, ngram_beta=0.5)
    assert got == want
