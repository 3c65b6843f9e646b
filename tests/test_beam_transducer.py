"""Transducer beam search smoke + fusion tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficientconformer_tpu.decoding.rnnt_beam import beam_search
from efficientconformer_tpu.models.lm import LanguageModel
from tests.test_models import build_tiny_transducer


def test_beam_search_runs_and_beats_or_matches_greedy_score():
    model, variables, x, x_len, y, y_len = build_tiny_transducer()
    res = beam_search(model, variables, x[:1], x_len[:1], beam_size=3)
    assert isinstance(res, list) and len(res) == 1
    assert all(isinstance(t, int) and 0 < t < 9 for t in res[0])


def test_beam_search_with_neural_lm_fusion():
    model, variables, x, x_len, y, y_len = build_tiny_transducer()
    lm = LanguageModel(
        lm_params={"arch": "RNN", "num_layers": 1, "dim_model": 8, "vocab_size": 9},
        vocab_size=9,
    )
    lm_vars = lm.init(jax.random.PRNGKey(3), y, y_len, False)
    res = beam_search(
        model, variables, x[:1], x_len[:1], beam_size=2,
        lm_model=lm, lm_variables=lm_vars, lm_weight=0.3,
    )
    assert len(res) == 1


def test_beam_search_with_ngram_rescoring(tmp_path):
    model, variables, x, x_len, y, y_len = build_tiny_transducer()
    p = tmp_path / "lm.arpa"
    grams = "\n".join(f"-0.5\t{chr(i + 100)}" for i in range(1, 9))
    p.write_text(f"\\data\\\nngram 1=8\n\n\\1-grams:\n{grams}\n\n\\end\\\n")
    from efficientconformer_tpu.decoding.ngram import ArpaLM

    res = beam_search(
        model, variables, x[:1], x_len[:1], beam_size=2,
        ngram=ArpaLM(str(p), 100), ngram_alpha=0.3, ngram_beta=0.5,
    )
    assert len(res) == 1
