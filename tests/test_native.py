"""Native (C++) CTC beam search vs the pure-Python reference implementation."""

import os
import numpy as np
import pytest

from efficientconformer_tpu.decoding.ctc_beam import ctc_prefix_beam_search
from efficientconformer_tpu.decoding import native_binding as nb
from efficientconformer_tpu.decoding.ngram import ArpaLM

pytestmark = pytest.mark.skipif(
    not nb.available(), reason="native library not built and no compiler"
)


def rand_lp(rng, t, v):
    logits = rng.standard_normal((t, v)) * 2
    return (logits - np.log(np.exp(logits).sum(-1, keepdims=True))).astype(np.float32)


def test_native_matches_python_no_lm():
    rng = np.random.default_rng(0)
    for _ in range(5):
        lp = rand_lp(rng, 20, 12)
        py = ctc_prefix_beam_search(lp, 20, beam_size=8)
        cc = nb.ctc_beam_search_native(lp, 20, beam_size=8)
        assert py == cc


def test_native_matches_python_with_lm(tmp_path):
    p = str(tmp_path / "lm.arpa")
    with open(p, "w") as f:
        f.write(
            "\\data\\\nngram 1=4\nngram 2=2\n\n\\1-grams:\n"
            "-1.0\t<s>\t-0.5\n"
            "-0.3\t" + chr(101) + "\t-0.2\n"
            "-0.9\t" + chr(102) + "\t-0.1\n"
            "-1.2\t" + chr(103) + "\n\n\\2-grams:\n"
            "-0.2\t" + chr(101) + " " + chr(102) + "\n"
            "-0.7\t" + chr(102) + " " + chr(101) + "\n\n\\end\\\n"
        )
    pylm = ArpaLM(p, 100)
    cclm = nb.NativeArpa(p, 100)
    assert cclm.order == pylm.order == 2
    rng = np.random.default_rng(1)
    for _ in range(5):
        lp = rand_lp(rng, 15, 5)
        py = ctc_prefix_beam_search(lp, 15, beam_size=8, lm=pylm, alpha=0.8, beta=0.4)
        cc = nb.ctc_beam_search_native(lp, 15, beam_size=8, lm=cclm, alpha=0.8, beta=0.4)
        assert py == cc
