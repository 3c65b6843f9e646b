"""On-device CTC prefix beam search vs the host Python spec
(decoding/ctc_beam.ctc_prefix_beam_search — itself equivalence-tested
against the C++ implementation and exhaustive MAP enumeration)."""

import numpy as np
import jax.numpy as jnp
import pytest

from efficientconformer_tpu.decoding.ctc_beam import ctc_prefix_beam_search
from efficientconformer_tpu.decoding.ctc_beam_device import (
    ctc_beam_search_device,
)
from efficientconformer_tpu.decoding.ngram import ArpaLM


def random_log_probs(b, t, v, seed, peaky=False):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, t, v)) * (3.0 if peaky else 1.0)
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    return lp.astype(np.float32)


@pytest.mark.parametrize("seed,peaky", [(0, False), (1, True), (2, False)])
@pytest.mark.parametrize("w", [2, 4])
def test_device_matches_python_spec(seed, peaky, w):
    b, t, v = 3, 12, 7
    lp = random_log_probs(b, t, v, seed, peaky)
    seq_len = np.array([t, t - 3, t - 5])
    got = ctc_beam_search_device(
        jnp.asarray(lp), jnp.asarray(seq_len), beam_size=w
    )
    for i in range(b):
        want = ctc_prefix_beam_search(lp[i], int(seq_len[i]), beam_size=w)
        assert got[i] == want, (i, got[i], want)


def test_device_matches_python_spec_with_ngram(tmp_path):
    a, b_, c = chr(101), chr(102), chr(103)
    p = tmp_path / "lm.arpa"
    p.write_text(
        "\\data\\\nngram 1=4\nngram 2=3\n\n\\1-grams:\n"
        f"-1.0\t<s>\t-0.5\n-0.8\t{a}\t-0.3\n-1.2\t{b_}\t-0.2\n-1.5\t{c}\n\n"
        f"\\2-grams:\n-0.2\t<s> {a}\n-0.4\t{a} {b_}\n-0.6\t{b_} {a}\n\n"
        "\\end\\\n"
    )
    lm = ArpaLM(str(p), ngram_offset=100)

    b, t, v = 2, 10, 6
    lp = random_log_probs(b, t, v, 5)
    seq_len = np.array([t, t - 2])
    got = ctc_beam_search_device(
        jnp.asarray(lp), jnp.asarray(seq_len), beam_size=4,
        ngram=lm, alpha=0.4, beta=0.3,
    )
    for i in range(b):
        want = ctc_prefix_beam_search(
            lp[i], int(seq_len[i]), beam_size=4, lm=lm, alpha=0.4, beta=0.3
        )
        assert got[i] == want, (i, got[i], want)


def test_device_beam_wide_vs_exhaustive_map():
    """With a wide beam on tiny inputs the search must find the MAP labeling
    (same oracle the host spec is tested against)."""
    import itertools

    b, t, v = 1, 5, 3
    lp = random_log_probs(b, t, v, 9)
    got = ctc_beam_search_device(
        jnp.asarray(lp), jnp.asarray([t]), beam_size=32
    )[0]

    def collapse(path):
        out, prev = [], -1
        for s in path:
            if s != 0 and s != prev:
                out.append(s)
            prev = s
        return tuple(out)

    scores = {}
    for path in itertools.product(range(v), repeat=t):
        sc = sum(lp[0, i, s] for i, s in enumerate(path))
        key = collapse(path)
        scores[key] = np.logaddexp(scores.get(key, -np.inf), sc)
    want = max(scores, key=scores.get)
    assert tuple(got) == want
