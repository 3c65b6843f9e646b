"""Beam search + n-gram scorer tests."""

import math

import numpy as np
import pytest

from efficientconformer_tpu.decoding.ctc_beam import ctc_prefix_beam_search
from efficientconformer_tpu.decoding.ngram import ArpaLM


def test_ctc_beam_equals_bruteforce_on_tiny():
    """Beam search with a wide beam must find the exact MAP label sequence
    computed by brute-force enumeration over all label sequences."""
    rng = np.random.default_rng(0)
    t, v = 5, 4
    logits = rng.standard_normal((t, v)) * 2
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    def seq_prob(labels):
        # sum over all alignments via DP (CTC forward)
        ext = [0]
        for c in labels:
            ext += [c, 0]
        s = len(ext)
        NEG = -1e30
        alpha = np.full(s, NEG)
        alpha[0] = lp[0, 0]
        if s > 1:
            alpha[1] = lp[0, ext[1]]
        for tt in range(1, t):
            new = np.full(s, NEG)
            for i in range(s):
                acc = alpha[i]
                if i >= 1:
                    acc = np.logaddexp(acc, alpha[i - 1])
                if i >= 2 and ext[i] != 0 and ext[i] != ext[i - 2]:
                    acc = np.logaddexp(acc, alpha[i - 2])
                new[i] = acc + lp[tt, ext[i]]
            alpha = new
        out = alpha[s - 1]
        if s > 1:
            out = np.logaddexp(out, alpha[s - 2])
        return out

    import itertools

    best, best_p = None, -1e30
    for n in range(0, t + 1):
        for labels in itertools.product(range(1, v), repeat=n):
            # skip invalid (adjacent repeats need a blank, still valid labels)
            p = seq_prob(list(labels))
            if p > best_p:
                best, best_p = list(labels), p

    got = ctc_prefix_beam_search(lp, t, beam_size=64)
    assert got == best, (got, best)


ARPA = """\\data\\
ngram 1=4
ngram 2=3

\\1-grams:
-1.0\t<s>\t-0.5
-0.8\ta\t-0.3
-1.2\tb\t-0.2
-1.5\tc

\\2-grams:
-0.2\t<s> a
-0.4\ta b
-0.6\tb a

\\end\\
"""


def test_arpa_scoring(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA)
    lm = ArpaLM(str(p), ngram_offset=0)
    assert lm.order == 2

    # bigram hit: P(a | <s>) = -0.2
    s0 = lm.start_state()
    lpa, s1 = lm.score_word(s0, "a")
    assert lpa == pytest.approx(-0.2)
    # bigram hit: P(b | a) = -0.4
    lpb, s2 = lm.score_word(s1, "b")
    assert lpb == pytest.approx(-0.4)
    # backoff: P(c | b) = backoff(b) + P(c) = -0.2 + -1.5
    lpc, s3 = lm.score_word(s2, "c")
    assert lpc == pytest.approx(-1.7)
    # unknown word
    lpu, _ = lm.score_word(s3, "z")
    assert lpu <= -10.0


def test_ctc_beam_with_lm_prefers_lm_sequence(tmp_path):
    """With a strong LM, the beam should pick the LM-favoured labels."""
    p = tmp_path / "lm.arpa"
    # token ids 1,2 map to chr(1),chr(2) with offset 100 -> 'e','f'
    p.write_text(
        "\\data\\\nngram 1=3\n\n\\1-grams:\n-0.1\t" + chr(101) +
        "\n-2.0\t" + chr(102) + "\n-1.0\t<s>\n\n\\end\\\n"
    )
    lm = ArpaLM(str(p), ngram_offset=100)
    # acoustics slightly prefer token 2, LM strongly prefers token 1
    lp = np.log(np.array([[0.1, 0.42, 0.48]] * 3))
    no_lm = ctc_prefix_beam_search(lp, 3, beam_size=8)
    with_lm = ctc_prefix_beam_search(lp, 3, beam_size=8, lm=lm, alpha=2.0, beta=0.0)
    assert no_lm[0] == 2
    assert set(with_lm) == {1}
