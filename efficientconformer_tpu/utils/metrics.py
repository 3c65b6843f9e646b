"""Word error rate (replaces the jiwer dependency of reference models/model.py).

wer = (S + D + I) / N over the whole corpus, computed with a standard
Levenshtein DP on whitespace-tokenised, lower-cased strings (the reference
passes standardize=True to jiwer, which lower-cases and collapses whitespace).
"""

from __future__ import annotations

from typing import List, Sequence


def _edit_distance(ref: Sequence[str], hyp: Sequence[str]) -> int:
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        for j in range(1, m + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[m]


def _words(s: str) -> List[str]:
    return s.lower().split()


def wer(truths: Sequence[str], preds: Sequence[str]) -> float:
    """Corpus-level WER: total edits / total reference words."""
    assert len(truths) == len(preds)
    edits = 0
    n_words = 0
    for t, p in zip(truths, preds):
        tw, pw = _words(t), _words(p)
        edits += _edit_distance(tw, pw)
        n_words += len(tw)
    return edits / max(n_words, 1)
