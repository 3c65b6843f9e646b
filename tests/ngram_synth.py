"""Synthetic LibriSpeech-shaped ARPA generator (shared by tests and the
scale bench).

The reference decodes its headline WER numbers with a kenlm 6-gram over the
256-piece BPE vocabulary (``configs/*.json: ngram_path .../6gram_256.arpa``,
reference model_ctc.py:145-156) whose words are ``chr(id + 100)`` single
characters. This generates an ARPA file with the same shape — order 6,
char-mapped vocab, hierarchical entries satisfying the prefix property
(every entry's context is itself listed, as kenlm/SRILM guarantee) — at an
arbitrary entry count, so the device scorer's packing can be validated and
measured at real-model scale without the (undistributable) trained model.
"""

import numpy as np


def synth_arpa(path: str, vocab: int = 256, order: int = 6,
               counts=(0, 30_000, 60_000, 80_000, 90_000, 100_000),
               seed: int = 0, offset: int = 100) -> dict:
    """Write a synthetic ARPA file; returns {order: n_entries} actually
    written. ``counts[k-1]`` requests the number of k-grams (order 1 is
    always the full vocab + <s>); dedup may produce slightly fewer."""
    rng = np.random.default_rng(seed)
    words = [chr(i + offset) for i in range(vocab)] + ["<s>"]

    grams = {1: [(w,) for w in words]}
    for k in range(2, order + 1):
        want = counts[k - 1] if k - 1 < len(counts) else 0
        prev = grams[k - 1]
        picks_ctx = rng.integers(0, len(prev), want * 2)
        picks_w = rng.integers(0, len(words), want * 2)
        seen = set()
        out = []
        for ci, wi in zip(picks_ctx, picks_w):
            t = prev[ci] + (words[wi],)
            if t not in seen:
                seen.add(t)
                out.append(t)
                if len(out) >= want:
                    break
        grams[k] = out

    with open(path, "w") as f:
        f.write("\\data\\\n")
        for k in range(1, order + 1):
            f.write(f"ngram {k}={len(grams[k])}\n")
        f.write("\n")
        for k in range(1, order + 1):
            f.write(f"\\{k}-grams:\n")
            n = len(grams[k])
            logps = -(rng.random(n) * 3.7 + 0.3)       # log10 in [-4, -0.3]
            backoffs = -(rng.random(n) * 0.9)          # [-0.9, 0]
            has_bo = k < order
            for i, t in enumerate(grams[k]):
                line = f"{logps[i]:.4f}\t{' '.join(t)}"
                if has_bo:
                    line += f"\t{backoffs[i]:.4f}"
                f.write(line + "\n")
            f.write("\n")
        f.write("\\end\\\n")
    return {k: len(v) for k, v in grams.items()}
