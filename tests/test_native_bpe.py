"""Native (C++) BPE encoder vs the pure-Python implementation."""

import pytest

from efficientconformer_tpu.data.tokenizer import BpeTokenizer, train_bpe
from efficientconformer_tpu.decoding import native_binding as nb

pytestmark = pytest.mark.skipif(
    not nb.available(), reason="native library not built and no compiler"
)


def test_native_encode_matches_python():
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "speech recognition with conformer models",
        "efficient grouped attention and progressive downsampling",
    ] * 20
    tok = train_bpe(corpus, 96)
    native = tok._native_encoder()
    assert native is not None

    py_tok = BpeTokenizer(tok.pieces, tok.merges)
    py_tok._native_tried = True  # pin the python path

    cases = corpus[:3] + [
        "unseen wordszz xyz", "a", "", "the the the",
        "punctuation-less lowercase text", "ünïcødé wörds",
    ]
    for t in cases:
        assert native.encode(t) == py_tok.encode(t), t
        assert tok.decode(tok.encode(t)) == py_tok.decode(py_tok.encode(t))


def test_native_trainer_matches_python_trainer(tmp_path):
    """The C++ BPE trainer (native/bpe_train.cpp) must reproduce the Python
    trainer exactly: same pieces, same merges, same encodings."""
    import os

    from efficientconformer_tpu.data.tokenizer import (
        train_bpe,
        train_bpe_native,
    )

    lines = [
        "the cat sat on the mat",
        "a dog ran in the park",
        "the bird flew over the tree",
        "cats and dogs play all day",
        "banana bandana and the band",
        "she sells sea shells by the sea shore",
    ] * 3
    corpus = os.path.join(str(tmp_path), "corpus.txt")
    with open(corpus, "w") as f:
        f.write("\n".join(lines) + "\n")

    native = train_bpe_native(corpus, 64)
    if native is None:
        import pytest

        pytest.skip("native library unavailable")
    python = train_bpe(lines, 64)
    assert native.pieces == python.pieces
    assert [tuple(m) for m in native.merges] == [tuple(m) for m in python.merges]
    for s in lines + ["unseen zebra words", "sea bandana"]:
        assert native.encode(s) == python.encode(s)


def test_native_trainer_scales(tmp_path):
    """Corpus-scale smoke: 50k lines train in seconds natively."""
    import os
    import time

    from efficientconformer_tpu.data.tokenizer import train_bpe_native

    import numpy as np

    rng = np.random.default_rng(0)
    vocab = ["the", "cat", "dog", "house", "tree", "banana", "runs", "sings",
             "blue", "green", "mountain", "river", "quick", "lazy", "stone"]
    corpus = os.path.join(str(tmp_path), "big.txt")
    with open(corpus, "w") as f:
        for _ in range(50_000):
            f.write(" ".join(rng.choice(vocab, 8)) + "\n")
    t0 = time.time()
    tok = train_bpe_native(corpus, 256)
    dt = time.time() - t0
    if tok is None:
        import pytest

        pytest.skip("native library unavailable")
    assert tok.vocab_size() <= 256
    assert dt < 30, dt
    ids = tok.encode("the quick dog runs")
    assert ids and all(i > 0 for i in ids)
