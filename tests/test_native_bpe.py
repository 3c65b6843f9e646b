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
