"""BPE tokenizer with sentencepiece-compatible conventions.

Replaces the sentencepiece C++ dependency (reference utils/preprocessing.py:84,
models/model.py:50): id 0 is <unk> (shared with the CTC/RNN-T blank, decoded to
the empty string like the reference's unk_surface=""), bos/eos are disabled, and
word boundaries use the U+2581 marker with a dummy prefix on every word.

Training is standard BPE (greedy highest-frequency pair merging over the word
frequency table); encoding applies merges in rank order per word. The model is
persisted as JSON at ``tokenizer_path`` (the reference's .model path).

Pure Python with an O(words x merges) encode; a C++ fast path can be slotted in
behind the same interface if corpus-scale throughput demands it.
"""

from __future__ import annotations

import collections
import json
import os
from typing import Dict, Iterable, List, Tuple

WORD_BOUNDARY = "▁"  # ▁
UNK_ID = 0
UNK_PIECE = "<unk>"


class BpeTokenizer:
    def __init__(self, pieces: List[str], merges: List[Tuple[str, str]]):
        self.pieces = pieces                       # index == id; pieces[0] == <unk>
        self.piece_to_id: Dict[str, int] = {p: i for i, p in enumerate(pieces)}
        self.merges = merges
        self.merge_rank: Dict[Tuple[str, str], int] = {
            tuple(m): i for i, m in enumerate(merges)
        }
        self._encode_cache: Dict[str, List[int]] = {}
        self._native = None
        self._native_tried = False

    def _native_encoder(self):
        """Lazily build the C++ encoder (native/bpe_encode.cpp); None if the
        native library is unavailable."""
        if not self._native_tried:
            self._native_tried = True
            try:
                from efficientconformer_tpu.data import tokenizer_native

                self._native = tokenizer_native.NativeBpe(self.pieces, self.merges)
            except Exception:
                self._native = None
        return self._native

    # ------------------------------------------------------------------ api

    def vocab_size(self) -> int:
        return len(self.pieces)

    def encode(self, text: str) -> List[int]:
        native = self._native_encoder()
        if native is not None:
            return native.encode(text)
        ids: List[int] = []
        for word in text.split():
            key = WORD_BOUNDARY + word
            cached = self._encode_cache.get(key)
            if cached is None:
                cached = self._encode_word(key)
                if len(self._encode_cache) < 1_000_000:
                    self._encode_cache[key] = cached
            ids.extend(cached)
        return ids

    def decode(self, ids) -> "str | list[str]":
        """Decode a list of ids, or a batch (list of lists) to strings."""
        if len(ids) and isinstance(ids[0], (list, tuple)):
            return [self.decode(seq) for seq in ids]
        text = "".join(
            self.pieces[i] if 0 < i < len(self.pieces) else "" for i in ids
        )
        return text.replace(WORD_BOUNDARY, " ").strip()

    # ------------------------------------------------------------ internals

    def _encode_word(self, word: str) -> List[int]:
        symbols = list(word)
        while len(symbols) > 1:
            best_rank, best_i = None, -1
            for i in range(len(symbols) - 1):
                r = self.merge_rank.get((symbols[i], symbols[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
        return [self.piece_to_id.get(s, UNK_ID) for s in symbols]

    # ---------------------------------------------------------- persistence

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump({"pieces": self.pieces, "merges": self.merges}, f)

    @classmethod
    def load(cls, path: str) -> "BpeTokenizer":
        with open(path) as f:
            d = json.load(f)
        return cls(d["pieces"], [tuple(m) for m in d["merges"]])


def train_bpe_native(corpus_path: str, vocab_size: int,
                     lowercase: bool = False) -> "BpeTokenizer | None":
    """Train with the C++ trainer (native/bpe_train.cpp) — identical output
    to ``train_bpe`` (same merge rule and tie-break), built for corpus scale
    (the 40M-line LM corpus). Returns None if the native library is
    unavailable."""
    import ctypes

    try:
        from efficientconformer_tpu.decoding import native_binding

        lib = native_binding._load()
    except Exception:
        return None
    if lib is None:
        return None
    if not hasattr(lib, "ecf_bpe_train"):
        return None
    lib.ecf_bpe_train.restype = ctypes.c_void_p
    lib.ecf_bpe_train.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.ecf_bpe_result_size.restype = ctypes.c_longlong
    lib.ecf_bpe_result_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ecf_bpe_result.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p]
    lib.ecf_bpe_train_free.argtypes = [ctypes.c_void_p]

    h = lib.ecf_bpe_train(corpus_path.encode(), vocab_size, int(lowercase))
    if not h:
        return None
    try:
        def blob(which):
            n = lib.ecf_bpe_result_size(h, which)
            buf = ctypes.create_string_buffer(int(n))
            lib.ecf_bpe_result(h, which, buf)
            return buf.raw.decode()

        pieces = [UNK_PIECE] + [p for p in blob(0).split("\n") if p]
        merges = [
            tuple(line.split("\t"))
            for line in blob(1).split("\n")
            if line
        ]
    finally:
        lib.ecf_bpe_train_free(h)
    return BpeTokenizer(pieces, merges)


def train_bpe(lines: Iterable[str], vocab_size: int) -> BpeTokenizer:
    """Train a BPE model: character alphabet + merges until vocab_size pieces
    (including <unk> at id 0) or no pair occurs twice."""
    word_freq = collections.Counter()
    for line in lines:
        for w in line.strip().split():
            word_freq[WORD_BOUNDARY + w] += 1

    words: List[List[str]] = [list(w) for w in word_freq]
    freqs: List[int] = [word_freq[w] for w in word_freq]

    alphabet = sorted({c for w in words for c in w})
    pieces = [UNK_PIECE] + alphabet
    merges: List[Tuple[str, str]] = []

    # pair counts + locations
    def count_pairs():
        pc = collections.Counter()
        for w, f in zip(words, freqs):
            for i in range(len(w) - 1):
                pc[(w[i], w[i + 1])] += f
        return pc

    pair_counts = count_pairs()
    while len(pieces) < vocab_size and pair_counts:
        (a, b), n = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))
        if n < 2:
            break
        merges.append((a, b))
        pieces.append(a + b)
        new = a + b
        for wi, w in enumerate(words):
            if len(w) < 2:
                continue
            i = 0
            changed = False
            while i < len(w) - 1:
                if w[i] == a and w[i + 1] == b:
                    f = freqs[wi]
                    if i > 0:
                        pair_counts[(w[i - 1], a)] -= f
                        pair_counts[(w[i - 1], new)] += f
                    if i + 2 < len(w):
                        pair_counts[(b, w[i + 2])] -= f
                        pair_counts[(new, w[i + 2])] += f
                    w[i : i + 2] = [new]
                    changed = True
                else:
                    i += 1
            if changed:
                pass
        pair_counts.pop((a, b), None)
        pair_counts = +pair_counts  # drop non-positive
    return BpeTokenizer(pieces, merges)
