"""Drop-in ``sentencepiece`` module shim backed by our BPE runtime.

The image ships no sentencepiece package, but two interop paths need one:

1. Reference checkpoints pickle a ``sentencepiece.SentencePieceProcessor``
   inside the ``.ckpt`` dict (reference models/model.py:355 saves
   ``"tokenizer": self.tokenizer``). The real SP wrapper pickles via
   ``__getstate__ -> serialized_model_proto()`` bytes, so unpickling only
   needs a class at ``sentencepiece.SentencePieceProcessor`` whose
   ``__setstate__`` accepts those bytes — this shim parses them with
   data/spm_model.py and serves encode/decode from data/tokenizer.py.

2. Running the reference's own Python in-tree (decode-parity tests): with
   ``install()`` in ``sys.modules``, reference models/model.py:50 constructs
   a working tokenizer from a ``.model`` file (ours or a published one).

Only the surface the reference uses is implemented: the constructor,
``encode`` (int ids), ``decode`` (list or batch), ``vocab_size`` and
pickling. ``SentencePieceTrainer.train`` maps to our BPE trainer and writes
a real ``.model`` protobuf (reference utils/preprocessing.py:84).
"""

from __future__ import annotations

import sys
import types

from efficientconformer_tpu.data.tokenizer import BpeTokenizer, train_bpe, train_bpe_native


class SentencePieceProcessor:
    def __init__(self, model_file=None, *args, **kwargs):
        # The reference calls spm.SentencePieceProcessor(path) positionally
        # (models/model.py:50); the real API also accepts model_file=...
        self._tok = None
        self._proto = None
        if model_file is not None:
            self.Load(model_file)

    # -- loading ---------------------------------------------------------
    def Load(self, path):
        self._tok = BpeTokenizer.load(path)
        self._proto = getattr(self._tok, "_proto_bytes", None)
        if self._proto is None:
            self._proto = self._tok.to_sentencepiece_bytes()
        return True

    load = Load

    def LoadFromSerializedProto(self, data):
        self._tok = BpeTokenizer.from_sentencepiece(bytes(data))
        self._proto = bytes(data)
        return True

    def serialized_model_proto(self):
        if self._proto is None:
            raise RuntimeError("no model loaded")
        return self._proto

    # -- pickling (matches the real SP wrapper's protocol) ---------------
    def __getstate__(self):
        return self.serialized_model_proto()

    def __setstate__(self, state):
        self._tok = None
        self._proto = None
        if isinstance(state, (bytes, bytearray)):
            self.LoadFromSerializedProto(state)
        elif isinstance(state, dict):  # defensive: plain-dict state
            proto = state.get("_proto")
            if proto is not None:
                self.LoadFromSerializedProto(proto)

    # -- the API surface the reference uses ------------------------------
    @property
    def tokenizer(self) -> BpeTokenizer:
        if self._tok is None:
            raise RuntimeError("no model loaded")
        return self._tok

    def encode(self, text, out_type=int, **kwargs):
        if isinstance(text, (list, tuple)):
            return [self.encode(t, out_type=out_type) for t in text]
        ids = self.tokenizer.encode(text)
        if out_type is str:
            return [self.tokenizer.pieces[i] for i in ids]
        return ids

    Encode = encode
    encode_as_ids = encode
    EncodeAsIds = encode

    def decode(self, ids, **kwargs):
        return self.tokenizer.decode(ids)

    Decode = decode
    decode_ids = decode
    DecodeIds = decode

    def vocab_size(self):
        return self.tokenizer.vocab_size()

    get_piece_size = vocab_size
    GetPieceSize = vocab_size

    def __len__(self):
        return self.tokenizer.vocab_size()

    def id_to_piece(self, i):
        return self.tokenizer.pieces[i]

    IdToPiece = id_to_piece

    def piece_to_id(self, piece):
        return self.tokenizer.piece_to_id.get(piece, 0)

    PieceToId = piece_to_id


class SentencePieceTrainer:
    @staticmethod
    def train(*args, input=None, model_prefix=None, vocab_size=None,
              model_type="bpe", **kwargs):
        """Train our BPE on ``input`` and write ``<model_prefix>.model`` as a
        sentencepiece ModelProto (reference utils/preprocessing.py:84 call
        signature; bos/eos/unk_surface conventions are baked into
        BpeTokenizer)."""
        if args and input is None:  # real SP also accepts a single arg string
            raise TypeError("use keyword arguments (input=, model_prefix=, ...)")
        if model_type != "bpe":
            raise ValueError(f"shim supports model_type='bpe', got {model_type}")
        tok = train_bpe_native(input, int(vocab_size))
        if tok is None:
            with open(input) as f:
                tok = train_bpe(f, int(vocab_size))
        with open(model_prefix + ".model", "wb") as f:
            f.write(tok.to_sentencepiece_bytes())
        return True

    Train = train


def install() -> types.ModuleType:
    """Install this shim as ``sys.modules['sentencepiece']`` (no-op if a real
    sentencepiece is already importable)."""
    existing = sys.modules.get("sentencepiece")
    if existing is not None and getattr(existing, "__shim__", False):
        return existing
    if existing is not None:
        return existing  # a real sentencepiece wins
    try:
        import sentencepiece  # noqa: F401

        return sys.modules["sentencepiece"]
    except ImportError:
        pass
    mod = types.ModuleType("sentencepiece")
    mod.SentencePieceProcessor = SentencePieceProcessor
    mod.SentencePieceTrainer = SentencePieceTrainer
    # Pickles of shim processors must name the class as
    # "sentencepiece.SentencePieceProcessor" (what reference checkpoints
    # contain, and what a host with the real package can unpickle).
    SentencePieceProcessor.__module__ = "sentencepiece"
    SentencePieceTrainer.__module__ = "sentencepiece"
    mod.__shim__ = True
    sys.modules["sentencepiece"] = mod
    return mod
