"""Datasets (reference utils/datasets.py).

LibriSpeech is described by a *manifest* per split — one JSON line per
utterance {audio, audio_len, labels} — written by ``preparation.prepare_dataset``
(replacing the reference's per-file ``torch.save`` caches next to each flac).
Length filtering (train_audio_max_length / train_label_max_length,
reference datasets.py:51-61) happens at manifest load.

``LibriSpeechCorpusDataset`` streams the 40M-line LM corpus, tokenizing on the
fly and resampling lines over max_len like the reference (datasets.py:72-78).
"""

from __future__ import annotations

import glob
import json
import os
import random
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from efficientconformer_tpu.data.audio_io import load_audio
from efficientconformer_tpu.data.tokenizer import BpeTokenizer


@dataclass
class Utterance:
    audio_path: str
    audio_len: int
    labels: List[int]

    @property
    def label_len(self) -> int:
        return len(self.labels)


def manifest_path(dataset_path: str, split: str, vocab_type: str, vocab_size: int) -> str:
    return os.path.join(
        dataset_path, f"manifest_{split}_{vocab_type}_{vocab_size}.jsonl"
    )


class LibriSpeechDataset:
    """Manifest-backed audio+label dataset.

    split examples: "train-clean-100", "dev-clean", "test-other", or the
    aggregate "train" (all train-* manifests).
    """

    def __init__(
        self,
        dataset_path: str,
        split: str,
        *,
        vocab_type: str = "bpe",
        vocab_size: int = 256,
        audio_max_length: Optional[int] = None,
        label_max_length: Optional[int] = None,
        lm_mode: bool = False,
    ):
        # lm_mode: labels-only dataset for LM evaluation on transcripts
        # (reference utils/datasets.py:33,42-43)
        self.lm_mode = lm_mode
        paths = sorted(
            glob.glob(manifest_path(dataset_path, split + "*", vocab_type, vocab_size))
        )
        if not paths:
            raise FileNotFoundError(
                f"no manifest for split {split!r} under {dataset_path}; "
                "run prepare_dataset first"
            )
        self.utterances: List[Utterance] = []
        for p in paths:
            with open(p) as f:
                for line in f:
                    d = json.loads(line)
                    u = Utterance(d["audio"], d["audio_len"], d["labels"])
                    if audio_max_length is not None and u.audio_len > audio_max_length:
                        continue
                    if label_max_length is not None and u.label_len > label_max_length:
                        continue
                    self.utterances.append(u)

    def __len__(self):
        return len(self.utterances)

    def __getitem__(self, i: int):
        u = self.utterances[i]
        if self.lm_mode:
            return np.asarray(u.labels, np.int32)
        audio, _sr = load_audio(u.audio_path)
        return audio, np.asarray(u.labels, np.int32)

    @property
    def max_label_len(self) -> int:
        return max((u.label_len for u in self.utterances), default=1)


class LibriSpeechCorpusDataset:
    """Text corpus for LM training: tokenize on the fly, resample lines that
    exceed max_len (reference utils/datasets.py:64-82)."""

    def __init__(self, corpus_path: str, tokenizer: BpeTokenizer,
                 max_len: Optional[int] = None, seed: int = 0):
        with open(corpus_path) as f:
            self.lines = f.readlines()
        self.tokenizer = tokenizer
        self.max_len = max_len
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.lines)

    def __getitem__(self, i: int):
        while True:
            ids = self.tokenizer.encode(self.lines[i].rstrip("\n").lower())
            if self.max_len is None or len(ids) <= self.max_len:
                return np.asarray(ids, np.int32)
            i = self.rng.randrange(len(self.lines))
