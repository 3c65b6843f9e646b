"""CTC / InterCTC models (reference models/model_ctc.py).

ModelCTC = ConformerEncoder + vocab projection. Greedy decoding is a fully
vectorised device op (argmax -> repeat/blank collapse -> left-compaction by
scatter) replacing the reference's per-sample per-frame Python loop
(model_ctc.py:90-136). Beam search with n-gram fusion lives in
``decoding/ctc_beam.py`` (host-side, fed device log-probs).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from efficientconformer_tpu.models.encoders import ConformerEncoder
from efficientconformer_tpu.models.layers import Dense


class ModelCTC(nn.Module):
    encoder_params: dict
    vocab_size: int
    interctc_blocks: Tuple[int, ...] = ()

    def setup(self):
        self.encoder = ConformerEncoder(
            params=self.encoder_params,
            vocab_size=self.vocab_size if self.interctc_blocks else None,
            interctc_blocks=self.interctc_blocks,
            name="encoder",
        )
        self.fc = Dense(self.vocab_size, name="fc")

    def __call__(self, x, x_len, train: bool = False):
        """(B, T_audio) -> (logits (B, T, V), logits_len, interctc_probs)."""
        enc, enc_len, interctc = self.encoder(x, x_len, train)
        return self.fc(enc), enc_len, interctc


def ctc_greedy_collapse(preds: jnp.ndarray, pred_len: jnp.ndarray, blank: int = 0):
    """Collapse framewise argmax ids: remove repeats then blanks, batched.

    preds (B, T) int, pred_len (B,) -> (tokens (B, T) 0-padded, n_tokens (B,)).
    """
    b, t = preds.shape
    prev = jnp.concatenate([jnp.full((b, 1), -1, preds.dtype), preds[:, :-1]], axis=1)
    valid = jnp.arange(t)[None, :] < pred_len[:, None]
    keep = (preds != blank) & (preds != prev) & valid
    pos = jnp.cumsum(keep, axis=1) - 1
    pos = jnp.where(keep, pos, t)  # dropped by scatter mode="drop"
    buf = jnp.zeros((b, t + 1), preds.dtype)
    buf = buf.at[jnp.arange(b)[:, None], pos].set(preds, mode="drop")
    return buf[:, :t], jnp.sum(keep, axis=1)


_DECODE_CACHE: dict = {}


def greedy_decode(model: ModelCTC, variables, x, x_len):
    """Greedy CTC decode, jit-compiled (cached per model instance):
    returns (token ids (B, T), counts (B,))."""
    key = id(model)
    if key not in _DECODE_CACHE:
        import jax

        def impl(variables, x, x_len):
            logits, logits_len, _ = model.apply(variables, x, x_len, False)
            preds = jnp.argmax(logits, axis=-1)
            return ctc_greedy_collapse(preds, logits_len)

        _DECODE_CACHE[key] = jax.jit(impl)
    return _DECODE_CACHE[key](variables, x, x_len)
