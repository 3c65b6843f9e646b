"""Neural language model (reference models/lm.py): RNN or Transformer decoder +
vocab projection. Trained with CE (ignore -1) on the LibriSpeech LM corpus;
``step`` is the single-token decode API used for shallow fusion in transducer
beam search (reference transducer.py:260-273)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from efficientconformer_tpu.models.decoders import DECODERS
from efficientconformer_tpu.models.layers import Dense


class LanguageModel(nn.Module):
    lm_params: dict
    vocab_size: int

    def setup(self):
        self.decoder = DECODERS[self.lm_params["arch"]](
            params=self.lm_params, name="decoder"
        )
        self.fc = Dense(self.vocab_size, name="fc")

    def __call__(self, x, x_len=None, train: bool = False):
        """Teacher-forced pass. x (B, U) token ids; a leading blank is prepended
        (reference lm.py:65-81). Returns logits (B, U+1, V)."""
        x = jnp.pad(x, ((0, 0), (1, 0)))
        if x_len is not None:
            x_len = x_len + 1
        h = self.decoder(x, x_len, train)
        return self.fc(h)

    def step(self, y_t, carry):
        """One decode step: (B,) tokens -> (logits (B, V), carry)."""
        h, carry = self.decoder.step(y_t, carry)
        return self.fc(h), carry

    def init_carry(self, batch: int):
        if hasattr(self.decoder, "init_carry"):
            return self.decoder.init_carry(batch)
        return None

    def init_carry_fixed(self, batch: int, max_len: int):
        """Fixed-shape carry for on-device beam search: the RNN carry is
        already fixed-shape; Transformer decoders get a static-capacity KV
        cache with per-row positions."""
        if hasattr(self.decoder, "init_carry_fixed"):
            return self.decoder.init_carry_fixed(batch, max_len)
        return self.init_carry(batch)


def ce_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Cross entropy with ignore_index=-1, mean over non-ignored positions
    (reference models/losses.py:112-132)."""
    valid = targets >= 0
    t = jnp.where(valid, targets, 0)
    lp = jnp.take_along_axis(
        nn.log_softmax(logits.astype(jnp.float32), axis=-1), t[..., None], axis=-1
    )[..., 0]
    return -(lp * valid).sum() / jnp.maximum(valid.sum(), 1)
