"""Prediction networks / LM decoders (reference models/decoders.py).

All decoders expose two entry points:
  * ``__call__(y, y_len, train)`` — full-sequence teacher-forced pass;
  * ``step(y_t, carry)`` — single-token streaming step with an explicit carry,
    used by the batched transducer decode loops (the reference drives these
    through per-sample Python loops; here they are jit-compiled device steps).

Carry formats: RNN -> (h, c) stacked (num_layers, B, H); Transformer -> tuple
of per-block KV dicts; Conformer -> full token history (recompute, as in the
reference models/decoders.py:170-201).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from efficientconformer_tpu.config import BlockConfig
from efficientconformer_tpu.models.blocks import ConformerBlock, TransformerBlock
from efficientconformer_tpu.models.layers import LSTM, Embedding
from efficientconformer_tpu.ops.masks import streaming_mask
from efficientconformer_tpu.ops.pos_enc import absolute_encoding


def _compute_cast(params: dict, x):
    """Cast activations to the training compute dtype (bf16 under the
    reference's mixed_precision AMP flag, model.py:179,239). Applied on the
    teacher-forced path only — decode ``step`` loops stay fp32, matching the
    reference, whose autocast wraps the training forward but not decoding.
    All layers follow the activation dtype (weights stay fp32 masters)."""
    dt = params.get("compute_dtype")
    return x.astype(jnp.dtype(dt)) if dt else x


class RnnDecoder(nn.Module):
    """Embedding (padding_idx 0) + unidirectional LSTM stack
    (reference models/decoders.py:41-70)."""

    params: dict
    vn_std: Optional[float] = None

    def setup(self):
        p = self.params
        self.embedding = Embedding(
            p["vocab_size"], p["dim_model"], pad_idx=0, vn_std=self.vn_std,
            name="embedding",
        )
        self.rnn = LSTM(
            hidden_size=p["dim_model"],
            num_layers=p["num_layers"],
            vn_std=self.vn_std,
            name="rnn",
        )

    def __call__(self, y, y_len=None, train: bool = False):
        e = _compute_cast(self.params, self.embedding(y))
        out, _ = self.rnn(e)
        return out

    def step(self, y_t, carry):
        """y_t (B,) int tokens -> ((B, D), new_carry)."""
        e = self.embedding(y_t[:, None])
        out, carry = self.rnn(e, carry)
        return out[:, 0], carry

    def init_carry(self, batch: int):
        return self.rnn.init_carry(batch)


class TransformerDecoder(nn.Module):
    """Causal Transformer decoder with per-block KV-cache
    (reference models/decoders.py:72-134, with the constructor bug fixed —
    see blocks.TransformerBlock)."""

    params: dict
    vn_std: Optional[float] = None

    def setup(self):
        p = self.params
        self.embedding = Embedding(
            p["vocab_size"], p["dim_model"], pad_idx=0, name="embedding"
        )
        self.dropout = nn.Dropout(p["Pdrop"])
        self.blocks = [
            TransformerBlock(
                dim_model=p["dim_model"],
                ff_ratio=p["ff_ratio"],
                num_heads=p["num_heads"],
                dropout=p["Pdrop"],
                relative_pos_enc=p["relative_pos_enc"],
                causal=True,
                vn_std=self.vn_std,
                name=f"block_{i}",
            )
            for i in range(p["num_blocks"])
        ]

    def __call__(self, y, y_len=None, train: bool = False):
        p = self.params
        mask = streaming_mask(
            y.shape[1], y_len, p.get("left_context", p["max_pos_encoding"]), 0
        )
        x = _compute_cast(p, self.embedding(y))
        x = self.dropout(x, deterministic=not train)
        if not p["relative_pos_enc"]:
            x = x + absolute_encoding(y.shape[1], p["dim_model"]).astype(x.dtype)[None]
        for block in self.blocks:
            x, _ = block(x, mask, None, train)
        return x

    def step(self, y_t, carry):
        p = self.params
        x = self.embedding(y_t[:, None])
        fixed = (
            carry is not None and isinstance(carry[0], dict) and "pos" in carry[0]
        )
        if not p["relative_pos_enc"]:
            if fixed:
                # per-row positions (fixed-capacity cache)
                import jax.numpy as jnp

                enc = absolute_encoding(
                    carry[0]["k"].shape[1], p["dim_model"]
                ).astype(x.dtype)
                x = x + jnp.take(enc, carry[0]["pos"], axis=0)[:, None]
            else:
                pos = carry[0]["k"].shape[1] if carry is not None else 0
                enc = absolute_encoding(pos + 1, p["dim_model"]).astype(x.dtype)
                x = x + enc[None, pos:]
        new_carry = []
        for i, block in enumerate(self.blocks):
            x, hid = block(x, None, carry[i] if carry is not None else None, False)
            new_carry.append(hid)
        return x[:, 0], tuple(new_carry)

    def init_carry_fixed(self, batch: int, max_len: int):
        """Fixed-capacity per-block KV caches with per-row positions: carry
        shapes are static, so beam searches can stack/gather hypothesis
        states (decoding/rnnt_beam_device.py)."""
        import jax.numpy as jnp

        p = self.params
        d = p["dim_model"]
        return tuple(
            {
                "k": jnp.zeros((batch, max_len, d), jnp.float32),
                "v": jnp.zeros((batch, max_len, d), jnp.float32),
                "pos": jnp.zeros((batch,), jnp.int32),
            }
            for _ in range(p["num_blocks"])
        )


class ConformerDecoder(nn.Module):
    """Causal Conformer decoder; streaming recomputes from the full token
    history carried as the hidden state (reference models/decoders.py:136-201)."""

    params: dict
    vn_std: Optional[float] = None

    def setup(self):
        p = self.params
        cfg = BlockConfig(
            block_id=0,
            dim_model=p["dim_model"],
            dim_expand=p["dim_model"],
            ff_ratio=p["ff_ratio"],
            num_heads=p["num_heads"],
            kernel_size=p["kernel_size"],
            att_group_size=1,
            att_kernel_size=None,
            linear_att=False,
            dropout=p["Pdrop"],
            relative_pos_enc=p["relative_pos_enc"],
            max_pos_encoding=p["max_pos_encoding"],
            conv_stride=1,
            att_stride=1,
            causal=True,
        )
        self.embedding = Embedding(
            p["vocab_size"], p["dim_model"], pad_idx=0, name="embedding"
        )
        self.dropout = nn.Dropout(p["Pdrop"])
        self.blocks = [
            ConformerBlock(cfg, vn_std=self.vn_std, name=f"block_{i}")
            for i in range(p["num_blocks"])
        ]

    def __call__(self, y, y_len=None, train: bool = False):
        p = self.params
        mask = streaming_mask(
            y.shape[1], y_len, p.get("left_context", p["max_pos_encoding"]), 0
        )
        x = _compute_cast(p, self.embedding(y))
        x = self.dropout(x, deterministic=not train)
        if not p["relative_pos_enc"]:
            x = x + absolute_encoding(y.shape[1], p["dim_model"]).astype(x.dtype)[None]
        for block in self.blocks:
            x, _ = block(x, mask, None, train)
        return x


DECODERS = {
    "RNN": RnnDecoder,
    "Transformer": TransformerDecoder,
    "Conformer": ConformerDecoder,
}
