"""Conformer / Transformer blocks (reference models/blocks.py).

ConformerBlock: x + ½FFN -> MHSA (+ strided residual) -> Conv (+ expand/stride
residual) -> x + ½FFN -> LayerNorm. ``stride = conv_stride * att_stride`` is the
block's total time downsampling; residual paths use pointwise-conv when the
width expands and plain slicing (== MaxPool1d(kernel=1, stride)) when striding.
"""

from __future__ import annotations

from typing import Optional

from flax import linen as nn

from efficientconformer_tpu.config import BlockConfig
from efficientconformer_tpu.models.layers import Conv1d, LayerNorm
from efficientconformer_tpu.models.modules import (
    ConvolutionModule,
    FeedForwardModule,
    MultiHeadSelfAttentionModule,
)


class ConformerBlock(nn.Module):
    cfg: BlockConfig
    vn_std: Optional[float] = None

    @nn.compact
    def __call__(self, x, mask=None, hidden=None, train: bool = False):
        c = self.cfg

        x = x + 0.5 * FeedForwardModule(
            dim_model=c.dim_model,
            dim_ffn=c.dim_model * c.ff_ratio,
            dropout=c.dropout,
            act="swish",
            inner_dropout=True,
            vn_std=self.vn_std,
            name="ffn1",
        )(x, train)

        x_att, hidden = MultiHeadSelfAttentionModule(
            dim_model=c.dim_model,
            num_heads=c.num_heads,
            dropout=c.dropout,
            relative_pos_enc=c.relative_pos_enc,
            causal=c.causal,
            group_size=c.att_group_size,
            kernel_size=c.att_kernel_size,
            stride=c.att_stride,
            linear_att=c.linear_att,
            vn_std=self.vn_std,
            name="mhsa_module",
        )(x, mask, hidden, train)
        if c.att_stride > 1:
            x = x[:, :: c.att_stride]
        x = x + x_att

        x_conv = ConvolutionModule(
            dim_model=c.dim_model,
            dim_expand=c.dim_expand,
            kernel_size=c.kernel_size,
            dropout=c.dropout,
            stride=c.conv_stride,
            causal=c.causal,
            vn_std=self.vn_std,
            name="conv_module",
        )(x, train)
        if c.dim_model != c.dim_expand:
            res = Conv1d(c.dim_expand, 1, stride=c.conv_stride, name="conv_res")(x)
        elif c.conv_stride > 1:
            res = x[:, :: c.conv_stride]
        else:
            res = x
        x = res + x_conv

        x = x + 0.5 * FeedForwardModule(
            dim_model=c.dim_expand,
            dim_ffn=c.dim_expand * c.ff_ratio,
            dropout=c.dropout,
            act="swish",
            inner_dropout=True,
            vn_std=self.vn_std,
            name="ffn2",
        )(x, train)

        return LayerNorm(name="norm")(x), hidden


class TransformerBlock(nn.Module):
    """Pre-LN transformer block for LMs / prediction networks
    (reference models/blocks.py:139-176, with the stale-kwarg bug fixed:
    the reference passes efficient_att=False which raises a TypeError for any
    Transformer LM; we build the intended plain/rel-pos causal attention)."""

    dim_model: int
    ff_ratio: int
    num_heads: int
    dropout: float
    relative_pos_enc: bool
    causal: bool
    vn_std: Optional[float] = None

    @nn.compact
    def __call__(self, x, mask=None, hidden=None, train: bool = False):
        x_att, hidden = MultiHeadSelfAttentionModule(
            dim_model=self.dim_model,
            num_heads=self.num_heads,
            dropout=self.dropout,
            relative_pos_enc=self.relative_pos_enc,
            causal=self.causal,
            vn_std=self.vn_std,
            name="mhsa_module",
        )(x, mask, hidden, train)
        x = x + x_att
        x = x + FeedForwardModule(
            dim_model=self.dim_model,
            dim_ffn=self.dim_model * self.ff_ratio,
            dropout=self.dropout,
            act="relu",
            inner_dropout=False,
            vn_std=self.vn_std,
            name="ffn",
        )(x, train)
        return x, hidden
