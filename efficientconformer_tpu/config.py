"""Configuration system.

Accepts the reference JSON schema verbatim (cf. /root/reference/configs/*.json and
the per-stage list-indexing logic of reference models/encoders.py:80-95), but parses
it *once* into typed dataclasses so that model construction is plain Python with no
scattered ``.get()`` defaults.

Schema groups: ``model_name``/``model_type`` plus ``encoder_params``,
``decoder_params``, ``joint_params``, ``lm_params``, ``tokenizer_params``,
``training_params``, ``decoding_params``.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional, Sequence


# ---------------------------------------------------------------------------
# Per-block (stage-resolved) encoder configuration
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BlockConfig:
    """Fully-resolved hyperparameters for one Conformer block.

    The reference keeps list-valued encoder params (dim_model, num_heads, ...)
    and indexes them per block with expand/strided block counting
    (reference models/encoders.py:80-95). We resolve that indexing once, here.
    """

    block_id: int
    dim_model: int          # input width of the block
    dim_expand: int         # output width (differs on expand blocks)
    ff_ratio: int
    num_heads: int
    kernel_size: int        # depthwise conv kernel
    att_group_size: int
    att_kernel_size: Optional[int]
    linear_att: bool
    dropout: float
    relative_pos_enc: bool
    max_pos_encoding: int
    conv_stride: int
    att_stride: int
    causal: bool

    @property
    def stride(self) -> int:
        return self.conv_stride * self.att_stride


def _count_lt(block_id: int, blocks: Sequence[int]) -> int:
    """#{b in blocks : b < block_id} — the reference's `(block_id > tensor(blocks)).sum()`."""
    return sum(1 for b in blocks if b < block_id)


def _count_le(block_id: int, blocks: Sequence[int]) -> int:
    """#{b in blocks : b <= block_id} — the reference's `(block_id >= tensor(blocks)).sum()`."""
    return sum(1 for b in blocks if b <= block_id)


def _pick(value: Any, index: int) -> Any:
    return value[index] if isinstance(value, (list, tuple)) else value


def resolve_block_configs(p: dict) -> list[BlockConfig]:
    """Resolve per-block hyperparameters from raw ``encoder_params``.

    Mirrors reference models/encoders.py:80-95 exactly, including the subtle
    >/>= distinction between dim_model (input dim: stage changes *after* the
    expand block) and dim_expand/kernel_size (output dim: changes *at* the
    expand block), and the att_kernel_size indexing by the (reference-spelled)
    "strided_layers" key.
    """
    expand = p.get("expand_blocks", [])
    strided = p.get("strided_blocks", [])
    causal = bool(p.get("causal", False))
    blocks = []
    for block_id in range(p["num_blocks"]):
        in_stage = _count_lt(block_id, expand)
        out_stage = _count_le(block_id, expand)
        att_stage = _count_lt(block_id, strided)
        is_strided = block_id in strided
        blocks.append(
            BlockConfig(
                block_id=block_id,
                dim_model=_pick(p["dim_model"], in_stage),
                dim_expand=_pick(p["dim_model"], out_stage),
                ff_ratio=p["ff_ratio"],
                num_heads=_pick(p["num_heads"], in_stage),
                kernel_size=_pick(p["kernel_size"], out_stage),
                att_group_size=_pick(p.get("att_group_size", 1), att_stage),
                att_kernel_size=_pick(
                    p.get("att_kernel_size", None),
                    _count_lt(block_id, p.get("strided_layers", [])),
                ),
                linear_att=bool(p.get("linear_att", False)),
                dropout=p["Pdrop"],
                relative_pos_enc=bool(p["relative_pos_enc"]),
                max_pos_encoding=p["max_pos_encoding"] // p.get("stride", 2) ** att_stage,
                conv_stride=(_pick(p["conv_stride"], att_stage) if is_strided else 1),
                att_stride=(_pick(p["att_stride"], att_stage) if is_strided else 1),
                causal=causal,
            )
        )
    return blocks


def encoder_output_frames(p: dict, audio_samples: int) -> int:
    """Number of encoder output frames for ``audio_samples`` raw samples,
    applying the exact reference length formulas: frontend T//hop + 1
    (modules.py:96-100), subsampling (l-1)//2 + 1 per layer ((l)//2 for VGG),
    and (l-1)//stride + 1 after each strided block (encoders.py:132-140)."""
    hop = p["sample_rate"] * p["hop_length_ms"] // 1000
    frames = audio_samples // hop + 1
    vgg = p.get("subsampling_module") == "VGG"
    for _ in range(p.get("subsampling_layers", 1)):
        frames = frames // 2 if vgg else (frames - 1) // 2 + 1
    for b in resolve_block_configs(p):
        if b.stride > 1:
            frames = (frames - 1) // b.stride + 1
    return frames


# ---------------------------------------------------------------------------
# Top-level config
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Config:
    """Parsed experiment configuration (reference-compatible JSON schema)."""

    model_name: str
    model_type: str                       # "CTC" | "InterCTC" | "Transducer" | "LM"
    encoder_params: dict
    decoder_params: dict
    joint_params: dict
    lm_params: dict
    tokenizer_params: dict
    training_params: dict
    decoding_params: dict
    raw: dict

    @property
    def blocks(self) -> list[BlockConfig]:
        return resolve_block_configs(self.encoder_params)

    # ---- frequently used typed accessors -------------------------------

    @property
    def vocab_size(self) -> int:
        return self.tokenizer_params["vocab_size"]

    @property
    def encoder_out_dim(self) -> int:
        d = self.encoder_params["dim_model"]
        return d[-1] if isinstance(d, list) else d

    @property
    def total_stride(self) -> int:
        """Total time downsampling of the encoder: subsampling x block strides."""
        sub = 2 ** self.encoder_params.get("subsampling_layers", 1)
        for b in self.blocks:
            sub *= b.stride
        return sub


def from_dict(config: dict) -> Config:
    return Config(
        model_name=config.get("model_name", "model"),
        model_type=config["model_type"],
        encoder_params=config.get("encoder_params", {}),
        decoder_params=config.get("decoder_params", {}),
        joint_params=config.get("joint_params", {}),
        lm_params=config.get("lm_params", {}),
        tokenizer_params=config.get("tokenizer_params", {}),
        training_params=config.get("training_params", {}),
        decoding_params=config.get("decoding_params", {}),
        raw=config,
    )


def load_config(path: str) -> Config:
    with open(path) as f:
        return from_dict(json.load(f))
