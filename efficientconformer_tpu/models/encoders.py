"""Conformer encoder (reference models/encoders.py).

Pipeline: log-mel frontend -> SpecAugment (train) -> conv subsampling ->
padding/streaming mask -> linear projection -> dropout -> [abs pos enc] ->
N ConformerBlocks with per-stage widths/heads/kernels resolved by
``config.resolve_block_configs``. After each strided block the mask is
sliced ``[::stride, ::stride]`` and x_len updated ``(l-1)//stride + 1``
(reference models/encoders.py:132-140).

The whole encoder is one jit-compiled function of statically-shaped inputs.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from efficientconformer_tpu.config import resolve_block_configs
from efficientconformer_tpu.models.blocks import ConformerBlock
from efficientconformer_tpu.models.layers import Dense, FlattenDense
from efficientconformer_tpu.models.modules import (
    SUBSAMPLING,
    AudioPreprocessing,
    SpecAugment,
)
from efficientconformer_tpu.ops.masks import padding_mask, streaming_mask
from efficientconformer_tpu.ops.pos_enc import absolute_encoding
from efficientconformer_tpu.parallel.mesh import seq_constraint


class ConformerEncoder(nn.Module):
    params: dict                      # raw encoder_params (reference schema)
    vocab_size: Optional[int] = None  # set for the InterCTC variant
    interctc_blocks: tuple = ()
    vn_std: Optional[float] = None

    @nn.compact
    def __call__(self, x, x_len=None, train: bool = False):
        """x: (B, T_audio) raw waveform. Returns (x, x_len, interctc_probs)."""
        p = self.params
        blocks = resolve_block_configs(p)

        # Frontend + SpecAugment (device ops)
        x, x_len = AudioPreprocessing(
            sample_rate=p["sample_rate"],
            n_fft=p["n_fft"],
            win_length_ms=p["win_length_ms"],
            hop_length_ms=p["hop_length_ms"],
            n_mels=p["n_mels"],
            normalize=p["normalize"],
            mean=p["mean"],
            std=p["std"],
            name="preprocessing",
        )(x, x_len)
        x = SpecAugment(
            spec_augment=p["spec_augment"],
            mF=p["mF"], F=p["F"], mT=p["mT"], pS=p["pS"],
            name="augment",
        )(x, x_len, train)

        # Optional low-precision compute policy: frontend stays fp32 (log-mel
        # overflow guard), everything after runs in bf16 on the MXU; params
        # remain fp32 masters (layers cast weights to the activation dtype).
        compute_dtype = p.get("compute_dtype")
        if compute_dtype:
            x = x.astype(jnp.dtype(compute_dtype))

        # Optional sequence parallelism (runtime key "seq_mesh", injected by
        # the Trainer — never from config files): activations are sharded
        # along TIME over the mesh's "seq" axis. GSPMD derives the implied
        # collectives (halo exchange for convs/subsampling, K/V gathers for
        # attention) from these constraints; parameters stay replicated over
        # "seq". The constraint is re-asserted after subsampling and after
        # every block so sharding survives the stride changes.
        seq_mesh = p.get("seq_mesh")
        x = seq_constraint(x, seq_mesh)

        # Subsampling. The 2-D modules keep their (B, T, M, C) conv layout
        # (flatten=False) so the input projection below can consume it as a
        # 1xM conv — see layers.FlattenDense for why (layout-copy traffic at
        # the flatten boundary on TPU).
        sub_cls = SUBSAMPLING[p["subsampling_module"]]
        sub_kwargs = dict(
            num_layers=p["subsampling_layers"],
            filters=p["subsampling_filters"],
            kernel_size=p["subsampling_kernel_size"],
            norm=p["subsampling_norm"],
            act=p["subsampling_act"],
            name="subsampling",
        )
        if "flatten" in sub_cls.__dataclass_fields__:
            sub_kwargs["flatten"] = False
        x, x_len = sub_cls(**sub_kwargs)(x, x_len, train)
        x = seq_constraint(x, seq_mesh)

        # Padding / streaming mask. The encoder default is full context
        # (left = right = max_pos_encoding, reference models/encoders.py:68);
        # in that case the (B,1,T,T) streaming mask degenerates to a pure
        # key-padding mask, which we keep as (B,1,1,T) — broadcast inside
        # attention — instead of materialising O(T^2) mask traffic per stage.
        left = p.get("left_context", p["max_pos_encoding"])
        right = 0 if p.get("causal", False) else p.get(
            "right_context", p["max_pos_encoding"]
        )
        t_frames = x.shape[1]
        if left >= t_frames and right >= t_frames:
            mask = padding_mask(t_frames, x_len)
        else:
            mask = streaming_mask(t_frames, x_len, left, right)

        # Linear projection + dropout (FlattenDense: same params/math as
        # Dense on the flattened features, applied in the conv layout)
        dim0 = blocks[0].dim_model
        if x.ndim == 4:
            x = FlattenDense(dim0, name="linear")(x)
        else:
            x = Dense(dim0, name="linear")(x)
        x = nn.Dropout(p["Pdrop"], deterministic=not train)(x)

        # Absolute positional encoding (only when not using rel-pos attention)
        if not p["relative_pos_enc"]:
            x = x + absolute_encoding(x.shape[1], dim0).astype(x.dtype)[None]

        # Optional rematerialisation: recompute block activations in the
        # backward pass instead of storing them (jax.checkpoint), trading
        # FLOPs for HBM. Config key: encoder_params["remat"]:
        #   False          — save everything (no remat)
        #   True / "full"  — save nothing, recompute the whole block
        #   "dots"         — save matmul/attention outputs, recompute only the
        #                    elementwise chains (norms, activations, dropout):
        #                    removes bandwidth, not MXU FLOPs — the right trade
        #                    for the HBM-bound train step (NOTES_ROUND3.md)
        remat_opt = p.get("remat")
        if remat_opt:
            import jax

            policy = (
                jax.checkpoint_policies.dots_saveable
                if remat_opt == "dots"
                else None  # save-nothing
            )
            block_cls = nn.remat(
                ConformerBlock, static_argnums=(4,), policy=policy
            )
        else:
            block_cls = ConformerBlock

        interctc_probs = []
        for i, cfg in enumerate(blocks):
            x, _ = block_cls(cfg, vn_std=self.vn_std, name=f"block_{i}")(
                x, mask, None, train
            )
            x = seq_constraint(x, seq_mesh)
            if cfg.stride > 1:
                if mask is not None:
                    mask = mask[:, :, :: cfg.stride, :: cfg.stride]
                if x_len is not None:
                    x_len = (x_len - 1) // cfg.stride + 1
            if i in self.interctc_blocks:
                probs = nn.softmax(
                    Dense(self.vocab_size, name=f"interctc_fc_{i}")(x), axis=-1
                )
                interctc_probs.append(probs)
                x = x + Dense(cfg.dim_expand, name=f"interctc_proj_{i}")(probs)

        return x, x_len, interctc_probs
