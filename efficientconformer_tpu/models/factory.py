"""Model factory (reference functions.py:34-83): build the task model + loss
from a parsed Config."""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
from flax import linen as nn

from efficientconformer_tpu.config import Config
from efficientconformer_tpu.models.lm import LanguageModel, ce_loss
from efficientconformer_tpu.models.model_ctc import ModelCTC
from efficientconformer_tpu.models.transducer import Transducer
from efficientconformer_tpu.ops.ctc_loss import ctc_loss
from efficientconformer_tpu.ops.rnnt_loss import rnnt_loss


def create_model(config: Config, seq_mesh=None) -> Tuple[nn.Module, Callable]:
    """Returns (module, loss_fn). loss_fn(outputs, batch) -> scalar loss.

    Batch formats (mirroring reference collate, utils/preprocessing.py:27-64):
    ASR: {audio (B,T), labels (B,U), audio_len (B,), label_len (B,)};
    LM:  {tokens (B,U), token_len (B,), targets (B,U+1) with -1 padding}.

    ``seq_mesh``: a Mesh with a "seq" axis — encoder activations are then
    sharded along time (sequence parallelism; see encoders.py). Runtime-only:
    injected by the Trainer, never read from config files.
    """
    mtype = config.model_type
    vn_std = config.training_params.get("vn_std", None)

    # mixed_precision (reference AMP, model.py:179,239) maps to a bf16 compute
    # policy: fp32 frontend + params, bf16 activations on the MXU. No loss
    # scaling is needed on TPU (bf16 keeps the fp32 exponent range).
    mixed = bool(config.training_params.get("mixed_precision"))

    def with_policy(params: dict) -> dict:
        params = dict(params)
        if mixed and "compute_dtype" not in params:
            params["compute_dtype"] = "bfloat16"
        return params

    enc_params = with_policy(config.encoder_params)
    if seq_mesh is not None and "seq" in seq_mesh.axis_names:
        enc_params["seq_mesh"] = seq_mesh

    if mtype == "Transducer":
        # prediction net + joint follow the bf16 policy on the teacher-forced
        # lattice path (the reference autocasts the whole training forward);
        # decode step loops stay fp32 like the reference's un-autocast decoding
        model = Transducer(
            encoder_params=enc_params,
            decoder_params=with_policy(config.decoder_params),
            joint_params=with_policy(config.joint_params),
            vocab_size=config.decoder_params["vocab_size"],
            vn_std=vn_std,
        )

        def loss_fn(outputs, batch):
            logits, f_len = outputs
            return rnnt_loss(
                logits, batch["labels"], f_len, batch["label_len"]
            ).mean()

        return model, loss_fn

    if mtype in ("CTC", "InterCTC"):
        interctc_blocks = tuple(
            config.encoder_params.get("interctc_blocks", ())
        ) if mtype == "InterCTC" else ()
        model = ModelCTC(
            encoder_params=enc_params,
            vocab_size=config.vocab_size,
            interctc_blocks=interctc_blocks,
        )
        lam = config.training_params.get("interctc_lambda", 0.5)

        def loss_fn(outputs, batch):
            logits, f_len, interctc = outputs
            lp = nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            main = ctc_loss(lp, batch["labels"], f_len, batch["label_len"])
            if not interctc:
                return main.mean()
            inter = sum(
                ctc_loss(
                    jnp.log(p.astype(jnp.float32)),
                    batch["labels"], f_len, batch["label_len"],
                )
                for p in interctc
            ) / len(interctc)
            return ((1 - lam) * main + lam * inter).mean()

        return model, loss_fn

    if mtype == "LM":
        model = LanguageModel(
            lm_params=with_policy(config.lm_params), vocab_size=config.vocab_size
        )

        def loss_fn(outputs, batch):
            return ce_loss(outputs, batch["targets"])

        return model, loss_fn

    raise ValueError(f"unknown model type {mtype}")


def apply_model(model: nn.Module, variables, batch, train: bool, rngs=None):
    """Dispatch a forward pass with the right signature per model type."""
    kwargs = dict(rngs=rngs) if rngs else {}
    if train:
        kwargs["mutable"] = ["batch_stats"]
    if isinstance(model, Transducer):
        out = model.apply(
            variables, batch["audio"], batch["labels"],
            batch["audio_len"], batch["label_len"], train, **kwargs
        )
    elif isinstance(model, ModelCTC):
        out = model.apply(
            variables, batch["audio"], batch["audio_len"], train, **kwargs
        )
    else:  # LanguageModel
        out = model.apply(
            variables, batch["tokens"], batch["token_len"], train, **kwargs
        )
    if train:
        return out  # (outputs, mutated_vars)
    return out, None
