"""Optimizer construction from reference-schema training_params.

torch.optim.Adam semantics (L2 weight decay folded into the gradient before the
moment updates — not AdamW), eps inside the sqrt denominator ordering matching
torch. SGD with momentum for the reference's SGD branch (model.py:95-102).
"""

from __future__ import annotations

import optax

from efficientconformer_tpu.training import schedules


def from_training_params(p: dict) -> optax.GradientTransformation:
    schedule = schedules.from_training_params(p)
    wd = p.get("weight_decay", 0.0)
    parts = []
    if wd:
        parts.append(optax.add_decayed_weights(wd))
    if p["optimizer"] == "Adam":
        parts.append(
            optax.scale_by_adam(
                b1=p["beta1"], b2=p["beta2"], eps=p["eps"], eps_root=0.0
            )
        )
    elif p["optimizer"] == "SGD":
        parts.append(optax.trace(decay=p.get("momentum", 0.0)))
    else:
        raise ValueError(f"unknown optimizer {p['optimizer']}")
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)
