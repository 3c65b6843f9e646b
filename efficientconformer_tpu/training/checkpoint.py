"""Checkpointing (reference model.py:346-384 torch.save dict -> pytree files).

Two interchangeable backends behind one path-based API (auto-detected on
load: a directory is orbax, a file is msgpack):
  * msgpack (flax.serialization) single file, written ATOMICALLY
    (tmp + os.replace) so a crash mid-save never corrupts the previous
    checkpoint — default on a single host, trivially portable;
  * orbax directory checkpoints — default under multi-host
    (jax.process_count() > 1: coordinated, per-shard writes) or when
    ECF_CKPT_FORMAT=orbax.

Supports optimizer-less saves (SWA checkpoints, reference model.py:559-564)
and encoder-only restore for encoder pretraining -> transducer init
(reference model_ctc.py:77-88 load_encoder). Tokenizers are referenced by
path in the config, never pickled.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
from flax import serialization


def _format(fmt: Optional[str]) -> str:
    if fmt:
        return fmt
    env = os.environ.get("ECF_CKPT_FORMAT")
    if env:
        return env
    return "orbax" if jax.process_count() > 1 else "msgpack"


def _payload(state, save_optimizer: bool):
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state if save_optimizer else None,
        "step": state.step,
    }


_async_ckptr = None


def _get_async_ckptr():
    global _async_ckptr
    if _async_ckptr is None:
        import orbax.checkpoint as ocp

        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def wait_for_saves() -> None:
    """Block until every in-flight async checkpoint save has committed.
    Call before reading a just-saved path, and at end of training."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def save(path: str, state, save_optimizer: bool = True,
         fmt: Optional[str] = None, blocking: bool = True) -> None:
    """``blocking=False`` (or ECF_ASYNC_CKPT=1) with the orbax backend
    snapshots device arrays and writes in a background thread — the train
    loop keeps stepping during checkpoint IO (large-model epochs are not
    paused by multi-GB writes). ``wait_for_saves()`` joins the writers."""
    payload = _payload(state, save_optimizer)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    async_save = (not blocking) or os.environ.get("ECF_ASYNC_CKPT") == "1"
    # async is an orbax capability; an async request promotes the format
    # (msgpack has no non-blocking path)
    if _format(fmt) == "orbax" or async_save:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        if async_save:
            # keep a committed checkpoint at `path` at all times: orbax
            # writes to a tmp dir and renames on commit
            _get_async_ckptr().save(path, payload, force=True)
            return
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, jax.tree.map(lambda x: x, payload), force=True)
        return
    blob = serialization.to_bytes(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    if os.path.isdir(path):  # replacing an old orbax directory checkpoint
        import shutil

        shutil.rmtree(path)
    os.replace(tmp, path)  # atomic: partial writes never clobber `path`


def _orbax_restore(path: str) -> dict:
    """Restore an orbax directory checkpoint, tolerating TOPOLOGY CHANGES:
    a checkpoint saved under N processes restores under any other process/
    device layout. Plain restore reuses the saved shardings (fast path,
    same topology); when orbax rejects them (different mesh), every leaf is
    re-read as a host numpy array via the checkpoint's own metadata and the
    trainer re-shards on the next step."""
    import numpy as _np
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        try:
            return ckptr.restore(path)
        except ValueError:
            meta = ckptr.metadata(path)
            tree = getattr(getattr(meta, "item_metadata", meta), "tree", meta)
            restore_args = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=_np.ndarray), tree)
            return ckptr.restore(path, restore_args=restore_args)


def _restore(path: str, template: dict) -> dict:
    wait_for_saves()  # a just-async-saved path must be committed first
    if os.path.isdir(path):  # orbax directory checkpoint
        return _orbax_restore(path)
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def load(path: str, template_state):
    template = {
        "params": template_state.params,
        "batch_stats": template_state.batch_stats,
        "opt_state": template_state.opt_state,
        "step": template_state.step,
    }
    data = _restore(path, template)
    opt_state = data["opt_state"]
    if opt_state is None:
        opt_state = template_state.opt_state
    else:
        # orbax restores as plain nested containers with None at empty nodes
        # (optax EmptyState etc.); overlay the restored leaves onto the
        # template's state dict, then rebuild the optax pytree structure
        tpl_sd = serialization.to_state_dict(template_state.opt_state)
        res_sd = serialization.to_state_dict(opt_state)

        def overlay(tpl, res):
            if res is None:
                return tpl
            if isinstance(tpl, dict):
                if not isinstance(res, dict):
                    return tpl
                return {k: overlay(v, res.get(k)) for k, v in tpl.items()}
            return res

        opt_state = serialization.from_state_dict(
            template_state.opt_state, overlay(tpl_sd, res_sd)
        )
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
    if os.path.isdir(path):
        data = _orbax_restore(path)
    else:
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
