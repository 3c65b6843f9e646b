"""Torch-reference weight conversion.

Maps a PyTorch state dict from the reference implementation
(burchim/EfficientConformer) onto this framework's flax parameter trees, so
that

  * forward/loss equivalence vs the reference model can be asserted in tests
    (the only honest WER-parity proxy available without LibriSpeech data), and
  * published reference checkpoints (``checkpoints_*.ckpt`` with a
    ``model_state_dict``) can be imported directly
    (``scripts/import_torch_checkpoint.py``).

Reference module naming (cites into /root/reference):
  encoder            models/encoders.py:44-141   (subsampling_module.layers.N,
                                                  linear, blocks.N.*)
  conformer block    models/blocks.py:32-137     (feed_forward_module{1,2},
                                                  multi_head_self_attention_module,
                                                  convolution_module, conv_res, norm)
  attention          models/attentions.py:52-55,477-478 (query/key/value/output/
                                                  pos _layer, u, v)
  prediction net     models/decoders.py:41-70    (embedding, rnn)
  joint network      models/joint_networks.py:33-76 (linear_{encoder,decoder,joint})
  CTC head           models/model_ctc.py:50      (fc)
  LM                 models/lm.py:33-85          (decoder, fc)

Layout transforms torch -> flax:
  Linear  (out, in)            -> kernel (in, out)
  Conv1d  (out, in/g, k)       -> kernel (k, in/g, out)
  Conv2d  (out, in, kh, kw)    -> kernel (kh, kw, in, out)
  LSTM    weight_*_l{k} (4H,·) -> w_*_l{k} (·, 4H)   [same (i,f,g,o) gate order]
  BatchNorm weight/bias        -> params scale/bias; running_* -> batch_stats
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _t(x):  # torch Linear weight -> flax Dense kernel
    return np.ascontiguousarray(np.transpose(x))


def _conv1d(x):  # (out, in/g, k) -> (k, in/g, out)
    return np.ascontiguousarray(np.transpose(x, (2, 1, 0)))


def _conv2d(x):
    """Subsampling Conv2d. Reference layout is (B, C, mel, time) so the torch
    kernel is (out, in, k_mel, k_time); ours is (B, time, mel, C) NHWC, i.e.
    (k_time, k_mel, in, out)."""
    return np.ascontiguousarray(np.transpose(x, (3, 2, 1, 0)))


def _pw(x):  # pointwise Conv1d (out, in, 1) -> Dense kernel (in, out)
    return np.ascontiguousarray(np.transpose(x[:, :, 0]))


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = np.asarray(value)


def _to_numpy(sd) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):  # reference DDP prefix (model.py:372-377)
            k = k[len("module."):]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------

_FFN_SLOT = {"1": "fc1", "4": "fc2"}
_CONV_SLOT = {"2": "pw1", "4": "dw", "7": "pw2"}


def _permute_linear_in(w: np.ndarray, sd: Dict[str, np.ndarray], prefix: str):
    """The reference flattens the 2D-subsampled features channel-major
    ((B, C, mel', T') -> (B, C*mel', T'), encoders.py reshape at
    modules.py:243-247) while ours is mel-major ((B, T', mel', C) ->
    (B, T', mel'*C)). Permute the encoder input projection's input features
    accordingly. No-op for Conv1d subsampling (features == channels)."""
    conv_keys = sorted(
        k for k in sd
        if re.match(re.escape(prefix) + r"subsampling_module\.layers\.\d+\.0\.weight$", k)
    )
    if not conv_keys:
        return w
    last = sd[conv_keys[-1]]
    if last.ndim != 4:  # Conv1d subsampling: no spatial flatten
        return w
    c = last.shape[0]
    out_f, in_f = w.shape
    if in_f % c:
        return w
    mel = in_f // c
    return np.ascontiguousarray(
        w.reshape(out_f, c, mel).transpose(0, 2, 1).reshape(out_f, in_f)
    )


def convert_encoder(sd: Dict[str, np.ndarray], prefix: str = "encoder."):
    """Torch encoder state dict -> (params, batch_stats) under flax names
    (ConformerEncoder in models/encoders.py; InterCTC taps included)."""
    params: dict = {}
    stats: dict = {}
    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        if k.endswith("num_batches_tracked"):
            continue

        m = re.match(r"subsampling_module\.layers\.(\d+)\.(\d+)\.(\w+)$", k)
        if m:
            i, slot, leaf = m.group(1), m.group(2), m.group(3)
            if slot == "0":  # conv
                if leaf == "weight":
                    w = _conv2d(val) if val.ndim == 4 else _conv1d(val)
                    _set(params, ("subsampling", f"conv_{i}", "kernel"), w)
                else:
                    _set(params, ("subsampling", f"conv_{i}", "bias"), val)
            else:  # norm (batch or layer)
                is_bn = (prefix + f"subsampling_module.layers.{i}.1.running_mean") in sd
                name = f"bn_{i}" if is_bn else f"ln_{i}"
                if leaf == "weight":
                    _set(params, ("subsampling", name, "scale"), val)
                elif leaf == "bias":
                    _set(params, ("subsampling", name, "bias"), val)
                elif leaf == "running_mean":
                    _set(stats, ("subsampling", name, "mean"), val)
                elif leaf == "running_var":
                    _set(stats, ("subsampling", name, "var"), val)
            continue

        m = re.match(r"linear\.(weight|bias)$", k)
        if m:
            leaf = m.group(1)
            if leaf == "weight":
                val = _permute_linear_in(val, sd, prefix)
            _set(params, ("linear", "kernel" if leaf == "weight" else "bias"),
                 _t(val) if leaf == "weight" else val)
            continue

        # InterCTC taps (reference encoders.py:150-161:
        # linear_expand_{block} -> interctc_fc_{block},
        # linear_proj_{block}   -> interctc_proj_{block})
        m = re.match(r"linear_(expand|proj)_(\d+)\.(weight|bias)$", k)
        if m:
            which, block_id, leaf = m.group(1), m.group(2), m.group(3)
            name = (
                f"interctc_fc_{block_id}" if which == "expand"
                else f"interctc_proj_{block_id}"
            )
            _set(params, (name, "kernel" if leaf == "weight" else "bias"),
                 _t(val) if leaf == "weight" else val)
            continue

        m = re.match(r"blocks\.(\d+)\.(.*)$", k)
        if m:
            i, rest = m.group(1), m.group(2)
            blk = f"block_{i}"
            _convert_block_entry(params, stats, blk, rest, val, sd,
                                 prefix + f"blocks.{i}.")
            continue
    return params, stats


def _convert_block_entry(params, stats, blk, rest, val, sd, tprefix):
    """One ConformerBlock state-dict entry (reference models/blocks.py:32-137)."""
    m = re.match(r"feed_forward_module([12])\.layers\.(\d+)\.(weight|bias)$", rest)
    if m:
        which, slot, leaf = m.group(1), m.group(2), m.group(3)
        if slot == "0":
            _set(params, (blk, f"ffn{which}", "ln",
                          "scale" if leaf == "weight" else "bias"), val)
        else:
            name = _FFN_SLOT[slot]
            _set(params, (blk, f"ffn{which}", name,
                          "kernel" if leaf == "weight" else "bias"),
                 _t(val) if leaf == "weight" else val)
        return

    m = re.match(r"multi_head_self_attention_module\.norm\.(weight|bias)$", rest)
    if m:
        leaf = m.group(1)
        _set(params, (blk, "mhsa_module", "ln",
                      "scale" if leaf == "weight" else "bias"), val)
        return

    m = re.match(
        r"multi_head_self_attention_module\.mhsa\.(query|key|value|output|pos)_layer\.(weight|bias)$",
        rest,
    )
    if m:
        which, leaf = m.group(1), m.group(2)
        _set(params, (blk, "mhsa_module", "mhsa", which,
                      "kernel" if leaf == "weight" else "bias"),
             _t(val) if leaf == "weight" else val)
        return

    m = re.match(r"multi_head_self_attention_module\.mhsa\.(u|v)$", rest)
    if m:
        _set(params, (blk, "mhsa_module", "mhsa", m.group(1)), val)
        return

    m = re.match(r"convolution_module\.layers\.(\d+)\.(\w+)$", rest)
    if m:
        slot, leaf = m.group(1), m.group(2)
        if slot == "0":
            _set(params, (blk, "conv_module", "ln",
                          "scale" if leaf == "weight" else "bias"), val)
        elif slot == "5":  # BatchNorm1d
            if leaf == "weight":
                _set(params, (blk, "conv_module", "bn", "scale"), val)
            elif leaf == "bias":
                _set(params, (blk, "conv_module", "bn", "bias"), val)
            elif leaf == "running_mean":
                _set(stats, (blk, "conv_module", "bn", "mean"), val)
            elif leaf == "running_var":
                _set(stats, (blk, "conv_module", "bn", "var"), val)
        else:
            name = _CONV_SLOT[slot]
            if leaf == "weight":
                w = _conv1d(val) if name == "dw" else _pw(val)
                _set(params, (blk, "conv_module", name, "kernel"), w)
            else:
                _set(params, (blk, "conv_module", name, "bias"), val)
        return

    m = re.match(r"conv_res\.1\.(weight|bias)$", rest)
    if m:
        leaf = m.group(1)
        _set(params, (blk, "conv_res", "kernel" if leaf == "weight" else "bias"),
             _conv1d(val) if leaf == "weight" else val)
        return

    m = re.match(r"norm\.(weight|bias)$", rest)
    if m:
        leaf = m.group(1)
        _set(params, (blk, "norm", "scale" if leaf == "weight" else "bias"), val)
        return

    raise KeyError(f"unmapped encoder key: {blk}.{rest}")


# --------------------------------------------------------------------------
# Decoders / joint / heads
# --------------------------------------------------------------------------

def convert_rnn_decoder(sd: Dict[str, np.ndarray], prefix: str = "decoder."):
    """RnnDecoder (reference models/decoders.py:41-70): embedding + LSTM."""
    params: dict = {}
    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        if k == "embedding.weight":
            _set(params, ("embedding", "embedding"), val)
            continue
        m = re.match(r"rnn\.(weight|bias)_(ih|hh)_l(\d+)$", k)
        if m:
            kind, which, layer = m.group(1), m.group(2), m.group(3)
            name = f"{'w' if kind == 'weight' else 'b'}_{which}_l{layer}"
            _set(params, ("rnn", name), _t(val) if kind == "weight" else val)
    return params


def convert_joint(sd: Dict[str, np.ndarray], prefix: str = "joint_network."):
    params: dict = {}
    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        m = re.match(r"(linear_encoder|linear_decoder|linear_joint)\.(weight|bias)$", k)
        if m:
            which, leaf = m.group(1), m.group(2)
            _set(params, (which, "kernel" if leaf == "weight" else "bias"),
                 _t(val) if leaf == "weight" else val)
    return params


def _convert_head(sd, name="fc."):
    params: dict = {}
    if name + "weight" in sd:
        params["kernel"] = _t(sd[name + "weight"])
        params["bias"] = sd[name + "bias"]
    return params


# --------------------------------------------------------------------------
# Model-level entry points
# --------------------------------------------------------------------------

def convert_ctc(state_dict, interctc_blocks=()):
    """Reference ModelCTC/InterCTC state dict -> (params, batch_stats)."""
    sd = _to_numpy(state_dict)
    enc_params, enc_stats = convert_encoder(sd)
    params = {"encoder": enc_params, "fc": _convert_head(sd)}
    return params, {"encoder": enc_stats}


def convert_transducer(state_dict):
    """Reference Transducer state dict -> (params, batch_stats)."""
    sd = _to_numpy(state_dict)
    enc_params, enc_stats = convert_encoder(sd)
    params = {
        "encoder": enc_params,
        "decoder": convert_rnn_decoder(sd),
        "joint_network": convert_joint(sd),
    }
    return params, {"encoder": enc_stats}


def convert_lm(state_dict):
    """Reference RNN LanguageModel state dict -> (params, batch_stats)."""
    sd = _to_numpy(state_dict)
    params = {"decoder": convert_rnn_decoder(sd), "fc": _convert_head(sd)}
    return params, {}


def convert_model(state_dict, model_type: str, interctc_blocks=()):
    if model_type in ("CTC", "InterCTC"):
        return convert_ctc(state_dict, interctc_blocks)
    if model_type == "Transducer":
        return convert_transducer(state_dict)
    if model_type == "LM":
        return convert_lm(state_dict)
    raise ValueError(f"unknown model type {model_type}")


def assert_trees_match(template, converted, path=""):
    """Structural check: every leaf in the flax template has a converted value
    of the same shape (catches silent partial conversions)."""
    t_is_dict = isinstance(template, dict) or hasattr(template, "items")
    if t_is_dict:
        tkeys = set(template.keys())
        ckeys = set(converted.keys()) if isinstance(converted, dict) else set()
        missing = tkeys - ckeys
        extra = ckeys - tkeys
        if missing or extra:
            raise AssertionError(
                f"tree mismatch at {path or '/'}: missing={sorted(missing)} "
                f"extra={sorted(extra)}"
            )
        for k in tkeys:
            assert_trees_match(template[k], converted[k], f"{path}/{k}")
    else:
        ts = tuple(np.shape(template))
        cs = tuple(np.shape(converted))
        if ts != cs:
            raise AssertionError(f"shape mismatch at {path}: {ts} vs {cs}")
