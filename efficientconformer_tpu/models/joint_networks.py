"""RNN-T joint network (reference models/joint_networks.py).

Lattice path: f (B, T, De) x g (B, U+1, Dd) -> (B, T, U+1, V) by broadcasting —
no repeat() materialisation before the sum; XLA fuses the broadcast into the
output projection. Step path: f (B, De) x g (B, Dd) -> (B, V) for decode loops.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from efficientconformer_tpu.models.layers import Dense, swish


class JointNetwork(nn.Module):
    vocab_size: int
    params: dict          # joint_params: {joint_mode, dim_model, act}
    vn_std: Optional[float] = None

    def setup(self):
        p = self.params
        assert p["act"] in ("tanh", "relu", "swish", None)
        assert p["joint_mode"] in ("concat", "sum")
        self.mode = p["joint_mode"]
        if p["dim_model"] is not None:
            self.linear_encoder = Dense(p["dim_model"], name="linear_encoder",
                                        vn_std=self.vn_std)
            self.linear_decoder = Dense(p["dim_model"], name="linear_decoder",
                                        vn_std=self.vn_std)
        else:
            self.linear_encoder = None
            self.linear_decoder = None
        self.linear_joint = Dense(self.vocab_size, name="linear_joint",
                                  vn_std=self.vn_std)
        self.act_name = p["act"]

    def _act(self, x):
        if self.act_name == "tanh":
            return jnp.tanh(x)
        if self.act_name == "relu":
            return jnp.maximum(x, 0)
        if self.act_name == "swish":
            return swish(x)
        return x

    def __call__(self, f, g):
        """Lattice mode: f (B, T, De), g (B, U+1, Dd) -> (B, T, U+1, V)."""
        # Under mixed_precision (reference AMP, model.py:179,239) the whole
        # lattice — including the memory-dominant (B, T, U+1, V) output —
        # computes in bf16; the RNN-T loss upcasts per-element (fused by XLA),
        # so HBM holds the lattice once, at half width.
        dt = self.params.get("compute_dtype")
        if dt:
            f = f.astype(jnp.dtype(dt))
            g = g.astype(jnp.dtype(dt))
        if self.linear_encoder is not None:
            f = self.linear_encoder(f)
            g = self.linear_decoder(g)
        f = f[:, :, None, :]
        g = g[:, None, :, :]
        if self.mode == "concat":
            t, u = f.shape[1], g.shape[2]
            joint = jnp.concatenate(
                [
                    jnp.broadcast_to(f, (f.shape[0], t, u, f.shape[-1])),
                    jnp.broadcast_to(g, (g.shape[0], t, u, g.shape[-1])),
                ],
                axis=-1,
            )
        else:
            joint = f + g
        return self.linear_joint(self._act(joint))

    def step(self, f, g):
        """Decode mode: f (B, De), g (B, Dd) -> (B, V)."""
        if self.linear_encoder is not None:
            f = self.linear_encoder(f)
            g = self.linear_decoder(g)
        joint = jnp.concatenate([f, g], axis=-1) if self.mode == "concat" else f + g
        return self.linear_joint(self._act(joint))

    def project_encoder(self, f):
        """Pre-project encoder frames for the row path: f (B, T, De) ->
        (B, T, Dj). Hoisted out of decode loops so ``row`` re-reads the
        projection instead of recomputing it per emission."""
        return self.linear_encoder(f) if self.linear_encoder is not None else f

    def row(self, pf, g):
        """Row mode for label-looping greedy decode: one decoder state against
        ALL encoder frames at once. pf (B, T, Dj) pre-projected frames
        (``project_encoder``), g (B, Dd) -> (B, T, V). Same ops as calling
        ``step`` per frame (same projections, same order); bit-identical on
        CPU (asserted in tests/test_models.py), but backend-specific matmul
        tilings may differ in low bits for batched (B, T, De) vs per-frame
        (B, De) contractions, which could flip exact argmax ties on TPU."""
        if self.linear_encoder is not None:
            g = self.linear_decoder(g)
        if self.mode == "concat":
            t = pf.shape[1]
            g_b = jnp.broadcast_to(g[:, None, :], (g.shape[0], t, g.shape[-1]))
            joint = jnp.concatenate([pf, g_b], axis=-1)
        else:
            joint = pf + g[:, None, :]
        return self.linear_joint(self._act(joint))
