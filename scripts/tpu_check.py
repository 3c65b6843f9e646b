#!/usr/bin/env python
"""On-device correctness check: fused/factorized attention paths vs the
reference jnp paths, run on whatever backend is active (intended for TPU,
where the CPU test suite's interpret-mode coverage doesn't reach).

Run after kernel changes: python scripts/tpu_check.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from efficientconformer_tpu.models.attentions import MultiHeadSelfAttention
from efficientconformer_tpu.ops.masks import padding_mask, streaming_mask


def check(name, a, b, atol):
    d = float(jnp.abs(a - b).max())
    status = "OK " if d <= atol else "FAIL"
    print(f"{status} {name}: max diff {d:.2e}")
    return d <= atol


def main():
    print("backend:", jax.default_backend())
    ok = True
    rng = np.random.default_rng(0)
    for g, d, h, t in [(1, 120, 4, 99), (3, 120, 4, 99), (1, 240, 4, 250),
                       (3, 360, 8, 120)]:
        x = jnp.asarray(rng.standard_normal((4, t, d)).astype(np.float32))
        x_len = jnp.asarray([t, t - 7, t, t // 2])
        key_mask = padding_mask(t, x_len)
        full_mask = streaming_mask(t, x_len, t, t)
        mod_f = MultiHeadSelfAttention(dim_model=d, num_heads=h,
                                       relative_pos_enc=True, group_size=g,
                                       fused=True)
        mod_n = MultiHeadSelfAttention(dim_model=d, num_heads=h,
                                       relative_pos_enc=True, group_size=g,
                                       fused=False)
        params = mod_f.init(jax.random.PRNGKey(0), x)
        # factorized+fused (key mask) vs skew+jnp (full mask): same math
        of, _ = jax.jit(lambda p, xx, m: mod_f.apply(p, xx, m))(params, x, key_mask)
        on, _ = jax.jit(lambda p, xx, m: mod_n.apply(p, xx, m))(params, x, full_mask)
        ok &= check(f"G={g} D={d} H={h} T={t} fused/fact vs jnp/skew", of, on, 5e-3)

    # fused rel-pos kernel (ops/pallas_rel_attention.py) BACKWARD on device:
    # gradients through the kernel vs the XLA augmented-feature factorization
    for g, d, h, t in [(1, 120, 4, 99), (3, 120, 4, 99), (3, 360, 8, 120)]:
        x = jnp.asarray(rng.standard_normal((2, t, d)).astype(np.float32)) * .3
        x_len = jnp.asarray([t, t - 9])
        key_mask = padding_mask(t, x_len)
        mod = MultiHeadSelfAttention(dim_model=d, num_heads=h,
                                     relative_pos_enc=True, group_size=g)
        params = mod.init(jax.random.PRNGKey(1), x)

        def loss(p, xx):
            o, _ = mod.apply(p, xx, key_mask)
            return jnp.sum(jnp.sin(o))

        grads = {}
        for flag in ("1", "0"):
            os.environ["ECF_FUSED_RELPOS"] = flag
            grads[flag] = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, x)
            grads[flag] = jax.tree.map(np.asarray, grads[flag])
        os.environ.pop("ECF_FUSED_RELPOS", None)
        flat1 = jax.tree_util.tree_leaves_with_path(grads["1"])
        flat0 = {jax.tree_util.keystr(k): v
                 for k, v in jax.tree_util.tree_leaves_with_path(grads["0"])}
        for key, g1 in flat1:
            name = jax.tree_util.keystr(key)
            scale = max(1.0, float(np.abs(flat0[name]).max()))
            ok &= check(
                f"G={g} D={d} grad {name} fused-rel vs XLA-fact",
                jnp.asarray(g1 / scale), jnp.asarray(flat0[name] / scale),
                5e-3,
            )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
