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
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
