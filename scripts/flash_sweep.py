#!/usr/bin/env python
"""Flash-attention kernel tuning sweep on the active backend (intended TPU).

Times the key-tiled flash kernel vs XLA's jnp attention at beyond-VMEM shapes
for a grid of (TQ, TK) tiles and both dtypes. Timing fetches a scalar to host
(the tunnel's block_until_ready does not synchronise)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from efficientconformer_tpu.ops import pallas_attention as PA


def timeit(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out))  # warm + sync
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.time() - t0) / iters


def main():
    print("backend:", jax.default_backend())
    import sys as _s; b, h, n, d = 8, 8, int(_s.argv[1]) if len(_s.argv)>1 else 2048, 64
    scale = 1.0 / np.sqrt(d)
    rng = np.random.default_rng(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        q = jnp.asarray(rng.standard_normal((b, h, n, d)), dtype)
        k = jnp.asarray(rng.standard_normal((b, h, n, d)), dtype)
        v = jnp.asarray(rng.standard_normal((b, h, n, d)), dtype)
        bias = jnp.zeros((b, 1, 1, n), jnp.float32)

        ref = jax.jit(lambda *a: PA.reference_bias_attention(*a, scale))
        t_ref = timeit(ref, q, k, v, bias)
        print(f"dtype={dtype.__name__}: jnp reference {t_ref*1e3:.2f} ms")

        for tq in (256,):
            for tk in (1024, 2048):
                PA.FLASH_TQ, PA.FLASH_TK = tq, tk
                try:
                    fl = jax.jit(lambda *a: PA._flash_forward(*a, scale)[0])
                    t_fl = timeit(fl, q, k, v, bias)
                    ok = float(jnp.max(jnp.abs(
                        fl(q, k, v, bias).astype(jnp.float32)
                        - ref(q, k, v, bias).astype(jnp.float32)))) < 2e-2
                    print(f"  flash TQ={tq} TK={tk}: {t_fl*1e3:.2f} ms "
                          f"({t_ref/t_fl:.2f}x vs jnp) {'OK' if ok else 'MISMATCH'}")
                except Exception as e:  # noqa: BLE001
                    print(f"  flash TQ={tq} TK={tk}: ERROR {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
