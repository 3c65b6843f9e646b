#!/usr/bin/env python
"""Flash Pallas backward vs the XLA einsum backward on the real chip:
numerics (vs reference autodiff) and wall-clock for a training-shaped
attention gradient. Usage: python scripts/flash_bwd_check.py [--n 2048]."""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--h", type=int, default=8)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    import efficientconformer_tpu.ops.pallas_attention as pa

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    b, h, n, d = args.b, args.h, args.n, args.d
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), dt)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), dt)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), dt)
    bias = jnp.where(
        jnp.arange(n)[None, None, None, :] < n - 100, 0.0, -1e9
    ).astype(jnp.float32) * jnp.ones((b, 1, 1, n))
    scale = 1.0 / np.sqrt(d)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a, scale).astype(jnp.float32) ** 2)

    grad_fused = jax.jit(jax.grad(loss(pa.fused_bias_attention),
                                  argnums=(0, 1, 2)))
    grad_ref = jax.jit(jax.grad(loss(pa.reference_bias_attention),
                                argnums=(0, 1, 2)))

    def timeit(fn, iters=10):
        out = fn(q, k, v, bias)
        jax.tree.map(np.asarray, out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(q, k, v, bias)
        jax.tree.map(np.asarray, out)
        return (time.perf_counter() - t0) / iters, out

    pa.PALLAS_BWD = True
    t_pl, g_pl = timeit(grad_fused)
    print(f"pallas bwd: {t_pl*1e3:.2f} ms")
    pa.PALLAS_BWD = False
    # new jit cache entry is needed: PALLAS_BWD is read at trace time
    grad_xla = jax.jit(jax.grad(loss(pa.fused_bias_attention),
                                argnums=(0, 1, 2)))
    t_xla, _ = timeit(grad_xla)
    print(f"xla recompute bwd: {t_xla*1e3:.2f} ms -> pallas {t_xla/t_pl:.2f}x")
    t_ref, g_ref = timeit(grad_ref)
    print(f"reference autodiff: {t_ref*1e3:.2f} ms -> pallas {t_ref/t_pl:.2f}x")

    tol = 5e-3 if dt == jnp.bfloat16 else 2e-4
    for name, a, b_ in zip("qkv", g_pl, g_ref):
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b_.astype(jnp.float32))))
        rel = err / float(jnp.max(jnp.abs(b_.astype(jnp.float32))) + 1e-9)
        print(f"d{name}: max abs err {err:.3e} (rel {rel:.3e}) "
              f"{'OK' if rel < tol else 'MISMATCH'}")


if __name__ == "__main__":
    main()
