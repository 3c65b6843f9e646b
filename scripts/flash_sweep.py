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

    relpos_sweep()


def relpos_sweep():
    """Fused factorized rel-pos kernel (ops/pallas_rel_attention.py) vs the
    XLA augmented-feature path, fwd and fwd+bwd, at shipped attention shapes
    (CTC Large stage sequence lengths after progressive downsampling). The
    in-VMEM single-block kernel covers every shipped size; beyond-VMEM shapes
    report the fallback. Crossover notes live in BENCH_DETAILS.md."""
    from efficientconformer_tpu.ops import pallas_rel_attention as PRA
    from efficientconformer_tpu.ops import rel_factorize as RF

    print("\n# fused rel-pos kernel vs XLA factorized (bf16, fwd / fwd+bwd)")
    rng = np.random.default_rng(1)
    # (B, H, N, dh, D): CTC Large stages at b16x16s ~ N 400/200/100, D 360;
    # plus a long-N point past the VMEM budget to show the fallback boundary
    for b, h, n, d in [(16, 8, 400, 360), (16, 8, 200, 360),
                       (16, 8, 100, 360), (8, 8, 1600, 360)]:
        dh = d // h
        hdp = -(-(d // 2) // PA.LANE) * PA.LANE
        fits = PRA.fits_vmem(n, n, dh, 2 * hdp)
        qu = jnp.asarray(rng.standard_normal((b, h, n, dh)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, n, dh)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, n, dh)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.bfloat16)
        qv = qu  # stand-in for the v-biased query: same shape/cost
        rowtab = RF.rel_rowtab(n, d, hdp, jnp.bfloat16)
        keytab = RF.rel_keytab_halves(n, d, hdp, jnp.bfloat16)
        bias = jnp.zeros((b, 1, 1, n), jnp.float32)
        scale = 1.0 / np.sqrt(dh)

        delta = jnp.zeros((h, dh), jnp.bfloat16)
        w_h = RF.rel_w_plain(w, h, hdp)

        def fused(qu, k, v, qv):
            return PRA.fused_relpos_attention(
                qu, k, v, delta, w_h, rowtab, keytab, bias, scale)

        def xla(qu, k, v, qv):
            a_feat = RF.rel_query_features(qv, np.asarray(w).astype(np.float32))
            q_aug = jnp.concatenate([qu, a_feat.astype(qu.dtype)], axis=-1)
            c_feat = RF.rel_key_features(n, d, qu.dtype)
            k_aug = jnp.concatenate(
                [k, jnp.broadcast_to(c_feat[None, None], (b, h) + c_feat.shape)],
                axis=-1)
            s = jnp.einsum("bhnd,bhmd->bhnm", q_aug, k_aug) * scale
            p = jax.nn.softmax(s.astype(jnp.float32) + bias, axis=-1)
            return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)

        row = f"  B{b} H{h} N{n} D{d} fits_vmem={fits}:"
        for name, fn in (("fused", fused), ("xla", xla)):
            if name == "fused" and not fits:
                row += "  fused=fallback"
                continue
            fwd = jax.jit(fn)
            loss = jax.jit(jax.grad(
                lambda *a: jnp.sum(fn(*a).astype(jnp.float32)), argnums=(0, 1, 2, 3)))
            t_f = timeit(fwd, qu, k, v, qv)
            g = loss(qu, k, v, qv)
            float(jnp.sum(g[0].astype(jnp.float32)))
            t0 = time.time()
            for _ in range(10):
                g = loss(qu, k, v, qv)
            float(jnp.sum(g[0].astype(jnp.float32)))
            t_b = (time.time() - t0) / 10
            row += f"  {name}={t_f*1e3:.2f}/{t_b*1e3:.2f}ms"
        print(row)


if __name__ == "__main__":
    main()
