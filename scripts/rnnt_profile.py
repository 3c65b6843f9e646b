#!/usr/bin/env python
"""Profile the RNN-T loss backends on the active backend (intended TPU):
Pallas wavefront kernels vs the XLA lax.scan formulation, forward and grad,
at Medium/Large-config shapes. Decides 'keep or demote' (NOTES_ROUND1.md #7).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from efficientconformer_tpu.ops import rnnt_loss as R


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x), out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x), out)
    return (time.time() - t0) / iters


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    for name, (b, t, u, v) in [
        ("Medium 10s", (16, 126, 90, 1000)),
        ("Large 16s", (16, 201, 140, 1000)),
        ("big-batch", (64, 126, 90, 1000)),
    ]:
        logits = jnp.asarray(
            rng.standard_normal((b, t, u + 1, v)).astype(np.float32)
        )
        labels = jnp.asarray(rng.integers(1, v, (b, u)).astype(np.int32))
        f_len = jnp.full((b,), t, jnp.int32)
        y_len = jnp.full((b,), u, jnp.int32)

        def gathered(logits):
            lp = jax.nn.log_softmax(logits, axis=-1)
            blank_lp = lp[..., 0]
            emit_lp = jnp.take_along_axis(
                lp,
                jnp.broadcast_to(
                    jnp.pad(labels, ((0, 0), (0, 1)))[:, None, :, None],
                    (b, t, u + 1, 1),
                ),
                axis=-1,
            )[..., 0]
            return blank_lp, emit_lp

        blank_lp, emit_lp = jax.jit(gathered)(logits)

        from efficientconformer_tpu.ops.pallas_rnnt import (
            rnnt_loss_from_gathered_pallas,
        )

        scan_fwd = jax.jit(lambda a, e: R.rnnt_loss_from_gathered(a, e, f_len, y_len))
        pal_fwd = jax.jit(
            lambda a, e: rnnt_loss_from_gathered_pallas(a, e, f_len, y_len)
        )
        scan_grad = jax.jit(jax.grad(
            lambda a, e: R.rnnt_loss_from_gathered(a, e, f_len, y_len).mean(),
            argnums=(0, 1)))
        pal_grad = jax.jit(jax.grad(
            lambda a, e: rnnt_loss_from_gathered_pallas(a, e, f_len, y_len).mean(),
            argnums=(0, 1)))

        ts = timeit(scan_fwd, blank_lp, emit_lp)
        tp = timeit(pal_fwd, blank_lp, emit_lp)
        gs = timeit(scan_grad, blank_lp, emit_lp)
        gp = timeit(pal_grad, blank_lp, emit_lp)
        print(f"{name} (B={b} T={t} U={u}):")
        print(f"  fwd : scan {ts*1e3:7.2f} ms | pallas {tp*1e3:7.2f} ms "
              f"({ts/tp:.2f}x)")
        print(f"  grad: scan {gs*1e3:7.2f} ms | pallas {gp*1e3:7.2f} ms "
              f"({gs/gp:.2f}x)")


if __name__ == "__main__":
    main()
