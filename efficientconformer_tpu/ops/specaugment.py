"""SpecAugment as a pure function with explicit PRNG keys.

Reference: models/modules.py:108-151 (torchaudio Frequency/TimeMasking).
Semantics preserved:
  * mF frequency masks, one draw shared by the whole batch (iid_masks=False);
    width ~ U[0, F), start ~ U[0, n_mels - width).
  * mT adaptive time masks per sample; width ~ U[0, pS * x_len_b),
    start ~ U[0, x_len_b - width) — masking only within the valid region.
  * masked cells set to 0.

Implemented as broadcasted interval comparisons — fully batched, no Python
loops over samples, fuses into the surrounding jit program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spec_augment(
    key: jax.Array,
    x: jnp.ndarray,          # (B, T, M) log-mel features
    x_len: jnp.ndarray,      # (B,)
    *,
    mF: int,
    F: int,
    mT: int,
    pS: float,
) -> jnp.ndarray:
    b, t, m = x.shape
    kf, kt = jax.random.split(key)

    # ---- frequency masks: shared across the batch --------------------------
    kf1, kf2 = jax.random.split(kf)
    widths = jax.random.uniform(kf1, (mF,)) * F                      # U[0, F)
    starts = jax.random.uniform(kf2, (mF,)) * (m - widths)           # U[0, M-w)
    freqs = jnp.arange(m, dtype=jnp.float32)
    # (mF, M): inside any mask interval?
    fmask = (freqs[None, :] >= starts[:, None]) & (
        freqs[None, :] < (starts + widths)[:, None]
    )
    fmask = jnp.any(fmask, axis=0)                                   # (M,)
    x = jnp.where(fmask[None, None, :], 0.0, x)

    # ---- adaptive time masks: per sample -----------------------------------
    kt1, kt2 = jax.random.split(kt)
    tmax = (pS * x_len.astype(jnp.float32))                          # (B,)
    widths = jax.random.uniform(kt1, (b, mT)) * tmax[:, None]
    starts = jax.random.uniform(kt2, (b, mT)) * (
        x_len.astype(jnp.float32)[:, None] - widths
    )
    times = jnp.arange(t, dtype=jnp.float32)
    tmask = (times[None, None, :] >= starts[:, :, None]) & (
        times[None, None, :] < (starts + widths)[:, :, None]
    )
    tmask = jnp.any(tmask, axis=1)                                   # (B, T)
    return jnp.where(tmask[:, :, None], 0.0, x)
