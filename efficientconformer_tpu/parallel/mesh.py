"""Mesh + sharding utilities.

The reference's distribution machinery (DDP spawn, NCCL process groups,
SyncBatchNorm, DistributedSampler — reference main.py:35,217-220, §2.4 of
SURVEY.md) collapses on TPU into: one jit program over a
``jax.sharding.Mesh`` with the batch axis sharded over the ``data`` axis.
XLA inserts the gradient psum over ICI; batch statistics computed with jnp
reductions are automatically global (SyncBN semantics); per-replica PRNG keys
are identical by construction (VN-noise broadcast semantics).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and the
same code spans hosts, with the data axis laid out over DCN-connected slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None, axis_names: tuple = ("data",)
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices).reshape(len(devices)), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, batch_axis: int = 0):
    """Device-put a host batch with ``batch_axis`` sharded over the data axis.

    Train batches are stacked (accum, batch, ...) so their batch axis is 1.
    Arrays whose batch dim is not divisible by the mesh size (tiny eval tails,
    toy tests) are replicated instead.
    """
    n = mesh.devices.size

    def put(x):
        if x.ndim > batch_axis and x.shape[batch_axis] % n == 0:
            spec = [None] * x.ndim
            spec[batch_axis] = "data"
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, batch)
