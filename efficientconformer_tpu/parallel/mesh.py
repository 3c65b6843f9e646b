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
    devices: Optional[Sequence] = None, axis_names: tuple = ("data",),
    model_parallel: int = 1, seq_parallel: int = 1,
) -> Mesh:
    """Device mesh. Default: 1-D data-parallel over all devices.

    ``model_parallel > 1`` adds a trailing "model" axis for Megatron-style
    tensor parallelism (see ``shard_params``); ``seq_parallel > 1`` adds a
    "seq" axis that shards encoder activations along TIME (see
    ``seq_constraint`` and encoders.py) for long-audio training. Inner axes
    carry the chattiest collectives (per-layer all-reduces for "model",
    conv halos / attention gathers for "seq"), so they should map to
    ICI-adjacent devices — which trailing mesh axes do by construction."""
    devices = list(devices if devices is not None else jax.devices())
    par = model_parallel * seq_parallel
    if par > 1:
        if len(devices) % par:
            raise ValueError(
                f"model_parallel={model_parallel} x seq_parallel="
                f"{seq_parallel} does not divide the "
                f"{len(devices)} visible device(s)"
            )
        shape, names = [len(devices) // par], ["data"]
        if seq_parallel > 1:
            shape.append(seq_parallel)
            names.append("seq")
        if model_parallel > 1:
            shape.append(model_parallel)
            names.append("model")
        return Mesh(np.asarray(devices).reshape(shape), tuple(names))
    return Mesh(np.asarray(devices).reshape(len(devices)), axis_names)


def seq_constraint(x, mesh: Optional[Mesh], time_axis: int = 1):
    """Constrain activation ``x`` to be sharded along TIME over the "seq"
    mesh axis (and batch over "data"). A no-op when the mesh is None or has
    no "seq" axis, so model code can call it unconditionally. GSPMD inserts
    the halo exchanges (convs) and gathers (attention) these shardings imply.
    """
    if mesh is None or "seq" not in mesh.axis_names:
        return x
    if x.shape[time_axis] % mesh.shape["seq"]:
        # with_sharding_constraint requires even divisibility. Rather than
        # pad (which would perturb BatchNorm statistics relative to the
        # unsharded program), indivisible points are left unconstrained —
        # GSPMD still propagates the neighbouring constraints. Loader bucket
        # lengths control frame counts statically; power-of-two frame counts
        # survive the (l-1)//s+1 stride arithmetic, so choosing
        # *_audio_max_length with frames = 4*k*2^stages keeps every
        # constraint point divisible.
        return x
    spec = [None] * x.ndim
    spec[0] = "data" if "data" in mesh.axis_names else None
    spec[time_axis] = "seq"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec))
    )


# Megatron-style tensor-parallel placement for the transformer/conformer
# stacks: the first linear of each pair is column-parallel (output features
# sharded), the second row-parallel (input features sharded) so each
# FFN/attention pair needs ONE all-reduce, inserted automatically by GSPMD
# from these input shardings. Everything else (convs, norms, biases of
# row-parallel layers) is replicated.
_COL_PARALLEL = (
    "fc1", "pw1", "query", "key", "value",
    "linear_joint", "linear_encoder", "linear_decoder", "fc",
)
_ROW_PARALLEL = ("fc2", "pw2", "output")


def param_spec(path_names: tuple, leaf, mesh: Mesh) -> P:
    """PartitionSpec for one parameter leaf under a (data, model) mesh."""
    if "model" not in mesh.axis_names:
        return P()
    n_model = mesh.shape["model"]
    parent = path_names[-2] if len(path_names) >= 2 else ""
    leafname = path_names[-1]
    if leafname == "kernel" and leaf.ndim == 2:
        if parent in _COL_PARALLEL and leaf.shape[1] % n_model == 0:
            return P(None, "model")
        if parent in _ROW_PARALLEL and leaf.shape[0] % n_model == 0:
            return P("model", None)
    if leafname == "bias" and parent in _COL_PARALLEL \
            and leaf.shape[0] % n_model == 0:
        return P("model")
    return P()


def shard_params(mesh: Mesh, params):
    """Place parameters onto the mesh according to ``param_spec``. Under a
    1-D data mesh this replicates everything (a no-op for semantics)."""
    def put(path, x):
        names = tuple(str(getattr(k, "key", k)) for k in path)
        return jax.device_put(x, NamedSharding(mesh, param_spec(names, x, mesh)))

    return jax.tree_util.tree_map_with_path(put, params)


def seq_frame_schedule(encoder_params: dict, t_audio: int) -> list:
    """Frame count at each ``seq_constraint`` point of the encoder for raw
    audio length ``t_audio``: [post-frontend, post-subsampling, after each
    block]. Length formulas mirror the reference exactly (frames = T//hop+1,
    conv subsampling (l-1)//2+1 per layer, VGG l//2, block strides
    (l-1)//s+1)."""
    from efficientconformer_tpu.config import resolve_block_configs

    p = encoder_params
    hop = p["sample_rate"] * p["hop_length_ms"] // 1000
    f = t_audio // hop + 1
    schedule = [f]
    vgg = p["subsampling_module"] == "VGG"
    for _ in range(p["subsampling_layers"]):
        f = f // 2 if vgg else (f - 1) // 2 + 1
    schedule.append(f)
    for cfg in resolve_block_configs(p):
        if cfg.stride > 1:
            f = (f - 1) // cfg.stride + 1
        schedule.append(f)
    return schedule


def sp_audio_lengths(
    encoder_params: dict, seq_parallel: int, t_min: int, t_max: int,
    include_frontend: bool = False,
) -> list:
    """Audio lengths in [t_min, t_max] whose whole frame schedule divides by
    ``seq_parallel`` — i.e. loader bucket lengths for which sequence
    parallelism constrains EVERY point (mesh.seq_constraint skips indivisible
    ones). The frontend point (pre-subsampling mel frames) is excluded by
    default: mel frame counts are T//hop+1 (odd for even T//hop), and the
    frontend is a small fraction of encoder compute."""
    p = encoder_params
    hop = p["sample_rate"] * p["hop_length_ms"] // 1000
    out = []
    start = max(t_min - t_min % hop, hop)
    for t in range(start, t_max + 1, hop):
        sched = seq_frame_schedule(p, t)
        pts = sched if include_frontend else sched[1:]
        if all(f % seq_parallel == 0 for f in pts):
            out.append(t)
    return out


def sp_coverage(
    encoder_params: dict, seq_parallel: int, t_audio: int,
    include_frontend: bool = False,
) -> tuple:
    """(n_divisible, n_total) over the encoder's ``seq_constraint`` points for
    raw audio length ``t_audio``. ``seq_constraint`` silently skips points
    whose frame count does not divide the seq axis, so n_divisible == 0 means
    sequence parallelism would do NOTHING for this batch shape (every
    activation stays replicated along time)."""
    sched = seq_frame_schedule(encoder_params, t_audio)
    pts = sched if include_frontend else sched[1:]
    return sum(1 for f in pts if f % seq_parallel == 0), len(pts)


def sp_pad_align(encoder_params: dict, seq_parallel: int, max_extra_frac: float = 0.3):
    """Audio-pad aligner for SP loaders: maps a bucket pad length to the
    smallest length >= it whose WHOLE post-frontend frame schedule divides by
    ``seq_parallel`` (full sequence-parallel coverage). Because the alignment
    happens on the host at batch-materialisation time, the padded batch is
    identical under SP and DP programs — BatchNorm statistics and numerics
    are unaffected by the parallelism choice (unlike in-graph padding, which
    mesh.seq_constraint deliberately refuses to do).

    Raises if no aligned length exists within ``max_extra_frac`` above the
    target (cannot happen for the shipped stride schedules: frame counts step
    by 1 per hop, so an f ≡ 0 (mod sp * prod(strides)) point is at most
    sp * prod(strides) hops away)."""
    p = encoder_params
    hop = p["sample_rate"] * p["hop_length_ms"] // 1000

    def align(t_pad: int) -> int:
        t = t_pad + (-t_pad) % hop
        limit = int(t_pad * (1 + max_extra_frac)) + 64 * hop
        while t <= limit:
            n_div, n_tot = sp_coverage(p, seq_parallel, t)
            if n_div == n_tot:
                return t
            t += hop
        raise ValueError(
            f"no seq_parallel={seq_parallel}-aligned audio length within "
            f"{max_extra_frac:.0%} above {t_pad}"
        )

    return align


def sp_coverage_warn(encoder_params: dict, mesh, t_audio: int) -> None:
    """Warn loudly when a training batch of raw length ``t_audio`` under a
    "seq" mesh would have ZERO sharded constraint points (SP silently
    degrading to DP). Called by the trainer once per distinct batch length."""
    if mesh is None or "seq" not in mesh.axis_names:
        return
    sp = mesh.shape["seq"]
    n_div, n_tot = sp_coverage(encoder_params, sp, t_audio)
    if n_div == 0:
        import warnings

        warnings.warn(
            f"sequence parallelism is INACTIVE for audio length {t_audio}: "
            f"none of the {n_tot} encoder constraint points divide the seq "
            f"axis ({sp}); activations stay time-replicated and the run "
            f"degrades to data parallelism over fewer samples. Align loader "
            f"pad lengths with parallel.mesh.sp_pad_align (AsrBatchLoader "
            f"audio_pad_align=...) or pick train_audio_max_length from "
            f"parallel.mesh.sp_audio_lengths.",
            RuntimeWarning,
            stacklevel=2,
        )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def globalize(mesh: Mesh, tree):
    """Turn process-local (host) arrays into fully-replicated global arrays.

    Under multi-controller JAX, a jit program over a global mesh requires
    global Arrays; model/optimizer state built identically on every process
    (deterministic PRNG init) is replicated without any transfer."""
    if jax.process_count() == 1:
        return tree
    sharding = NamedSharding(mesh, P())

    def rep(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x, x.shape)

    return jax.tree.map(rep, tree)


def shard_batch(mesh: Mesh, batch, batch_axis: int = 0):
    """Put a host batch onto the mesh with ``batch_axis`` sharded over the
    data axis.

    Train batches are stacked (accum, batch, ...) so their batch axis is 1.
    Arrays whose batch dim is not divisible by the mesh size (tiny eval tails,
    toy tests) are replicated instead.

    Multi-host (jax.process_count() > 1): each process passes its PER-PROCESS
    slice of the global batch (loaders shard with shard_id=process_index) and
    the global array is assembled with
    ``jax.make_array_from_process_local_data`` — a plain device_put of
    host-global data would be wrong because each host only holds local data
    (the reference's analogue is the per-rank DistributedSampler,
    functions.py:168,196,216).
    """
    # batch divisibility is against the DATA axis only: under a multi-axis
    # (data, seq/model) mesh the other axes replicate the batch dimension
    n = mesh.shape.get("data", mesh.devices.size)
    nproc = jax.process_count()

    def put(x):
        if x.ndim > batch_axis and x.shape[batch_axis] % (n // nproc or 1) == 0:
            spec = [None] * x.ndim
            spec[batch_axis] = "data"
            sharding = NamedSharding(mesh, P(*spec))
            if nproc > 1:
                global_shape = list(x.shape)
                global_shape[batch_axis] *= nproc
                return jax.make_array_from_process_local_data(
                    sharding, np.asarray(x), tuple(global_shape)
                )
            if x.shape[batch_axis] % n == 0:
                return jax.device_put(x, sharding)
        if nproc > 1:  # replicated leaf; every process holds the same value
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, P()), np.asarray(x), x.shape
            )
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, batch)
