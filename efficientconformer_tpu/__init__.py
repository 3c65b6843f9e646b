"""EfficientConformer-TPU: a TPU-native (JAX/XLA/Pallas/pjit) speech recognition
framework with the capabilities of the Efficient Conformer reference stack
(Burchi & Vielzeuf, arXiv:2109.01163).

This is a ground-up re-design for TPU hardware, not a port:

* All compute-path code is functional JAX, compiled once under ``jax.jit`` with
  static shapes (bucketed padding instead of dynamic sort-and-pad batches).
* Attention variants (vanilla / grouped / local / strided / linear x abs / rel-pos)
  are pure-jnp ops with Pallas fusions for the hot paths.
* Data parallelism is expressed with ``jax.sharding.Mesh`` + NamedSharding; batch
  statistics, losses and gradients are reduced by XLA collectives over ICI, which
  subsumes the reference's DDP/SyncBatchNorm/NCCL machinery.
* The RNN-T loss is a native JAX diagonal-wavefront lattice scan (the reference
  uses the warp_rnnt CUDA extension).
* Host-side runtime (beam search with n-gram fusion, BPE tokenizer) has native
  C++ components under ``native/``.

Public config-file API (JSON schema, key names) matches the reference
``configs/*.json`` exactly; see ``efficientconformer_tpu.config``.
"""

__version__ = "0.1.0"

from efficientconformer_tpu.config import load_config, Config  # noqa: F401
