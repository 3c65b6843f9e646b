"""Test configuration: run everything on CPU with 8 virtual devices so that
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4).

The container's sitecustomize force-registers the TPU ('axon') platform and
overrides JAX_PLATFORMS, so we must reset the platform through jax.config
after import, before any backend is initialised.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, jax.devices()
