"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the honest multi-chip stand-in (SURVEY.md §4): sharding/pjit paths
compile and execute against 8 XLA host devices, no TPU needed.

Note: the environment's sitecustomize force-registers the `axon` TPU backend
(JAX_PLATFORMS=axon); `jax.config.update` after import is what actually wins,
the env var alone does not.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
