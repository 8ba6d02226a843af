"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# The harness environment pins JAX_PLATFORMS=axon (the real TPU tunnel);
# tests must run on the virtual CPU mesh, so force-override it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# sitecustomize (axon TPU tunnel) imports jax before conftest runs, baking
# JAX_PLATFORMS=axon into jax.config — override through the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.device_count() == 8, (
    f"tests require the 8-device virtual CPU mesh, got {jax.devices()}"
)
