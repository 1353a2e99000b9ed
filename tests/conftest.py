"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4 rebuild
implication)."""

import os

# Force CPU: the environment may pin JAX_PLATFORMS to a TPU tunnel platform
# (axon) via sitecustomize, which imports jax at interpreter startup — env
# vars are too late by the time conftest runs. jax.config still wins as long
# as no computation has happened yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
