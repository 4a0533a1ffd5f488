"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding tests use a virtual 8-device CPU mesh
(xla_force_host_platform_device_count), mirroring how the driver dry-runs the
multi-chip path. The axon sitecustomize pins JAX_PLATFORMS=axon in the
environment, so the env var alone is not enough — we must also override via
jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()
