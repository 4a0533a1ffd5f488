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

import pytest  # noqa: E402

# Fast/slow split: `pytest -m "not slow"` keeps the kernel/loader/parity
# signal cheap to run on every commit; the full suite stays the merge gate.
SLOW_MODULES = {
    "test_trainer",
    "test_cli_train",
    "test_refiner_hook",
    "test_parallel",
    "test_budget",
    "test_pseudo_sweep2",
}
SLOW_TESTS = {
    # fp64 finite differences / heavy overdraw / full toy-training runs
    "test_oracle_gradients_finite_differences",
    "test_early_termination_semantics",
    "test_order_independence_of_input",
    "test_pallas_gradients_match_xla",
    "test_pallas_multichannel",
    "test_pallas_early_termination_heavy_overdraw",
    "test_toy_training_improves_psnr",
    "test_dump_intermediate_sharded_matches_single",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        name = item.name.split("[")[0]
        if mod in SLOW_MODULES or name in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
