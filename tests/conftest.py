"""Test harness configuration.

Tests run on CPU with 8 virtual devices (the multi-chip "fake backend" —
SURVEY.md §4) and float64 enabled, so numerical assertions can be tight like
the reference gtest suite.

Note: the environment may pin JAX to a hardware TPU backend via
``JAX_PLATFORMS`` *and* an interpreter-startup plugin registration, so we
override through ``jax.config`` (which wins even when jax was already
imported by sitecustomize) rather than env vars."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute regression tests (deselect with -m 'not slow')")
