"""Test harness: force the host-CPU JAX backend with 8 virtual devices.

Tests must be hermetic and fast, so they never touch the real TPU tunnel.
Multi-chip sharding tests use the 8 fake CPU devices
(--xla_force_host_platform_device_count), matching how the driver dry-runs
the multi-chip path.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
