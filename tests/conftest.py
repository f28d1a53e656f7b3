"""Test configuration: force a virtual 8-device CPU platform with float64 enabled.

Tests validate the production JAX path bit-tight against the float64 numpy oracle
(complex128 end to end), and sharding tests use the 8 virtual CPU devices as a stand-in
mesh for a TPU pod slice (the driver separately dry-run-compiles the multi-chip path).

Note: this environment pre-registers a TPU ('axon') PJRT plugin via sitecustomize, so
platform selection must happen via jax.config *before* first backend use — env vars
alone are overridden by the plugin registration.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
