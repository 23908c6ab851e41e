"""Test harness configuration.

Tests run on CPU with 8 virtual devices (multi-chip sharding validation
without TPU hardware) and x64 enabled so float64 reference-parity paths
work.  All framework code uses explicit dtypes, so float32 paths stay
float32 under x64.

NOTE: setting the JAX_PLATFORMS *env var* is not enough here — the host's
sitecustomize registers a TPU-tunnel backend at interpreter start via
``jax.config.update("jax_platforms", "axon,cpu")``, and explicit config
beats the env var.  We must update the config again after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
