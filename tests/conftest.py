"""Test configuration.

Tests run on a virtual 8-device CPU mesh so sharding/collective paths are
exercised without a TPU pod, and with x64 enabled so golden-value checks
against float64 reference semantics are meaningful.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
