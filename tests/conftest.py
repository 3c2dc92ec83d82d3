"""Test configuration.

Tests run on a virtual 8-device CPU mesh so sharding/collective paths are
exercised without a TPU pod, and with x64 enabled so golden-value checks
against float64 reference semantics are meaningful.

The environment registers a remote-TPU ("axon") backend factory whose
initialization blocks ~95s per process on a network round-trip — even
when JAX_PLATFORMS=cpu, because backend discovery initializes every
registered plugin. CPU tests never touch the TPU, so we drop the axon
factory from the registry before any backend is initialized. Set
AMPC_KEEP_AXON=1 to keep it (for on-TPU test runs).
"""

import os

os.environ["JAX_PLATFORMS"] = (
    os.environ.get("JAX_PLATFORMS", "cpu")
    if os.environ.get("AMPC_KEEP_AXON") == "1"
    else "cpu"
)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if os.environ.get("AMPC_KEEP_AXON") != "1":
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    # sitecustomize imported jax before this conftest ran, so the
    # platform selection was already baked from JAX_PLATFORMS=axon;
    # rebind it through the config system.
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)
