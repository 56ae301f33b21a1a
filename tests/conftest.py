"""Test configuration: force an 8-device virtual CPU mesh.

Sharding tests exercise real pjit/shard_map partitioning without TPU
hardware; bench.py is the only entry point that touches the real chip.
Must run before jax is imported anywhere.
"""

import os

# Force CPU even when the ambient environment pins a TPU platform:
# the bench host injects "axon" into jax_platforms ahead of env vars, so
# only a config.update after import wins. Tests must not occupy the real
# chip, and the sharding tests need 8 virtual devices.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Deterministic, no accidental x64 dependence in device code; host hashing
# uses numpy uint64 explicitly.
os.environ.setdefault("JAX_ENABLE_X64", "0")
