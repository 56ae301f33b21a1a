"""Test configuration: force an 8-device virtual CPU mesh.

Sharding tests exercise real pjit/shard_map partitioning without TPU
hardware; bench.py is the only entry point that touches the real chip.
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Deterministic, no accidental x64 dependence in device code; host hashing
# uses numpy uint64 explicitly.
os.environ.setdefault("JAX_ENABLE_X64", "0")
