"""Test configuration: run JAX on a simulated 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/pjit code is validated
on virtual CPU devices per SURVEY.md §4's test strategy. Must run before any
jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
