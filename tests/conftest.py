"""Test configuration: run JAX on a simulated 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/pjit code is validated
on virtual CPU devices per SURVEY.md §4's test strategy. The execution image
pins ``JAX_PLATFORMS=axon`` (real TPU tunnel) via sitecustomize, so we must
override unconditionally — both the env var and, post-import, the live config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", "tests must run on simulated CPU devices"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for mesh tests"
