"""Test configuration: force CPU with 8 virtual devices BEFORE jax imports.

Multi-chip sharding logic is exercised on a fake 8-device CPU mesh
(SURVEY.md §4 test strategy); real-TPU benchmarks run via bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon site config force-registers the TPU platform regardless of the
# JAX_PLATFORMS env var; the config update below reliably pins tests to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
