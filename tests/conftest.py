"""Test harness config: run everything on a virtual 8-device CPU mesh.

The environment pre-imports jax with ``JAX_PLATFORMS=axon`` (one real TPU
chip), so env-var tricks are too late; backend selection is still lazy, so
``jax.config`` redirects tests to CPU.  ``xla_force_host_platform_device_count``
fakes an 8-device mesh for ``shard_map``/``pjit`` tests (standard JAX recipe
for testing multi-chip code without hardware).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Golden tests compare against float64 scipy/sklearn; enable x64 so tests can
# opt into float64 (production code follows input dtype, float32/bf16 on TPU).
jax.config.update("jax_enable_x64", True)
