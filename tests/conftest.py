"""Test harness: force an 8-device virtual CPU mesh.

The session environment registers an `axon` TPU backend at interpreter start
(sitecustomize) and pins jax_platforms="axon,cpu" via jax.config — env vars
alone can't override it.  Unit tests must run on virtual CPU devices so
sharding logic is exercised on an 8-way mesh and numerics are full fp32;
real-TPU perf is measured separately by bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
