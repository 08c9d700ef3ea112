"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip configs (sharded voxelization / render) run against
xla_force_host_platform_device_count=8, mirroring how the driver dry-runs
the multichip path.  Real-TPU benchmarking happens in bench.py, not here.
"""
import os
import sys

# The machine profile exports JAX_PLATFORMS=axon and the axon plugin
# overrides jax_platforms at registration, so the env var alone is NOT
# enough — jax.config.update below is what actually pins the backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

from voxelray_tpu.utils.cache import enable_compile_cache  # noqa: E402

# Persistent compilation cache (XLA:CPU compile times for scatter-heavy
# kernels are high-variance on this box): dir is keyed on host CPU
# identity inside enable_compile_cache — never share entries across
# machines (the remote-AOT poisoning hazard, utils/cache.py docstring).
enable_compile_cache()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
