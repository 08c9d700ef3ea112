"""Persistent XLA compilation cache setup.

DANGER, learned the hard way: on this environment TPU compiles happen in a
*remote* AOT helper whose host CPU differs from ours.  Cache entries it
writes include XLA:CPU executables targeted at the remote machine
("prefer-no-scatter/prefer-no-gather" features); loading them locally
produces silently WRONG results and ~80x slowdowns.  Therefore:

  * the cache is enabled ONLY for pure-CPU sessions (tests), whose
    compiles are all local, and
  * TPU sessions never touch a persistent cache.
"""
from __future__ import annotations

import os

_DEFAULT = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/jax_cache_voxelray_cpu")


def enable_compile_cache(path: str = _DEFAULT) -> None:
    import jax

    if jax.default_backend() != "cpu":
        return  # remote-AOT cache entries are machine-mismatched poison
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
