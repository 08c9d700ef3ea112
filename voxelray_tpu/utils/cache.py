"""Persistent XLA compilation cache setup.

Compiles on this environment go through a remote AOT helper (~20-40 s per
novel kernel variant); the persistent cache makes every repeat run cheap.
The env var alone is not reliably honored by the plugin, so this sets the
config explicitly.
"""
from __future__ import annotations

import os

_DEFAULT = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/jax_cache_voxelray")


def enable_compile_cache(path: str = _DEFAULT) -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older/newer jax without these knobs: non-fatal
