"""Persistent XLA compilation cache setup.

DANGER, learned the hard way: on this environment TPU compiles happen in a
*remote* AOT helper whose host CPU differs from ours.  Cache entries it
writes include XLA:CPU executables targeted at the remote machine
("prefer-no-scatter/prefer-no-gather" features); loading them locally
produces silently WRONG results and ~80x slowdowns.  Therefore:

  * the cache is enabled ONLY for pure-CPU sessions (tests), whose
    compiles are all local,
  * TPU sessions never touch a persistent cache, and
  * the cache directory is keyed on the host CPU identity (model +
    feature flags hash), so an entry written by one machine can never be
    loaded by a different one even if they share a filesystem / image
    (the round-1 "machine features mismatch ... SIGILL" AOT-loader
    warnings in the multichip dryrun).
"""
from __future__ import annotations

import hashlib
import os

__all__ = ["enable_compile_cache", "host_cpu_key"]


def host_cpu_key() -> str:
    """Short stable hash of this host's CPU model + feature flags."""
    ident = []
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("model name", "flags")):
                    ident.append(line.strip())
                    if len(ident) >= 2:
                        break
    except OSError:
        import platform

        ident = [platform.machine(), platform.processor()]
    return hashlib.sha1("\n".join(ident).encode()).hexdigest()[:12]


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    if jax.default_backend() != "cpu":
        return  # remote-AOT cache entries are machine-mismatched poison
    # Pin the platform: on this environment the axon TPU plugin can flip
    # the session to tpu AFTER backend init (it overrides JAX_PLATFORMS at
    # registration).  A session that was cpu when the cache was enabled
    # but later flips would ship the cache dir to the remote AOT helper,
    # which writes CPU executables for ITS machine into it — the exact
    # poisoning observed in round 1's multichip dryrun and again in a
    # round-2 axon CLI run.  Pinning makes "cpu cache => cpu session"
    # deterministic; TPU sessions must launch with JAX_PLATFORMS unset so
    # the plugin registers before this check (then no cache, no pin).
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        return
    if path is None:
        base = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                              "/tmp/jax_cache_voxelray_cpu")
        # always key on the host CPU — an env-provided dir shared across
        # machines is exactly the poisoning scenario this guards against
        path = f"{base.rstrip('/')}_{host_cpu_key()}"
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
