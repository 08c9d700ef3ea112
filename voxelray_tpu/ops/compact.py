"""Shared active-set compaction idiom for the traversal backends.

Every compaction in the hot paths (fast-trace fine buffers, resident
straggler rounds, the exhaustiveness drains, the octree and tri-grid
marches) is the same four lines: rank actives with a cumsum, scatter
their source indices into a fixed `cap`-sized domain, and derive a
live-lane mask plus a clamped gather index.  One helper keeps the drop
semantics (empty slots hold the out-of-bounds index `n` so result
write-backs through `sel` drop instead of racing on a clamped
duplicate) identical at every site.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["compact_mask"]


def compact_mask(mask, cap: int, n: int):
    """Compact the True (or nonzero) lanes of `mask` (shape (n,)) into a
    `cap`-sized index domain.

    Returns (sel, live, sel_c, pos):
      sel   int32[cap] — source index of each compacted slot, `n` where
            the slot is empty (use as scatter target with mode="drop")
      live  bool[cap]  — slot holds a real ray
      sel_c int32[cap] — sel clamped to n-1 (safe gather index; lanes
            where ~live gather garbage the caller must mask)
      pos   int32[n]   — each source lane's rank among actives; lanes
            with pos >= cap did not fit (the caller's overflow set)
    """
    mask_i = mask.astype(jnp.int32)
    active = mask_i > 0
    pos = jnp.cumsum(mask_i) - 1
    slot = jnp.where(active & (pos < cap), pos, cap)
    sel = jnp.full((cap,), n, jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    live = sel < n
    sel_c = jnp.minimum(sel, n - 1)
    return sel, live, sel_c, pos
