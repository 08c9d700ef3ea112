"""Triangle/box separating-axis test (SAT) as a vectorized JAX op.

Semantics are the Akenine-Möller 13-axis test exactly as the reference
implements it (triBoxOverlap, src/VoxelBuilder.hpp:118-162 — the optimized
triBoxOverlapSchwarzSeidel at :226-335 is the same predicate):

  1. three box axes, strict-inequality separation,
  2. nine edge-cross axes; an axis with L1 norm < 1e-8 never separates
     (VoxelBuilder.hpp:76-78),
  3. triangle-plane test; a normal with L1 norm < 1e-8 never separates
     (VoxelBuilder.hpp:107-110).

Everything is float32 with the reference's expression shapes so occupancy
stays bit-exact.  All inputs broadcast: typical use is centers (F, C, 3)
against per-triangle vertices (F, 1, 3).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["tri_box_overlap"]

_EPS = jnp.float32(1e-8)


def tri_box_overlap(centers, half, v0, v1, v2):
    """Overlap predicate; returns bool with the broadcast batch shape.

    centers: (..., 3) box centers; half: scalar float32 half extent
    (cubical cells); v0/v1/v2: (..., 3) triangle vertices (broadcastable
    against centers).
    """
    c = centers.astype(jnp.float32)
    h = jnp.float32(half)

    p0 = v0.astype(jnp.float32) - c
    p1 = v1.astype(jnp.float32) - c
    p2 = v2.astype(jnp.float32) - c

    e0 = p1 - p0
    e1 = p2 - p1
    e2 = p0 - p2

    # 1) box axes
    mn = jnp.minimum(p0, jnp.minimum(p1, p2))
    mx = jnp.maximum(p0, jnp.maximum(p1, p2))
    sep = jnp.any((mn > h) | (mx < -h), axis=-1)

    # 2) nine edge-cross axes
    def axis_sep(ax, ay, az, r):
        l1 = jnp.abs(ax) + jnp.abs(ay) + jnp.abs(az)
        d0 = p0[..., 0] * ax + p0[..., 1] * ay + p0[..., 2] * az
        d1 = p1[..., 0] * ax + p1[..., 1] * ay + p1[..., 2] * az
        d2 = p2[..., 0] * ax + p2[..., 1] * ay + p2[..., 2] * az
        tmin = jnp.minimum(d0, jnp.minimum(d1, d2))
        tmax = jnp.maximum(d0, jnp.maximum(d1, d2))
        return (l1 >= _EPS) & ((tmin > r) | (tmax < -r))

    zero = jnp.float32(0.0)
    for e in (e0, e1, e2):
        ex, ey, ez = e[..., 0], e[..., 1], e[..., 2]
        sep |= axis_sep(zero, -ez, ey, h * jnp.abs(-ez) + h * jnp.abs(ey))
        sep |= axis_sep(ez, zero, -ex, h * jnp.abs(ez) + h * jnp.abs(-ex))
        sep |= axis_sep(-ey, ex, zero, h * jnp.abs(-ey) + h * jnp.abs(ex))

    # 3) triangle plane
    n = jnp.cross(e0, e1)
    an = jnp.abs(n)
    nl1 = an[..., 0] + an[..., 1] + an[..., 2]
    r = h * an[..., 0] + h * an[..., 1] + h * an[..., 2]
    s = (n * p0).sum(axis=-1)
    sep |= (nl1 >= _EPS) & (jnp.abs(s) > r)

    return ~sep
