"""AABB extraction — the getAabbs() equivalents.

The reference walks its encodings on the CPU and emits a std::vector<Aabb>
(voxelgridBool.cpp:18-52 bit-scan, voxelgridAABBstruct.cpp:10-23 compaction,
voxelgridVecEncoding.cpp:16-19 passthrough).  Here extraction is a
prefix-sum compaction on device: ascending-linear-index order matches the
reference's linear sweeps exactly.

Dynamic result sizes don't exist under jit, so the jitted paths return a
padded (capacity, 6) buffer plus a count; the host wrappers trim.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["extract_aabbs_fixed", "extract_aabbs", "aabbs_from_linear",
           "count_occupied"]


def aabbs_from_linear(lin, dims, origin, voxel_size):
    """Linear cell indices -> (N, 6) AABBs [min|max], reference float math.

    Center = origin + (coords + 0.5) * voxelSize, corners = center -/+ half
    (voxelgridBool.cpp:34-43).
    """
    nx, ny, _ = dims
    lin = lin.astype(jnp.int32)
    x = lin % nx
    y = (lin // nx) % ny
    z = lin // (nx * ny)
    vs = jnp.float32(voxel_size)
    half = jnp.float32(0.5) * vs
    origin = jnp.asarray(origin, dtype=jnp.float32)
    cx = origin[0] + (x.astype(jnp.float32) + 0.5) * vs
    cy = origin[1] + (y.astype(jnp.float32) + 0.5) * vs
    cz = origin[2] + (z.astype(jnp.float32) + 0.5) * vs
    return jnp.stack(
        [cx - half, cy - half, cz - half, cx + half, cy + half, cz + half],
        axis=-1,
    )


@functools.partial(jax.jit, static_argnames=("capacity", "dims",
                                             "voxel_size_static"))
def extract_aabbs_fixed(occ, origin, *, capacity, dims, voxel_size_static):
    """Jitted compaction: occupancy (Z,Y,X) -> ((capacity, 6), count).

    Entries beyond `count` are zero.  Ordering is ascending linear index
    (x fastest), identical to the reference's sweep.  Cells beyond capacity
    are dropped (callers size capacity from count_occupied or mesh stats).
    """
    flat = occ.reshape(-1).astype(bool)
    n = flat.shape[0]
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1  # target slot per set cell
    count = jnp.where(n > 0, pos[-1] + 1, 0).astype(jnp.int32)
    lin = jnp.arange(n, dtype=jnp.int32)
    keep = flat & (pos < capacity)
    slot = jnp.where(keep, pos, capacity)  # dropped -> OOB slot
    out_lin = jnp.zeros((capacity,), jnp.int32).at[slot].set(
        jnp.where(keep, lin, 0), mode="drop"
    )
    aabbs = aabbs_from_linear(out_lin, dims, origin, voxel_size_static)
    valid = jnp.arange(capacity) < count
    return jnp.where(valid[:, None], aabbs, 0.0), count


def count_occupied(occ) -> int:
    return int(jnp.sum(occ.astype(jnp.int32)))


def extract_aabbs(grid) -> np.ndarray:
    """Host-facing extraction from a voxelize_mesh result dict or grid
    object with occ/dims/origin/voxel_size: exact-size (N, 6) float32."""
    if isinstance(grid, dict):
        occ, dims = grid["occ"], grid["dims"]
        origin, vs = grid["origin"], grid["voxel_size"]
    else:
        occ, dims = grid.occ, grid.dims
        origin, vs = grid.origin, grid.voxel_size
    occ_np = np.asarray(occ).astype(bool)
    if occ_np.size == 0:
        return np.zeros((0, 6), np.float32)
    lin = np.flatnonzero(occ_np.reshape(-1)).astype(np.int32)
    if len(lin) == 0:
        return np.zeros((0, 6), np.float32)
    return np.asarray(
        aabbs_from_linear(jnp.asarray(lin), dims, origin, vs)
    )
