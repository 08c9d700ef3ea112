"""Grid geometry math: bounding boxes, grid dimensioning, index maps.

Semantics mirror the reference voxel grid base class:
  - index map x + X*(y + Y*z)            (reference: src/voxelgrid.hpp:37-40)
  - inverse map                          (reference: src/voxelgrid.hpp:42-49)
  - voxel center org + (pos+0.5)*size    (reference: src/voxelgrid.hpp:91-100)
  - dims = ceil(extent / voxelSize)      (reference: src/VoxelBuilder.hpp:347-349)
  - mesh bbox over *all* vertices in the attrib array, not only referenced
    ones                                 (reference: src/VoxelBuilder.hpp:198-224)

All float math is float32 to keep occupancy bit-exact with the C++ build.
Functions take/return plain numpy or jax arrays; nothing here requires a
device.
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "mesh_bbox",
    "grid_dims",
    "map3d_to_1d",
    "map1d_to_3d",
    "voxel_center",
    "voxel_diameter",
]


def mesh_bbox(vertices) -> tuple[np.ndarray, np.ndarray]:
    """(min, max) corners over every vertex row, float32.

    Matches computeBboxFromAttrib (VoxelBuilder.hpp:198-224): every vertex in
    the attribute array participates, whether or not a face references it.
    Empty input yields (+inf, -inf) corners exactly like the C++ loop.
    """
    v = np.asarray(vertices, dtype=np.float32).reshape(-1, 3)
    if v.shape[0] == 0:
        return (
            np.full(3, np.inf, dtype=np.float32),
            np.full(3, -np.inf, dtype=np.float32),
        )
    return v.min(axis=0), v.max(axis=0)


def grid_dims(bb_min, bb_max, voxel_size: float) -> tuple[int, int, int]:
    """Per-axis cell counts: ceil((max-min)/voxelSize) evaluated in float32.

    Matches VoxelBuilder.hpp:347-349 (float division then std::ceil then
    size_t cast).  A degenerate axis (zero extent) yields 0 cells, which the
    reference also produces — e.g. a flat ground plane voxelizes to an empty
    grid.
    """
    bb_min = np.asarray(bb_min, dtype=np.float32)
    bb_max = np.asarray(bb_max, dtype=np.float32)
    vs = np.float32(voxel_size)
    ext = (bb_max - bb_min) / vs
    dims = np.ceil(ext).astype(np.int64)
    return int(dims[0]), int(dims[1]), int(dims[2])


def map3d_to_1d(x, y, z, dims):
    """Linear voxel index x + X*(y + Y*z); x is the fastest-varying axis."""
    nx, ny, _ = dims
    return x + nx * (y + ny * z)


def map1d_to_3d(i, dims):
    """Inverse of map3d_to_1d; returns (x, y, z)."""
    nx, ny, _ = dims
    x = i % nx
    y = (i // nx) % ny
    z = i // (nx * ny)
    return x, y, z


def voxel_center(x, y, z, origin, voxel_size):
    """World-space cell center: origin + (idx + 0.5) * voxelSize, float32.

    The (idx + 0.5) sum happens before the multiply, exactly as in
    voxelgrid.hpp:91-100, so the float rounding sequence is identical.
    Works on scalars or broadcasting arrays; xp may be numpy or jax.numpy.
    """
    origin = np.asarray(origin, dtype=np.float32)
    vs = np.float32(voxel_size)
    x = np.asarray(x, dtype=np.float32)
    y = np.asarray(y, dtype=np.float32)
    z = np.asarray(z, dtype=np.float32)
    return np.stack(
        [
            origin[0] + (x + np.float32(0.5)) * vs,
            origin[1] + (y + np.float32(0.5)) * vs,
            origin[2] + (z + np.float32(0.5)) * vs,
        ],
        axis=-1,
    )


def voxel_diameter(voxel_size: float) -> float:
    """hypot(s, s, s) — the cell's space diagonal (voxelgrid.hpp:58-62)."""
    s = np.float32(voxel_size)
    return float(np.sqrt(s * s + s * s + s * s))
