"""The three interchangeable voxel-grid encodings as JAX pytrees.

Reference counterparts:
  GridBool       <- VoxelGridBool (src/voxelgridBool.{hpp,cpp}): 1 bit/cell
                    packed into uint32 words, word = idx/32, bit = idx%32.
  GridAabbStruct <- VoxelGridAABBstruct (src/voxelgridAABBstruct.{hpp,cpp}):
                    dense per-cell {min,max,isUsed}, 28 B/cell.
  GridVec        <- VoxelGridVec (src/voxelgridVecEncoding.{hpp,cpp}):
                    append-only AABB list, duplicates preserved in
                    setVoxel-call order.

All encodings share the base-grid semantics of VoxelGrid<T>
(src/voxelgrid.hpp): linear index x + X*(y + Y*z), voxel centers
origin + (idx+0.5)*size, out-of-bounds access raises, and a m_voxelSet
counter that counts *calls* (duplicates included).  Construction is
batch-functional: the voxelizer produces occupancy / hit streams on device
and the encodings are packed views of that result.

Memory accounting mirrors getMemoryUsageBytes exactly
(voxelgrid.hpp:115-122): element count times the C++ element size.
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.aabbs import aabbs_from_linear, extract_aabbs_fixed
from ..ops.voxelize import voxelize_dense, voxelize_mesh

__all__ = ["GridBool", "GridAabbStruct", "GridVec", "pack_bits",
           "unpack_bits", "build_grid"]


def pack_bits(occ_flat):
    """Dense {0,1} flat occupancy -> uint32 words, bit idx%32 of word idx/32."""
    n = occ_flat.shape[0]
    n_words = -(-n // 32) if n else 0
    padded = jnp.zeros((n_words * 32,), jnp.uint32).at[: n].set(
        occ_flat.astype(jnp.uint32)
    )
    lanes = padded.reshape(n_words, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return (lanes << shifts).sum(axis=1, dtype=jnp.uint32)


def unpack_bits(words, n_cells):
    """uint32 words -> flat {0,1} uint8 occupancy of length n_cells."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[:, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(-1)[:n_cells].astype(jnp.uint8)


def _check_bounds(x, y, z, dims):
    nx, ny, nz = dims
    if np.any(np.asarray(x) >= nx) or np.any(np.asarray(y) >= ny) \
            or np.any(np.asarray(z) >= nz) \
            or np.any(np.asarray(x) < 0) or np.any(np.asarray(y) < 0) \
            or np.any(np.asarray(z) < 0):
        raise IndexError("Index out of bounds")  # voxelgrid.hpp:68-70


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GridBool:
    """Bitmask encoding — the one the reference app actually uses
    (hello_vulkan.cpp:677)."""

    words: Any                      # uint32[ceil(X*Y*Z/32)]
    origin: Any                     # float32[3]
    dims: tuple = field(metadata=dict(static=True))
    voxel_size: float = field(metadata=dict(static=True))
    set_calls: int = 0              # m_voxelSet incl. duplicates

    # -- construction ------------------------------------------------------
    @classmethod
    def from_occupancy(cls, occ, origin, voxel_size, set_calls=0):
        dims = (occ.shape[2], occ.shape[1], occ.shape[0])
        return cls(words=pack_bits(jnp.asarray(occ).reshape(-1)),
                   origin=jnp.asarray(origin, jnp.float32),
                   dims=dims, voxel_size=float(voxel_size),
                   set_calls=int(set_calls))

    @classmethod
    def from_mesh(cls, vertices, faces, voxel_size, **kw):
        r = voxelize_mesh(vertices, faces, voxel_size, **kw)
        return cls.from_occupancy(r["occ"], r["origin"], r["voxel_size"],
                                  r["set_calls"])

    # -- queries -----------------------------------------------------------
    @property
    def n_cells(self):
        nx, ny, nz = self.dims
        return nx * ny * nz

    def occupancy(self):
        nx, ny, nz = self.dims
        return unpack_bits(self.words, self.n_cells).reshape(nz, ny, nx)

    def get_voxel(self, x, y, z):
        _check_bounds(x, y, z, self.dims)
        nx, ny, _ = self.dims
        idx = x + nx * (y + ny * z)
        w = np.asarray(self.words)[idx // 32]
        return bool((w >> (idx % 32)) & 1)

    def get_coords(self, x, y, z):
        _check_bounds(x, y, z, self.dims)
        from ..ops.geometry import voxel_center
        return voxel_center(x, y, z, np.asarray(self.origin), self.voxel_size)

    def get_aabbs(self):
        """(N, 6) float32 AABBs in ascending-linear-index order
        (voxelgridBool.cpp:18-52)."""
        occ = np.asarray(self.occupancy()).reshape(-1)
        lin = np.flatnonzero(occ).astype(np.int32)
        if len(lin) == 0:
            return jnp.zeros((0, 6), jnp.float32)
        return aabbs_from_linear(jnp.asarray(lin), self.dims, self.origin,
                                 self.voxel_size)

    def get_aabbs_fixed(self, capacity, word_capacity=None,
                        byte_capacity=None, group_capacity=None):
        """Jit-friendly padded extraction: ((capacity, 6), count).

        word_capacity / byte_capacity / group_capacity: optional nonzero
        word/byte/8-word-group bounds (size from ops.aabbs.count_nonzero_*
        with slack) — they shrink the compaction's scatter lanes; None
        is always safe.  Feeds the packed words directly (the grid's
        native storage) — no dense-volume unpack/repack round trip."""
        from ..ops.aabbs import extract_aabbs_words
        return extract_aabbs_words(
            self.words, self.origin, capacity=capacity,
            dims=self.dims, voxel_size_static=self.voxel_size,
            word_capacity=word_capacity, byte_capacity=byte_capacity,
            group_capacity=group_capacity,
        )

    def memory_usage_bytes(self):
        # m_voxel.size() * sizeof(unsigned int)
        return int(self.words.shape[0]) * 4


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GridAabbStruct:
    """Dense AabbInternal encoding: world min/max precomputed per cell."""

    minimum: Any                    # float32[N, 3]
    maximum: Any                    # float32[N, 3]
    used: Any                       # bool[N]
    origin: Any
    dims: tuple = field(metadata=dict(static=True))
    voxel_size: float = field(metadata=dict(static=True))
    set_calls: int = 0

    @classmethod
    def from_occupancy(cls, occ, origin, voxel_size, set_calls=0):
        dims = (occ.shape[2], occ.shape[1], occ.shape[0])
        flat = jnp.asarray(occ).reshape(-1).astype(bool)
        n = flat.shape[0]
        lin = jnp.arange(n, dtype=jnp.int32)
        boxes = aabbs_from_linear(lin, dims, origin, voxel_size)
        # unset cells hold zero-initialized AABBs (AabbInternal default)
        boxes = jnp.where(flat[:, None], boxes, 0.0)
        return cls(minimum=boxes[:, 0:3], maximum=boxes[:, 3:6], used=flat,
                   origin=jnp.asarray(origin, jnp.float32), dims=dims,
                   voxel_size=float(voxel_size), set_calls=int(set_calls))

    @classmethod
    def from_mesh(cls, vertices, faces, voxel_size, **kw):
        r = voxelize_mesh(vertices, faces, voxel_size, **kw)
        return cls.from_occupancy(r["occ"], r["origin"], r["voxel_size"],
                                  r["set_calls"])

    def occupancy(self):
        nx, ny, nz = self.dims
        return self.used.reshape(nz, ny, nx).astype(jnp.uint8)

    def get_voxel(self, x, y, z):
        _check_bounds(x, y, z, self.dims)
        nx, ny, _ = self.dims
        idx = x + nx * (y + ny * z)
        return (np.asarray(self.minimum[idx]), np.asarray(self.maximum[idx]),
                bool(self.used[idx]))

    def get_aabbs(self):
        """Compaction of used cells in linear order
        (voxelgridAABBstruct.cpp:10-23)."""
        used = np.asarray(self.used)
        lin = np.flatnonzero(used)
        boxes = jnp.concatenate([self.minimum, self.maximum], axis=1)
        return boxes[jnp.asarray(lin)] if len(lin) else \
            jnp.zeros((0, 6), jnp.float32)

    def memory_usage_bytes(self):
        # m_voxel.size() * sizeof(AabbInternal); the C++ struct is
        # 2 x vec3 + padded bool = 28 bytes
        nx, ny, nz = self.dims
        return nx * ny * nz * 28


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GridVec:
    """Append-only AABB vector: duplicates preserved in call order.

    The reference's setVoxel pushes a world AABB per call with no dedup
    (voxelgridVecEncoding.cpp:20-39), so one cell hit by k triangles
    appears k times.  Serial call order is triangle order with z-outer /
    y / x-inner within each triangle's window; the threaded path merges
    buckets in thread order which reproduces the same sequence.
    """

    aabbs: Any                      # float32[M, 6] (M includes duplicates)
    origin: Any
    dims: tuple = field(metadata=dict(static=True))
    voxel_size: float = field(metadata=dict(static=True))
    set_calls: int = 0

    @classmethod
    def from_mesh(cls, vertices, faces, voxel_size, *, bb_min=None,
                  bb_max=None, chunk=2048):
        from ..ops.geometry import grid_dims, mesh_bbox
        from ..ops.voxelize import required_window_shape

        v = np.asarray(vertices, dtype=np.float32).reshape(-1, 3)
        f = np.asarray(faces).reshape(-1, 3)
        if bb_min is None or bb_max is None:
            bb_min, bb_max = mesh_bbox(v)
        bb_min = np.asarray(bb_min, np.float32)
        bb_max = np.asarray(bb_max, np.float32)
        dims = grid_dims(bb_min, bb_max, voxel_size)
        nx, ny, nz = dims
        if nx == 0 or ny == 0 or nz == 0 or len(f) == 0:
            return cls(aabbs=jnp.zeros((0, 6), jnp.float32),
                       origin=jnp.asarray(bb_min), dims=dims,
                       voxel_size=float(voxel_size), set_calls=0)

        win = required_window_shape(v, f, bb_min, voxel_size, dims)
        cap = win[0] * win[1] * win[2]
        occ, calls, hit, lin, _rank = voxelize_dense(
            jnp.asarray(v[f]), jnp.asarray(bb_min), dims=dims,
            voxel_size_static=float(voxel_size), window=win,
            chunk=int(min(chunk, max(8, (1 << 22) // cap))),
            with_hit_mask=True,
        )
        # flat (tri, slot) order IS the serial emission order: slots are
        # enumerated z-outer / y / x-inner, like the reference loop nest
        hit_np = np.asarray(hit).reshape(-1)
        lin_np = np.asarray(lin).reshape(-1)
        order_lin = lin_np[hit_np]
        boxes = aabbs_from_linear(jnp.asarray(order_lin.astype(np.int32)),
                                  dims, bb_min, float(voxel_size)) \
            if len(order_lin) else jnp.zeros((0, 6), jnp.float32)
        return cls(aabbs=boxes, origin=jnp.asarray(bb_min), dims=dims,
                   voxel_size=float(voxel_size), set_calls=int(calls))

    def get_aabbs(self):
        return self.aabbs  # verbatim (voxelgridVecEncoding.cpp:16-19)

    def occupancy(self):
        nx, ny, nz = self.dims
        occ = jnp.zeros((nz * ny * nx,), jnp.uint8)
        if self.aabbs.shape[0] == 0:
            return occ.reshape(nz, ny, nx)
        half = jnp.float32(self.voxel_size * 0.5)
        centers = self.aabbs[:, 0:3] + half
        vs = jnp.float32(self.voxel_size)
        idx = ((centers - self.origin) / vs).astype(jnp.int32)
        lin = idx[:, 0] + nx * (idx[:, 1] + ny * idx[:, 2])
        return occ.at[lin].max(1).reshape(nz, ny, nx)

    def memory_usage_bytes(self):
        # m_voxel.size() * sizeof(Aabb) = 24 bytes per entry
        return int(self.aabbs.shape[0]) * 24


_ENCODINGS = {}


def build_grid(encoding: str, vertices, faces, voxel_size, **kw):
    """Encoding-dispatch constructor: 'bool' | 'aabbstruct' | 'vec' | 'octree'."""
    if encoding == "bool":
        return GridBool.from_mesh(vertices, faces, voxel_size, **kw)
    if encoding == "aabbstruct":
        return GridAabbStruct.from_mesh(vertices, faces, voxel_size, **kw)
    if encoding == "vec":
        return GridVec.from_mesh(vertices, faces, voxel_size, **kw)
    if encoding == "octree":
        from .octree import Octree
        return Octree.from_mesh(vertices, faces, voxel_size, **kw)
    raise ValueError(f"unknown encoding '{encoding}'")
