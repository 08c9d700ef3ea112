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
                                             "voxel_size_static",
                                             "word_capacity"))
def extract_aabbs_fixed(occ, origin, *, capacity, dims, voxel_size_static,
                        word_capacity=None):
    """Jitted compaction: occupancy (Z,Y,X) -> ((capacity, 6), count).

    Entries beyond `count` are zero.  Ordering is ascending linear index
    (x fastest), identical to the reference's sweep.  Cells beyond capacity
    are dropped (callers size capacity from count_occupied or mesh stats).

    Two-phase word compaction (this is the getAabbs analog of the
    reference's countr_zero word skip, voxelgridBool.cpp:18-52): scatter
    cost on this TPU is per UPDATE (~132M/s), so the naive per-cell
    compaction paid one update per GRID CELL (350 ms at 512^3).  Phase 1
    packs cells into u32 words and compacts the nonzero words (n/32
    updates); phase 2 expands only those words' 32 bit lanes and places
    set cells by word-prefix-popcount rank (32*word_capacity updates).

    word_capacity bounds the NONZERO WORD count like capacity bounds the
    cell count — size it from stats (<= 1 + count nonzero words always
    holds, so word_capacity=capacity is the safe default; dense grids
    can pass count_occupied(occ)//4-ish for the full speedup).
    """
    flat = occ.reshape(-1).astype(bool)
    n = flat.shape[0]
    nw = max(1, -(-n // 32))
    if word_capacity is None:
        word_capacity = capacity
    wcap = min(nw, word_capacity)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    padded = jnp.pad(flat, (0, nw * 32 - n))
    words = (padded.reshape(nw, 32).astype(jnp.uint32) << shifts).sum(
        axis=1, dtype=jnp.uint32)
    pops = jax.lax.population_count(words).astype(jnp.int32)
    cell_prefix = jnp.cumsum(pops) - pops         # rank of word's 1st cell
    count = (cell_prefix[-1] + pops[-1]).astype(jnp.int32)

    # phase 1: compact nonzero-word INDICES (one scatter, nw updates)
    nz = words != 0
    wpos = jnp.cumsum(nz.astype(jnp.int32)) - 1
    wkeep = nz & (wpos < wcap)
    wslot = jnp.where(wkeep, wpos, wcap)
    cwi = jnp.full((wcap,), nw, jnp.int32).at[wslot].set(
        jnp.arange(nw, dtype=jnp.int32), mode="drop")
    wlive = cwi < nw
    cwi_c = jnp.minimum(cwi, nw - 1)
    cw = jnp.where(wlive, words[cwi_c], 0)        # (wcap,) u32
    crank = jnp.where(wlive, cell_prefix[cwi_c], capacity)

    # phase 2: expand bits, place by rank (32 * wcap updates)
    bits = ((cw[:, None] >> shifts) & 1).astype(jnp.int32)   # (wcap, 32)
    in_word_rank = jnp.cumsum(bits, axis=1) - bits
    rank = crank[:, None] + in_word_rank
    keep = (bits > 0) & (rank < capacity)
    slot = jnp.where(keep, rank, capacity)
    lin2 = cwi_c[:, None] * 32 + jnp.arange(32, dtype=jnp.int32)
    out_lin = jnp.zeros((capacity,), jnp.int32).at[slot.reshape(-1)].set(
        jnp.where(keep, lin2, 0).reshape(-1), mode="drop")
    aabbs = aabbs_from_linear(out_lin, dims, origin, voxel_size_static)
    # Cells from words dropped by an undersized word_capacity are exactly
    # the TAIL ranks (words compact in linear order, ranks ascend with
    # word index), so clamping the valid mask to the PLACED cell count
    # gives the same clean tail-drop semantics as a capacity overflow.
    # `count` is still the full popcount: count > number of valid rows is
    # the caller's overflow signal for either bound (ADVICE r2 item 1).
    kept = jnp.sum(jnp.where(wkeep, pops, 0))
    valid = jnp.arange(capacity) < jnp.minimum(count, kept)
    return jnp.where(valid[:, None], aabbs, 0.0), count


def count_occupied(occ) -> int:
    return int(jnp.sum(occ.astype(jnp.int32)))


def count_nonzero_words(occ) -> int:
    """Number of nonzero 32-cell words in the flattened occupancy —
    the stats source for extract_aabbs_fixed's word_capacity (size it
    like capacity: from worst-case geometry, with slack)."""
    flat = np.asarray(occ).reshape(-1).astype(bool)
    if flat.size == 0:
        return 0
    nw = -(-flat.size // 32)
    words = np.packbits(
        np.pad(flat, (0, nw * 32 - flat.size)).reshape(nw, 32),
        axis=1, bitorder="little").view(np.uint32)[:, 0]
    return int((words != 0).sum())


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
