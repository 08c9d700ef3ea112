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

__all__ = ["extract_aabbs_fixed", "extract_aabbs_words", "extract_aabbs",
           "aabbs_from_linear", "count_occupied", "count_nonzero_words",
           "count_nonzero_bytes"]


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
                                             "word_capacity",
                                             "byte_capacity",
                                             "stop_after"))
def extract_aabbs_fixed(occ, origin, *, capacity, dims, voxel_size_static,
                        word_capacity=None, byte_capacity=None,
                        stop_after=None):
    """Jitted compaction: occupancy (Z,Y,X) -> ((capacity, 6), count).

    Entries beyond `count` are zero.  Ordering is ascending linear index
    (x fastest), identical to the reference's sweep.  Cells beyond capacity
    are dropped (callers size capacity from count_occupied or mesh stats).

    Three-phase word/byte compaction (the getAabbs analog of the
    reference's countr_zero word skip, voxelgridBool.cpp:18-52): scatter
    cost on this TPU is per update LANE (~132M/s in-jit), so the naive
    per-cell compaction paid one update per GRID CELL (350 ms at 512^3).
    Phase 1 packs cells into u32 words and compacts the nonzero words
    (n/32 lanes); phase 2a splits those into bytes and compacts the
    nonzero bytes (4*word_capacity lanes); phase 2b expands only those
    bytes' 8 bit lanes and places set cells by prefix-popcount rank
    (8*byte_capacity lanes).

    word_capacity / byte_capacity bound the nonzero word/byte counts
    like capacity bounds the cell count — size them from stats
    (count_nonzero_words / count_nonzero_bytes with slack); undersizing
    either tail-drops cleanly with count > valid rows as the overflow
    signal.
    """
    flat = occ.reshape(-1).astype(bool)
    n = flat.shape[0]
    nw = max(1, -(-n // 32))
    shifts = jnp.arange(32, dtype=jnp.uint32)
    padded = jnp.pad(flat, (0, nw * 32 - n))
    words = (padded.reshape(nw, 32).astype(jnp.uint32) << shifts).sum(
        axis=1, dtype=jnp.uint32)
    return _extract_from_words(words, origin, capacity=capacity,
                               dims=dims,
                               voxel_size_static=voxel_size_static,
                               word_capacity=word_capacity,
                               byte_capacity=byte_capacity,
                               stop_after=stop_after)


@functools.partial(jax.jit, static_argnames=("capacity", "dims",
                                             "voxel_size_static",
                                             "word_capacity",
                                             "byte_capacity",
                                             "stop_after"))
def extract_aabbs_words(words, origin, *, capacity, dims,
                        voxel_size_static, word_capacity=None,
                        byte_capacity=None, stop_after=None):
    """extract_aabbs_fixed taking the PACKED uint32 words directly
    (GridBool's native storage) — skips the unpack->repack round trip
    through a dense (Z,Y,X) uint8 volume (57 MB materialized in HBM at
    512^3).  Bit order matches pack_bits: bit idx%32 of word idx/32,
    padding bits beyond the cell count zero."""
    return _extract_from_words(words, origin, capacity=capacity,
                               dims=dims,
                               voxel_size_static=voxel_size_static,
                               word_capacity=word_capacity,
                               byte_capacity=byte_capacity,
                               stop_after=stop_after)


def _extract_from_words(words, origin, *, capacity, dims,
                        voxel_size_static, word_capacity, byte_capacity,
                        stop_after):
    nw = words.shape[0]
    if nw == 0:
        return jnp.zeros((capacity, 6), jnp.float32), jnp.int32(0)
    if word_capacity is None:
        word_capacity = capacity
    wcap = min(nw, word_capacity)
    # `count` is the FULL popcount (a reduction, not a prefix sum): it
    # must exceed the placed-row count when a capacity bound drops cells
    # — that's the caller's overflow signal (ADVICE r2 item 1).  All
    # RANKS are computed post-compaction instead (see phase 2a): the
    # compactions preserve ascending (word, byte) order and every
    # dropped element is all-zero or a tail, so prefix sums over the
    # COMPACTED populations equal the global prefix ranks — this removed
    # a full-width 4.2M popcount+cumsum pair, a compacted-rank gather,
    # and a second 1.2M-lane rank scatter (round-3 stage-C attribution:
    # every phase sits at the scatter/cumsum lane wall, so fewer lanes
    # IS the optimization).
    count = jnp.sum(jax.lax.population_count(words).astype(jnp.int32))
    if stop_after == "pack":                      # profiling attribution
        return jnp.zeros((capacity, 6), jnp.float32), count

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
    if stop_after == "p1":                        # profiling attribution
        return (jnp.zeros((capacity, 6), jnp.float32)
                .at[0, 0].set(cw.sum().astype(jnp.float32)), count)

    # phase 2a: split compacted words into bytes and compact the NONZERO
    # bytes (scatter cost on this TPU prices per update LANE, ~132M/s
    # in-jit — round-3 stage-K profile — so the win comes from shrinking
    # the lane count: 32*wcap bit lanes become 4*wcap byte lanes here
    # plus 8*byte_capacity bit lanes below; surface occupancy keeps set
    # bits clustered, so nonzero bytes ~ 1.2-1.5x nonzero words)
    # byte_capacity bounds NONZERO BYTES like word_capacity bounds
    # nonzero words; the safe default 4*wcap (a word has at most 4
    # nonzero bytes) keeps phase 2b at the old 32*wcap lane count —
    # callers with stats (count_nonzero_bytes) pass a tight bound for
    # the ~2x lane cut, with the same clean tail-drop + count>valid
    # overflow signal if undersized.
    bcap = min(4 * wcap, byte_capacity if byte_capacity else 4 * wcap)
    bcap = max(1, bcap)
    byte_sh = jnp.arange(4, dtype=jnp.uint32) * 8
    bytes_ = ((cw[:, None] >> byte_sh) & 0xFF).astype(jnp.uint32)
    bnz = (bytes_ != 0) & wlive[:, None]
    bpos = jnp.cumsum(bnz.reshape(-1).astype(jnp.int32)) - 1
    bkeep = bnz.reshape(-1) & (bpos < bcap)
    bslot = jnp.where(bkeep, bpos, bcap)
    # pack (byte value, byte index in word) into one update so phase 2a
    # is ONE scatter: value | byte_row << 8 (byte_row = word*4 + byte
    # index, < 2^23 even at 512^3, so the packed int32 never overflows)
    byte_row = (cwi_c[:, None] * 4
                + jnp.arange(4, dtype=jnp.int32)[None, :])
    packed = (bytes_.astype(jnp.int32) | (byte_row << 8)).reshape(-1)
    cb = jnp.zeros((bcap,), jnp.int32).at[bslot].set(
        jnp.where(bkeep, packed, 0), mode="drop")
    if stop_after == "p2a":                       # profiling attribution
        return (jnp.zeros((capacity, 6), jnp.float32)
                .at[0, 0].set(cb.sum().astype(jnp.float32)), count)

    # phase 2b: expand the 8 bit lanes of each nonzero byte, place by
    # prefix-popcount rank (8 * bcap updates).  Ranks come from the
    # COMPACTED byte populations: compaction preserved ascending
    # (word, byte) order — which is ascending global rank — and dropped
    # elements are all-zero (contribute 0) or capacity-dropped tails
    # (all later ranks), so cumsum over cb's popcounts IS the global
    # prefix rank.  Empty tail slots of cb get a valid-looking rank but
    # bits == 0 keeps them out of the scatter.
    shifts8 = jnp.arange(8, dtype=jnp.int32)
    bval = cb & 0xFF
    bpops_c = jax.lax.population_count(bval.astype(jnp.uint32)) \
        .astype(jnp.int32)
    cbrank = jnp.cumsum(bpops_c) - bpops_c
    bits = (bval[:, None] >> shifts8) & 1                    # (bcap, 8)
    in_byte_rank = jnp.cumsum(bits, axis=1) - bits
    rank = cbrank[:, None] + in_byte_rank
    keep = (bits > 0) & (rank < capacity)
    slot = jnp.where(keep, rank, capacity)
    lin2 = ((cb >> 8) * 8)[:, None] + shifts8[None, :]
    out_lin = jnp.zeros((capacity,), jnp.int32).at[slot.reshape(-1)].set(
        jnp.where(keep, lin2, 0).reshape(-1), mode="drop")
    aabbs = aabbs_from_linear(out_lin, dims, origin, voxel_size_static)
    # Cells from words dropped by an undersized word_capacity are exactly
    # the TAIL ranks (words compact in linear order, ranks ascend with
    # word index), so clamping the valid mask to the PLACED cell count
    # gives the same clean tail-drop semantics as a capacity overflow.
    # `count` is still the full popcount: count > number of valid rows is
    # the caller's overflow signal for either bound (ADVICE r2 item 1).
    # (byte-capacity drops are tail ranks too: bnz iterates in (word,
    # byte) order, which is ascending rank)
    kept = cbrank[-1] + bpops_c[-1]
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


def count_nonzero_bytes(occ) -> int:
    """Number of nonzero 8-cell bytes — the stats source for
    extract_aabbs_fixed's byte_capacity."""
    flat = np.asarray(occ).reshape(-1).astype(bool)
    if flat.size == 0:
        return 0
    nb = -(-flat.size // 8)
    bytes_ = np.packbits(
        np.pad(flat, (0, nb * 8 - flat.size)).reshape(nb, 8),
        axis=1, bitorder="little")[:, 0]
    return int((bytes_ != 0).sum())


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
