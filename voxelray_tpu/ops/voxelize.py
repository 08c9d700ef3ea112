"""TPU-native mesh voxelization.

The reference voxelizes on the CPU: per triangle, a clamped voxel window is
scanned with a triple loop and a SAT test per cell (VoxelBuilder.hpp:164-196
serial, :422-537 threaded).  Here the same math becomes one data-parallel
XLA computation:

  * every triangle enumerates a *static-shape* window box (WX, WY, WZ) of
    candidate cells — the reference's dynamic `for z,y,x` nest becomes a
    static unravel of k in [0, WX*WY*WZ) plus per-axis masks
    dx < wx, dy < wy, dz < wz against the triangle's true clamped window
    (static divisors keep XLA's integer lowering cheap on every backend),
  * the 13-axis SAT runs vectorized over (triangles x cells),
  * hits scatter (constant value 1, promise_in_bounds, misses routed to
    a trash slot) into a dense occupancy volume — the deterministic
    equivalent of the thread-bucket merge at VoxelBuilder.hpp:533-537.

The computation is chunked over triangles with a static python loop
(straight-line under jit — gathers/scatters inside lax.scan bodies are
~40x slower on this TPU) to bound peak memory; the window shape is a
static argument so the kernel is jittable
and reusable across frames (per-frame re-voxelization of a deforming mesh
never leaves the device).  The host wrapper buckets triangles by per-axis
window extent so a few huge triangles don't drag every small one through
a giant window.

Occupancy is bit-exact vs. oracle.oracle_voxelize: identical window
truncation (including the max-boundary drop quirk), identical f32
expression shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .sat import tri_box_overlap

__all__ = [
    "voxelize_dense",
    "voxelize_mesh",
    "window_bounds",
    "required_window_shape",
]


def window_bounds(tri_min, tri_max, origin, voxel_size, dims):
    """Per-triangle clamped cell windows, the VoxelBuilder.hpp:175-184 math.

    tri_min/tri_max: (..., 3) float32 triangle bounds.  Returns
    (start, end): int32 arrays, start >= 0, end <= dims, with the
    reference's float-divide + truncate-toward-zero + `+2` slack.
    """
    origin = jnp.asarray(origin, dtype=jnp.float32)
    vs = jnp.float32(voxel_size)
    dims_arr = jnp.asarray(dims, dtype=jnp.int32)
    start = jnp.maximum(
        0, ((tri_min - origin) / vs).astype(jnp.int32)
    )
    end = jnp.minimum(
        dims_arr, ((tri_max - origin) / vs).astype(jnp.int32) + 2
    )
    return start, end


def _np_windows(vertices, faces, origin, voxel_size, dims):
    """Host-side per-triangle (start, end) with the exact reference math."""
    v = np.asarray(vertices, dtype=np.float32)
    f = np.asarray(faces)
    tri = v[f]
    tmin = tri.min(axis=1)
    tmax = tri.max(axis=1)
    origin = np.asarray(origin, dtype=np.float32)
    vs = np.float32(voxel_size)
    dims_arr = np.asarray(dims, dtype=np.int32)
    start = np.maximum(0, ((tmin - origin) / vs).astype(np.int32))
    end = np.minimum(dims_arr, ((tmax - origin) / vs).astype(np.int32) + 2)
    return start, np.maximum(end, start)


def required_window_shape(vertices, faces, origin, voxel_size, dims):
    """Max per-axis window extent over all triangles (host-side numpy).

    Drives the static window shape for voxelize_dense.  For animated meshes
    call once with worst-case geometry and reuse the shape so the jitted
    kernel never recompiles.
    """
    f = np.asarray(faces)
    if len(f) == 0:
        return (1, 1, 1)
    start, end = _np_windows(vertices, faces, origin, voxel_size, dims)
    w = (end - start).max(axis=0)
    return (max(1, int(w[0])), max(1, int(w[1])), max(1, int(w[2])))


@functools.partial(
    jax.jit,
    static_argnames=("dims", "voxel_size_static", "window", "chunk",
                     "with_hit_mask"),
)
def voxelize_dense(tri_verts, origin, *, dims, voxel_size_static, window,
                   chunk=4096, with_hit_mask=False):
    """Voxelize triangles into a dense occupancy volume.

    tri_verts: (F, 3, 3) float32 world-space triangle vertices.
    origin:    (3,) float32 grid min corner.
    dims:      static (X, Y, Z) cell counts.
    voxel_size_static: static float cell edge.
    window:    static (WX, WY, WZ) per-triangle window box; triangles whose
               clamped window exceeds it on any axis are truncated — callers
               pick it from required_window_shape(...).
    chunk:     static triangle chunk size for the scan (memory knob).
    with_hit_mask: also return per-(triangle, slot) hit mask, linear cell
               index, and the serial-order rank within the triangle's true
               window — needed by the duplicate-preserving Vec encoding.

    Returns occ (Z, Y, X) uint8 in {0,1}, set_calls (int32 scalar: total
    SAT hits including duplicates — the reference's m_voxelSet counter),
    and optionally (hit_mask, hit_lin, hit_rank).
    """
    nx, ny, nz = dims
    wx_c, wy_c, wz_c = window
    capacity = wx_c * wy_c * wz_c
    n_cells = nx * ny * nz
    vs = jnp.float32(voxel_size_static)
    half = jnp.float32(voxel_size_static * 0.5)
    origin = jnp.asarray(origin, dtype=jnp.float32)

    f_total = tri_verts.shape[0]
    n_chunks = max(1, -(-f_total // chunk))
    f_padded = n_chunks * chunk
    pad = f_padded - f_total
    # Padded triangles get +inf vertices: their window is empty.
    tri_verts = jnp.pad(tri_verts, ((0, pad), (0, 0), (0, 0)),
                        constant_values=np.inf)
    tri_chunks = tri_verts.reshape(n_chunks, chunk, 3, 3)
    # NOTE: chunks iterate as a STATIC python loop below — scatters inside
    # lax.scan bodies run ~40x slower on this TPU than straight-line code.

    # static unravel of the window box, x fastest (the reference's
    # z-outer / y / x-inner loop order)
    k = np.arange(capacity)
    dx = jnp.asarray((k % wx_c).astype(np.int32))
    dy = jnp.asarray(((k // wx_c) % wy_c).astype(np.int32))
    dz = jnp.asarray((k // (wx_c * wy_c)).astype(np.int32))

    def body(carry, tri):
        occ_flat, calls = carry
        v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
        tmin = jnp.minimum(v0, jnp.minimum(v1, v2))
        tmax = jnp.maximum(v0, jnp.maximum(v1, v2))
        # empty-window guard for padded/degenerate triangles
        finite = jnp.isfinite(tmin).all(axis=-1)
        tmin = jnp.where(finite[:, None], tmin, 0.0)
        tmax = jnp.where(finite[:, None], tmax, -1.0)
        start, end = window_bounds(tmin, tmax, origin, vs, (nx, ny, nz))
        w = jnp.maximum(end - start, 0)  # (chunk, 3) true window extents
        w = jnp.where(finite[:, None], w, 0)

        inside = (
            (dx[None, :] < w[:, 0:1])
            & (dy[None, :] < w[:, 1:2])
            & (dz[None, :] < w[:, 2:3])
        )  # (chunk, capacity)

        cx = start[:, 0:1] + dx[None, :]
        cy = start[:, 1:2] + dy[None, :]
        cz = start[:, 2:3] + dz[None, :]

        centers = jnp.stack(
            [
                origin[0] + (cx.astype(jnp.float32) + 0.5) * vs,
                origin[1] + (cy.astype(jnp.float32) + 0.5) * vs,
                origin[2] + (cz.astype(jnp.float32) + 0.5) * vs,
            ],
            axis=-1,
        )  # (chunk, capacity, 3)

        hit = inside & tri_box_overlap(
            centers, half, v0[:, None, :], v1[:, None, :], v2[:, None, :]
        )
        lin = cx + nx * (cy + ny * cz)  # (chunk, capacity)
        # misses write into the trash slot at the end of the buffer; all
        # real writes are the constant 1, so `set` is deterministic and
        # cheaper than `max`
        lin = jnp.where(hit, lin, n_cells)

        occ_flat = occ_flat.at[lin.reshape(-1)].set(
            jnp.uint8(1), mode="promise_in_bounds")
        calls = calls + hit.sum(dtype=jnp.int32)
        if with_hit_mask:
            # serial rank within the triangle's true window:
            # (dz*wy + dy)*wx + dx  (multiplies only, no division)
            rank = (dz[None, :] * w[:, 1:2] + dy[None, :]) * w[:, 0:1] \
                + dx[None, :]
            return (occ_flat, calls), (hit, lin, rank)
        return (occ_flat, calls), None

    # one extra trash slot absorbs the miss writes
    carry = (jnp.zeros((max(n_cells, 1) + 1,), dtype=jnp.uint8),
             jnp.int32(0))
    extras_list = []
    for c in range(n_chunks):
        carry, ex = body(carry, tri_chunks[c])
        if with_hit_mask:
            extras_list.append(ex)
    occ_flat, calls = carry
    occ = occ_flat[:n_cells].reshape(nz, ny, nx)
    if with_hit_mask:
        hit = jnp.concatenate([e[0] for e in extras_list])[:f_total]
        lin = jnp.concatenate([e[1] for e in extras_list])[:f_total]
        rank = jnp.concatenate([e[2] for e in extras_list])[:f_total]
        return occ, calls, hit, lin, rank
    return occ, calls


def _pow2(x: int) -> int:
    return 1 << max(0, int(np.ceil(np.log2(max(1, int(x))))))


def plan_buckets(vertices, faces, origin, voxel_size, dims,
                 max_buckets: int = 6):
    """Group triangles by pow2-rounded per-axis window extents.

    Returns [(window_shape, tri_indices), ...].  Greedy merge keeps the
    number of distinct compiled kernel variants bounded.
    """
    f = np.asarray(faces)
    if len(f) == 0:
        return []
    start, end = _np_windows(vertices, faces, origin, voxel_size, dims)
    w = np.maximum(end - start, 1)
    cw = np.stack([2 ** np.ceil(np.log2(w[:, i])).astype(np.int64)
                   for i in range(3)], axis=1)
    keys = [tuple(row) for row in cw]
    groups: dict[tuple, list[int]] = {}
    for i, key in enumerate(keys):
        groups.setdefault(key, []).append(i)
    items = sorted(groups.items(), key=lambda kv: -len(kv[1]))
    while len(items) > max_buckets:
        # merge the two smallest groups into their elementwise-max shape
        (ka, ia), (kb, ib) = items[-2], items[-1]
        merged = tuple(max(a, b) for a, b in zip(ka, kb))
        items = items[:-2]
        for j, (k2, i2) in enumerate(items):
            if k2 == merged:
                items[j] = (k2, i2 + ia + ib)
                break
        else:
            items.append((merged, ia + ib))
        items.sort(key=lambda kv: -len(kv[1]))
    return [((int(k[0]), int(k[1]), int(k[2])), np.asarray(i))
            for k, i in items]


def voxelize_mesh(vertices, faces, voxel_size, *, bb_min=None, bb_max=None,
                  window=None, chunk=4096, max_buckets=4):
    """Host-facing wrapper: mesh in, occupancy + grid metadata out.

    Computes bbox/dims host-side (exact reference math), buckets triangles
    by window shape, and runs the jitted kernel per bucket.  Returns a dict
    with occ (Z,Y,X) uint8 on device plus dims/origin/voxel_size/set_calls.
    """
    from .geometry import grid_dims, mesh_bbox

    v = np.asarray(vertices, dtype=np.float32).reshape(-1, 3)
    f = np.asarray(faces).reshape(-1, 3)
    if len(v) == 0 or len(f) == 0:
        return {
            "occ": jnp.zeros((0, 0, 0), dtype=jnp.uint8),
            "dims": (0, 0, 0),
            "origin": np.zeros(3, np.float32),
            "voxel_size": float(voxel_size),
            "set_calls": 0,
        }
    if bb_min is None or bb_max is None:
        bb_min, bb_max = mesh_bbox(v)
    bb_min = np.asarray(bb_min, dtype=np.float32)
    bb_max = np.asarray(bb_max, dtype=np.float32)
    dims = grid_dims(bb_min, bb_max, voxel_size)
    nx, ny, nz = dims

    if nx == 0 or ny == 0 or nz == 0:
        return {
            "occ": jnp.zeros((nz, ny, nx), dtype=jnp.uint8),
            "dims": dims, "origin": bb_min,
            "voxel_size": float(voxel_size),
            "set_calls": 0,
        }

    tri_all = v[f]  # (F, 3, 3)
    if window is not None:
        buckets = [(tuple(int(x) for x in window), np.arange(len(f)))]
    else:
        buckets = plan_buckets(v, f, bb_min, voxel_size, dims, max_buckets)

    occ = jnp.zeros((nz, ny, nx), dtype=jnp.uint8)
    total_calls = 0
    # chunk*capacity budget: large on TPU for throughput, small on CPU
    # (XLA:CPU scatter compile time grows with scatter size)
    budget = (1 << 22) if jax.default_backend() != "cpu" else (1 << 14)
    for win, idx in buckets:
        if len(idx) == 0:
            continue
        cap = win[0] * win[1] * win[2]
        bchunk = int(min(chunk, max(8, budget // cap)))
        occ_b, calls = voxelize_dense(
            jnp.asarray(tri_all[idx]), jnp.asarray(bb_min),
            dims=dims, voxel_size_static=float(voxel_size),
            window=win, chunk=bchunk,
        )
        occ = jnp.maximum(occ, occ_b)
        total_calls += int(calls)

    return {
        "occ": occ, "dims": dims, "origin": bb_min,
        "voxel_size": float(voxel_size),
        "set_calls": total_calls,
    }
