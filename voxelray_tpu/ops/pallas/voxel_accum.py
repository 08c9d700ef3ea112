"""Pallas TPU kernel: VMEM slab-accumulation voxelizer.

The XLA scatter engine prices ~94M lanes/s in context (RESULTS.md round-4
stage D), which parks the 1M-tri 512^3 voxelize at ~237 ms: 16.4M padded
(triangle, window-slot) scatter lanes at the wall.  Round 4 proved no XLA
reformulation escapes it — every added pass pays the same per-lane rate.
This kernel BYPASSES the scatter engine (VERDICT r4 item 2 / RESULTS.md
roadmap item 1): SAT hits are accumulated into a VMEM-resident z-slab
image and each slab touches HBM exactly once.

How the per-lane scatter becomes TPU-native compute:

  * The grid is cut into z-slabs of 8 layers.  One slab's cell image is
    an (NY*8, NXp) f32 count matrix that lives in VMEM as the kernel's
    revisited output block (~5-6 MB at 512^3) — the "VMEM accumulation"
    the roadmap named.
  * A LANE is (triangle, z, y, 4-cell x-run) — one row of a triangle's
    clamped SAT window restricted to one slab, chunked to 4 cells in x.
    Lanes are enumerated, binned by (slab, y-bucket) and grouped into
    1024-lane batches AT PLAN TIME (host numpy): the voxelize call
    itself runs zero sorts and zero scatters.
  * Per 128-lane sub-batch the kernel evaluates the reference 13-axis
    SAT (sat.py expression shapes) for the 4 cells of each lane, builds
    a row one-hot A (RW, 128) and an x-run hit matrix Bt (NXp, 128),
    and accumulates A x Bt^T into the slab image with ONE
    lax.dot_general on the MXU — per-lane dynamic scatter is impossible
    in Mosaic (per-lane VMEM writes don't exist), but a one-hot matmul
    IS a scatter-add, and the MXU runs it at matrix rates.  Both
    one-hots keep the lane axis on the minor (lane) dimension and
    contract over it, so neither needs a cross-lane relayout.
  * Occupancy = (count > 0): collisions between triangles ADD, so the
    result is exact regardless of order.  set_calls = the exact integer
    hit count, summed per group in-kernel (i32) — no float-accumulation
    envelope.

Fidelity: the SAT runs the exact sat.py / VoxelBuilder.hpp:118-162
expression shapes on the exact reference window cells (the plan
enumerates the same effective windows the production scatter path
tests), so occupancy is bit-comparable to the scatter path and the
native oracle; tests pin equality.

Scope: the plan bakes the lane binning (and triangle vertex tables) from
concrete vertex positions, so this is the FIXED-GEOMETRY repeated-build
path — exactly the reference Benchmaker contract (hello_vulkan.h:185-195
re-builds the same OBJ N times).  Deforming meshes keep the scatter
path (their gate-5 grids are small).  Triangles whose window exceeds the
row window (wy > 16) fall back to the scatter path and OR in — a
handful per mesh, exactness unconditional.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["AccumPlan", "build_accum_plan", "voxelize_accum"]

SLABZ = 8          # z layers per slab (rows = y*SLABZ + z_local)
YB = 16            # y cells per row-bucket (row window = 2*YB*SLABZ)
RW = 2 * YB * SLABZ  # 256-row accumulation window
GROUP = 1024       # lanes per grid step (8 sub-batches of 128)
TRIW = 1024        # per-group triangle table slots
XRUN = 4           # cells per lane along x
_EPS = np.float32(1e-8)


def _mux1024(table, idx):
    """table (8, 128) f32 indexed by idx (8, 128) int32 in [0, 1024).

    Static 8-way mux over per-row lane gathers (the grid_walk pattern:
    intra-vreg dynamic_gather only reaches 8x128, bigger tables mux).
    """
    row = (idx >> 7).astype(jnp.int32)
    col = (idx & 127).astype(jnp.int32)
    out = jnp.zeros(idx.shape, jnp.float32)
    for r in range(8):
        tr = jnp.broadcast_to(table[r:r + 1, :], idx.shape)
        val = jnp.take_along_axis(tr, col, axis=1)
        out = jnp.where(row == r, val, out)
    return out


def _make_kernel(origin, vs, rps_pad, xp, n_y8):
    ogx, ogy, ogz = (np.float32(origin[0]), np.float32(origin[1]),
                     np.float32(origin[2]))
    vsf = np.float32(vs)
    half = np.float32(vs * 0.5)

    def sat_cell(cx, cy, cz, v):
        """Reference 13-axis SAT, sat.py expression shapes verbatim
        ((8,128) vregs; cy/cz-only subexpressions CSE across the 4
        x-cells without changing any float value)."""
        v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z = v
        p0x, p0y, p0z = v0x - cx, v0y - cy, v0z - cz
        p1x, p1y, p1z = v1x - cx, v1y - cy, v1z - cz
        p2x, p2y, p2z = v2x - cx, v2y - cy, v2z - cz
        e0x, e0y, e0z = p1x - p0x, p1y - p0y, p1z - p0z
        e1x, e1y, e1z = p2x - p1x, p2y - p1y, p2z - p1z
        e2x, e2y, e2z = p0x - p2x, p0y - p2y, p0z - p2z

        # 1) box axes
        def box_axis(a, b, c):
            mn = jnp.minimum(a, jnp.minimum(b, c))
            mx = jnp.maximum(a, jnp.maximum(b, c))
            return (mn > half) | (mx < -half)
        sep = box_axis(p0x, p1x, p2x) | box_axis(p0y, p1y, p2y) \
            | box_axis(p0z, p1z, p2z)

        # 2) nine edge-cross axes
        def axis_sep(ax, ay, az, r):
            l1 = jnp.abs(ax) + jnp.abs(ay) + jnp.abs(az)
            d0 = p0x * ax + p0y * ay + p0z * az
            d1 = p1x * ax + p1y * ay + p1z * az
            d2 = p2x * ax + p2y * ay + p2z * az
            tmn = jnp.minimum(d0, jnp.minimum(d1, d2))
            tmx = jnp.maximum(d0, jnp.maximum(d1, d2))
            return (l1 >= _EPS) & ((tmn > r) | (tmx < -r))

        zero = jnp.float32(0.0)
        for ex, ey, ez in ((e0x, e0y, e0z), (e1x, e1y, e1z),
                           (e2x, e2y, e2z)):
            sep |= axis_sep(zero, -ez, ey,
                            half * jnp.abs(-ez) + half * jnp.abs(ey))
            sep |= axis_sep(ez, zero, -ex,
                            half * jnp.abs(ez) + half * jnp.abs(-ex))
            sep |= axis_sep(-ey, ex, zero,
                            half * jnp.abs(-ey) + half * jnp.abs(ex))

        # 3) triangle plane (jnp.cross(e0, e1) component shapes)
        nx_ = e0y * e1z - e0z * e1y
        ny_ = e0z * e1x - e0x * e1z
        nz_ = e0x * e1y - e0y * e1x
        anx, any_, anz = jnp.abs(nx_), jnp.abs(ny_), jnp.abs(nz_)
        nl1 = anx + any_ + anz
        r = half * anx + half * any_ + half * anz
        s = nx_ * p0x + ny_ * p0y + nz_ * p0z
        sep |= (nl1 >= _EPS) & (jnp.abs(s) > r)
        return ~sep

    def kernel(slab_ref, first_ref, rowb_ref, salt_ref, lanes_ref,
               tridata_ref, acc_ref, cnt_ref):
        i = pl.program_id(0)
        slab = slab_ref[i]
        first = first_ref[i]
        # row_base is bucket*128 by construction; Mosaic needs the
        # windowed acc load/store offset provably sublane-aligned
        row_base = pl.multiple_of(rowb_ref[i], 128)

        @pl.when(first == 1)
        def _():
            acc_ref[...] = jnp.zeros((1, rps_pad, xp), jnp.float32)

        tri_l = lanes_ref[0, 0:8, :]
        x0 = lanes_ref[0, 8:16, :]
        xend = lanes_ref[0, 16:24, :]
        row = lanes_ref[0, 24:32, :]

        v = [_mux1024(tridata_ref[0, c], tri_l) for c in range(9)]

        y = row >> 3
        z = slab * SLABZ + (row & 7)
        # exact _chunk_hits center expressions (voxelize.py:181-188)
        cy = ogy + (y.astype(jnp.float32) + 0.5) * vsf
        cz = ogz + (z.astype(jnp.float32) + 0.5) * vsf

        hits = []
        for j in range(XRUN):
            xj = x0 + j
            cx = ogx + (xj.astype(jnp.float32) + 0.5) * vsf
            hit = (xj < xend) & sat_cell(cx, cy, cz, v)
            hits.append(hit)

        cnt = jnp.zeros((8, 128), jnp.int32)
        for h in hits:
            cnt = cnt + h.astype(jnp.int32)
        cnt_ref[0] = cnt

        row_rel = row - row_base
        upd = jnp.zeros((RW, xp), jnp.float32)
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (RW, 128), 0)
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (xp, 128), 0)
        for g in range(8):
            # A (RW, 128): row one-hot of sub-batch g's 128 lanes
            # (broadcasts materialized explicitly + masks combined by
            # f32 arithmetic — Mosaic rejects mixed-tiling i1 ANDs)
            row_b = jnp.broadcast_to(row_rel[g:g + 1, :], (RW, 128))
            a = (r_iota == row_b).astype(jnp.bfloat16)
            # Bt (xp, 128): the lane's 4-cell hit run placed at x0..x0+3
            d = c_iota - jnp.broadcast_to(x0[g:g + 1, :], (xp, 128))
            hs = jnp.zeros((xp, 128), jnp.float32)
            for j in range(XRUN):
                hjf = jnp.broadcast_to(
                    hits[j][g:g + 1, :].astype(jnp.float32), (xp, 128))
                hs = hs + jnp.where(d == j, hjf, 0.0)
            # contract over the lane axis (dim 1 of both — no relayout)
            upd = upd + jax.lax.dot_general(
                a, hs.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc_ref[0, pl.ds(row_base, RW), :] += upd

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("origin_key", "vs", "n_slabs", "rps_pad", "xp",
                     "n_y8"),
)
def _accum_call(slab_a, first_a, rowb_a, salt_a, lanes, tridata, *,
                origin_key, vs, n_slabs, rps_pad, xp, n_y8):
    n_groups = slab_a.shape[0]
    kernel = _make_kernel(origin_key, vs, rps_pad, xp, n_y8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, 32, 128), lambda i, s, fi, rb, sa: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, 8, 128),
                         lambda i, s, fi, rb, sa: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rps_pad, xp),
                         lambda i, s, fi, rb, sa: (s[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128),
                         lambda i, s, fi, rb, sa: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    acc, cnt = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_slabs, rps_pad, xp), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, 8, 128), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(slab_a, first_a, rowb_a, salt_a, lanes, tridata)
    return acc, cnt


class AccumPlan:
    """Host-precomputed lane binning for the slab-accumulation kernel.

    Built once per (mesh, grid) from concrete vertices; voxelize_accum
    then runs pure device code per call (the repeated-build /
    per-frame-render model).  See module docstring for the contract.
    """

    def __init__(self, vertices, faces, voxel_size, *, bb_min=None,
                 bb_max=None):
        from ..geometry import grid_dims, mesh_bbox
        from ..voxelize import _np_effective_extents

        v = np.asarray(vertices, np.float32).reshape(-1, 3)
        f = np.asarray(faces).reshape(-1, 3)
        if bb_min is None or bb_max is None:
            bb_min, bb_max = mesh_bbox(v)
        self.origin = np.asarray(bb_min, np.float32)
        self.voxel_size = float(voxel_size)
        self.dims = grid_dims(self.origin, np.asarray(bb_max, np.float32),
                              voxel_size)
        nx, ny, nz = self.dims
        self.n_slabs = max(1, -(-nz // SLABZ))
        self.xp = max(128, -(-nx // 128) * 128)
        # row space NY*8 padded so every bucket's 256-row window fits
        n_y8 = ny * SLABZ
        max_bucket = max(0, (ny - 1) // YB)
        self.rps_pad = max(RW, max_bucket * (YB * SLABZ) + RW)
        self.n_y8 = n_y8

        start, w = _np_effective_extents(v, f, self.origin, voxel_size,
                                         self.dims)
        # _np_effective_extents clamps w >= 1 (the scatter kernel
        # re-masks with the true window); here lanes enumerate cells
        # directly, so intersect with the true (possibly empty) window
        from ..voxelize import _np_windows
        s_t, e_t = _np_windows(v, f, self.origin, voxel_size, self.dims)
        w = np.minimum(w, np.maximum(e_t - s_t, 0))
        # fallback: windows taller than the 256-row window covers
        fb = w[:, 1] > YB  # wy > 16
        self.fallback_faces = f[fb]
        if fb.any():
            from ..voxelize import required_window_shape
            self._fb_tris = v[f[fb]]
            self._fb_window = required_window_shape(
                v, f[fb], self.origin, voxel_size, self.dims)
        keep = ~fb
        tri_idx = np.nonzero(keep)[0]
        s_, w_ = start[keep], w[keep]
        self._build_lanes(v, f, tri_idx, s_, w_)

    def _build_lanes(self, v, f, tri_idx, start, w):
        """Expand (tri, slab) assignments into sorted, grouped lanes."""
        nT = len(tri_idx)
        if nT == 0:
            self.meta = np.zeros((0, 4), np.int32)
            self.lanes = np.zeros((0, 32, 128), np.int32)
            self.tridata = np.zeros((0, 9, 8, 128), np.float32)
            self.n_groups = 0
            return
        sx, sy, sz = start[:, 0], start[:, 1], start[:, 2]
        wx, wy, wz = w[:, 0], w[:, 1], w[:, 2]
        s_lo = sz // SLABZ
        s_hi = (sz + np.maximum(wz, 1) - 1) // SLABZ
        # zero-volume windows (degenerate grids) contribute no lanes
        n_asn = np.where(wx * wy * wz > 0,
                         s_hi - s_lo + 1, 0).astype(np.int64)
        a_off = np.concatenate([[0], np.cumsum(n_asn)])
        A = int(a_off[-1])
        a_tri = np.repeat(np.arange(nT), n_asn)
        a_slab = (s_lo[a_tri]
                  + (np.arange(A) - a_off[:-1][a_tri])).astype(np.int64)
        # z range of assignment within its slab
        z0 = np.maximum(sz[a_tri], a_slab * SLABZ)
        z1 = np.minimum(sz[a_tri] + wz[a_tri], (a_slab + 1) * SLABZ)
        nzl = (z1 - z0).astype(np.int64)
        nxc = ((wx[a_tri] + XRUN - 1) // XRUN).astype(np.int64)
        nyl = wy[a_tri].astype(np.int64)
        a_lanes = nzl * nyl * nxc

        # sort assignments by (slab, ybucket, tri): tris stay contiguous
        # inside a bucket segment so per-group tri tables stay small
        yb = (sy[a_tri] // YB).astype(np.int64)
        order = np.lexsort((a_tri, yb, a_slab))
        a_tri, a_slab, z0, nzl, nyl, nxc, a_lanes, yb = (
            x[order] for x in (a_tri, a_slab, z0, nzl, nyl, nxc,
                               a_lanes, yb))

        # lane expansion (vectorized): lane -> (assignment, local index)
        l_off = np.concatenate([[0], np.cumsum(a_lanes)])
        L = int(l_off[-1])
        lane_a = np.searchsorted(l_off, np.arange(L), side="right") - 1
        li = np.arange(L) - l_off[lane_a]
        # local unravel: x-chunk fastest, then y, then z
        lx = li % nxc[lane_a]
        ly = (li // nxc[lane_a]) % nyl[lane_a]
        lz = li // (nxc[lane_a] * nyl[lane_a])
        l_tri = a_tri[lane_a]
        l_x0 = (sx[l_tri] + lx * XRUN).astype(np.int64)
        l_xend = (sx[l_tri] + wx[l_tri]).astype(np.int64)
        l_y = sy[l_tri] + ly
        l_z = z0[lane_a] + lz
        l_row = l_y * SLABZ + (l_z - a_slab[lane_a] * SLABZ)
        l_slab = a_slab[lane_a]
        l_yb = yb[lane_a]

        # group formation: chunk each (slab, ybucket) segment into
        # 1024-lane groups; per-group triangle tables re-index tris
        if L:
            seg_key = l_slab * (1 << 20) + l_yb
            seg_change = np.empty(L, bool)
            seg_change[0] = True
            seg_change[1:] = seg_key[1:] != seg_key[:-1]
            seg_start = np.nonzero(seg_change)[0]
            seg_end = np.append(seg_start[1:], L)
        else:
            seg_start = seg_end = np.zeros(0, np.int64)

        groups = []  # (lane_start, lane_end, slab, row_base)
        for s0, s1 in zip(seg_start, seg_end):
            for g0 in range(s0, s1, GROUP):
                groups.append((g0, min(g0 + GROUP, s1), int(l_slab[s0]),
                               int(l_yb[s0]) * (YB * SLABZ)))
        # every slab needs >= 1 group: an unvisited output block would
        # return uninitialized HBM — insert all-dead groups for empty
        # slabs (and keep the group list slab-sorted for the revisit
        # pipeline)
        present = {g[2] for g in groups}
        for s in range(self.n_slabs):
            if s not in present:
                groups.append((0, 0, s, 0))
        groups.sort(key=lambda g: g[2])
        nG = len(groups)
        meta = np.zeros((nG, 4), np.int32)
        lanes = np.zeros((nG, 4, GROUP), np.int32)
        lanes[:, 1, :] = 0            # x0
        lanes[:, 2, :] = 0            # xend = 0 -> dead lane
        tridata = np.zeros((nG, 9, TRIW), np.float32)
        tv = v[f[tri_idx]]            # (nT, 3, 3) — the kept tris
        tv9 = tv.reshape(nT, 9)
        prev_slab = -1
        for gi, (g0, g1, slab, row_base) in enumerate(groups):
            n = g1 - g0
            tris = l_tri[g0:g1]
            uniq, local = np.unique(tris, return_inverse=True)
            assert len(uniq) <= TRIW
            meta[gi] = (slab, 1 if slab != prev_slab else 0, row_base, 0)
            prev_slab = slab
            lanes[gi, 0, :n] = local
            lanes[gi, 1, :n] = l_x0[g0:g1]
            lanes[gi, 2, :n] = l_xend[g0:g1]
            lanes[gi, 3, :n] = l_row[g0:g1]
            tridata[gi, :, :len(uniq)] = tv9[uniq].T
        self.meta = meta
        # kernel layout: (nG, 32, 128) with rows 0-7 tri, 8-15 x0,
        # 16-23 xend, 24-31 row — each field reshaped (8, 128)
        self.lanes = lanes.reshape(nG, 4, 8, 128).reshape(nG, 32, 128)
        self.tridata = tridata.reshape(nG, 9, 8, 128)
        self.n_groups = nG
        self.n_lanes = L

    def device_arrays(self):
        if not hasattr(self, "_dev"):
            m = self.meta
            # 1-D scalar-prefetch arrays: a 2-D (nG, 4) SMEM operand is
            # lane-padded to (nG, 128) and blows the 1 MB SMEM budget
            self._dev = (jnp.asarray(np.ascontiguousarray(m[:, 0])),
                         jnp.asarray(np.ascontiguousarray(m[:, 1])),
                         jnp.asarray(np.ascontiguousarray(m[:, 2])),
                         jnp.asarray(self.lanes),
                         jnp.asarray(self.tridata))
        return self._dev


def build_accum_plan(vertices, faces, voxel_size, **kw) -> AccumPlan:
    return AccumPlan(vertices, faces, voxel_size, **kw)


@functools.partial(jax.jit, static_argnames=("dims", "n_y8"))
def _finalize(acc, cnts, *, dims, n_y8):
    nx, ny, nz = dims
    n_slabs = acc.shape[0]
    a = acc[:, :n_y8, :nx].reshape(n_slabs, ny, SLABZ, nx)
    occ = (a.transpose(0, 2, 1, 3).reshape(n_slabs * SLABZ, ny, nx)[:nz]
           > 0).astype(jnp.uint8)
    return occ, jnp.sum(cnts)


def voxelize_accum(plan: AccumPlan, salt=None):
    """Run the slab-accumulation voxelizer: (occ (Z,Y,X) uint8,
    set_calls int32).  Exact vs the scatter path (tests pin it).

    salt: optional int written into an unused meta field so repeated
    benchmark calls differ in input bytes (the axon runtime coalesces
    identical back-to-back dispatches, CLAUDE.md #9)."""
    nx, ny, nz = plan.dims
    if plan.n_groups == 0:
        occ = jnp.zeros((nz, ny, nx), jnp.uint8)
        calls = jnp.int32(0)
    else:
        slab_a, first_a, rowb_a, lanes, tridata = plan.device_arrays()
        salt_a = jnp.asarray([0 if salt is None else int(salt)],
                             jnp.int32)
        acc, cnts = _accum_call(
            slab_a, first_a, rowb_a, salt_a, lanes, tridata,
            origin_key=(float(plan.origin[0]), float(plan.origin[1]),
                        float(plan.origin[2])),
            vs=plan.voxel_size, n_slabs=plan.n_slabs,
            rps_pad=plan.rps_pad, xp=plan.xp, n_y8=plan.n_y8)
        occ, calls = _finalize(acc, cnts, dims=plan.dims, n_y8=plan.n_y8)
    if len(plan.fallback_faces):
        from ..voxelize import voxelize_dense
        # tall-window stragglers through the scatter path, OR-merged
        occ_fb, calls_fb = voxelize_dense(
            jnp.asarray(plan._fb_tris), jnp.asarray(plan.origin),
            dims=plan.dims, voxel_size_static=plan.voxel_size,
            window=plan._fb_window, chunk=256)
        occ = jnp.maximum(occ, occ_fb)
        calls = calls + calls_fb
    return occ, calls
