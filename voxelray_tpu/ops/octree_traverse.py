"""Stackless octree ray traversal.

The reference never traverses its octree on the GPU (it flattens leaves to
AABBs and lets the driver's TLAS do the work, octTree.hpp:502-510 +
hello_vulkan.cpp:690-697 commented path).  Here the octree is traversed
directly — the capability its encoding exists for:

  repeat (bounded):
    descend from the root to the deepest node containing the current
    point (child links via gather); an empty octant (INVALID child,
    octTree.hpp:271) yields its box as free space
    if the region is an occupied leaf: slab-test its <= max_items Morton
    items (decoded with the reference float math) and accept the nearest
    if none accepted (or region empty): advance the ray to the region's
    exit plane and continue

No stack, no recursion (the reference build needs a 512 MiB stack for its
recursion, octTree.hpp:130-134; traversal here is O(depth) per step with
pure iteration).  Descent uses the Morton bit structure: the octant of a
cell at level L is bit-sliced from its (x, y, z), exactly the digit order
buildNodeRecursive splits on (octTree.hpp:337-345).

This is the semantic/capability path; the production-speed path on TPU is
the brick accel (ops/traverse_fast.py), which is the same idea fixed at
two levels with VMEM-resident tables.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .intersect import TMAX, TMIN

__all__ = ["trace_octree", "any_hit_octree"]


@functools.partial(
    jax.jit,
    static_argnames=("bits", "dims", "voxel_size", "origin_key",
                     "max_items", "max_outer"),
)
def _trace_octree_impl(o, d, children, node_start, node_count, item_x,
                       item_y, item_z, t_min, t_max, *, bits, dims,
                       voxel_size, origin_key, max_items, max_outer):
    nx, ny, nz = dims
    vs = jnp.float32(voxel_size)
    half = jnp.float32(0.5) * vs
    og = jnp.asarray(origin_key, jnp.float32)
    n = o.shape[0]
    side = 1 << bits  # conceptual grid cells per axis (octTree.hpp:592)

    grid_max = og + jnp.float32(side) * vs
    inv = 1.0 / d
    tbot = inv * (og - o)
    ttop = inv * (grid_max - o)
    tn_ = jnp.minimum(tbot, ttop)
    tf_ = jnp.maximum(tbot, ttop)
    t_enter = jnp.maximum(jnp.maximum(tn_[:, 0], tn_[:, 1]), tn_[:, 2])
    t_exit = jnp.minimum(jnp.minimum(tf_[:, 0], tf_[:, 1]), tf_[:, 2])
    t_cur = jnp.maximum(t_enter, 0.0) + 1e-6
    alive = (t_exit > jnp.maximum(t_enter, 0.0)) & (t_cur <= t_max)

    def cell_slab_t(cx, cy, cz):
        """Reference slab t0 of the cell AABB (raytrace.rint:46-56)."""
        ccx = og[0] + (cx.astype(jnp.float32) + 0.5) * vs
        ccy = og[1] + (cy.astype(jnp.float32) + 0.5) * vs
        ccz = og[2] + (cz.astype(jnp.float32) + 0.5) * vs
        t0 = jnp.full(cx.shape, -jnp.inf, jnp.float32)
        t1 = jnp.full(cx.shape, jnp.inf, jnp.float32)
        for cc, oo, ii in ((ccx, o[:, 0:1], inv[:, 0:1]),
                           (ccy, o[:, 1:2], inv[:, 1:2]),
                           (ccz, o[:, 2:3], inv[:, 2:3])):
            tb = ii * ((cc - half) - oo)
            tt = ii * ((cc + half) - oo)
            t0 = jnp.maximum(t0, jnp.minimum(tb, tt))
            t1 = jnp.minimum(t1, jnp.maximum(tb, tt))
        return t0, t1

    def outer_body(state):
        t_cur, alive, best_t, best_lin, it = state
        p = o + d * t_cur[:, None]
        cell = jnp.floor((p - og) / vs).astype(jnp.int32)
        cell = jnp.clip(cell, 0, side - 1)
        cx, cy, cz = cell[:, 0], cell[:, 1], cell[:, 2]

        # descend: find deepest node containing the cell; record the
        # level at which we stopped (empty octant or leaf)
        def descend(level, carry):
            node, stop_level, is_leaf = carry
            shift = bits - 1 - level
            octant = (((cx >> shift) & 1)
                      | (((cy >> shift) & 1) << 1)
                      | (((cz >> shift) & 1) << 2))
            child = children[jnp.maximum(node, 0), octant]
            descending = (stop_level < 0)
            # empty octant -> free region: the octant is one level BELOW
            # the node we were at (depth level+1)
            hit_empty = descending & (child < 0)
            stop_level = jnp.where(hit_empty, level + 1, stop_level)
            node = jnp.where(descending & (child >= 0), child, node)
            # if the new node is a leaf (no children at all), stop below it
            leaf = node_leaf[jnp.maximum(node, 0)]
            hit_leaf = descending & (child >= 0) & leaf
            stop_level = jnp.where(hit_leaf, level + 1, stop_level)
            is_leaf = is_leaf | hit_leaf
            return node, stop_level, is_leaf

        node0 = jnp.zeros(n, jnp.int32)
        stop0 = jnp.full(n, -1, jnp.int32)
        # root with no children at all (tiny trees): it is itself a leaf
        root_leaf = node_leaf[0]
        stop0 = jnp.where(root_leaf, 0, stop0)
        leaf0 = jnp.broadcast_to(root_leaf, (n,))
        node, stop_level, is_leaf = jax.lax.fori_loop(
            0, bits, descend, (node0, stop0, leaf0))
        stop_level = jnp.where(stop_level < 0, bits, stop_level)

        # region box: the octant cube at stop_level containing the cell
        # (cells per side at that level = side >> stop_level)
        region_cells = (side >> jnp.minimum(stop_level, bits)).astype(
            jnp.int32)
        region_cells = jnp.maximum(region_cells, 1)
        rx = (cx // region_cells) * region_cells
        ry = (cy // region_cells) * region_cells
        rz = (cz // region_cells) * region_cells
        rminx = og[0] + rx.astype(jnp.float32) * vs
        rminy = og[1] + ry.astype(jnp.float32) * vs
        rminz = og[2] + rz.astype(jnp.float32) * vs
        ext = region_cells.astype(jnp.float32) * vs
        tx = jnp.where(d[:, 0] != 0,
                       jnp.maximum((rminx - o[:, 0]) * inv[:, 0],
                                   (rminx + ext - o[:, 0]) * inv[:, 0]),
                       jnp.inf)
        ty = jnp.where(d[:, 1] != 0,
                       jnp.maximum((rminy - o[:, 1]) * inv[:, 1],
                                   (rminy + ext - o[:, 1]) * inv[:, 1]),
                       jnp.inf)
        tz = jnp.where(d[:, 2] != 0,
                       jnp.maximum((rminz - o[:, 2]) * inv[:, 2],
                                   (rminz + ext - o[:, 2]) * inv[:, 2]),
                       jnp.inf)
        t_region_exit = jnp.minimum(tx, jnp.minimum(ty, tz))

        # occupied leaf: test its items
        start = node_start[jnp.maximum(node, 0)]
        count = node_count[jnp.maximum(node, 0)]
        ks = jnp.arange(max_items, dtype=jnp.int32)
        idx = jnp.clip(start[:, None] + ks[None, :], 0,
                       item_x.shape[0] - 1)
        vx = item_x[idx]
        vy = item_y[idx]
        vz = item_z[idx]
        t0, t1 = cell_slab_t(vx, vy, vz)
        valid = (ks[None, :] < count[:, None]) & is_leaf[:, None] \
            & alive[:, None]
        accept = valid & (t1 > jnp.maximum(t0, 0.0)) & (t0 > 0.0) \
            & (t0 >= t_min) & (t0 <= t_max[:, None])
        t0m = jnp.where(accept, t0, jnp.inf)
        arg = jnp.argmin(t0m, axis=1)
        tb = jnp.take_along_axis(t0m, arg[:, None], axis=1)[:, 0]
        lx = jnp.take_along_axis(vx, arg[:, None], axis=1)[:, 0]
        ly = jnp.take_along_axis(vy, arg[:, None], axis=1)[:, 0]
        lz = jnp.take_along_axis(vz, arg[:, None], axis=1)[:, 0]
        got = jnp.isfinite(tb) & alive
        best_t = jnp.where(got, tb, best_t)
        best_lin = jnp.where(
            got, lx.astype(jnp.int32) + nx * (ly.astype(jnp.int32)
                                              + ny * lz.astype(jnp.int32)),
            best_lin)

        # advance past the region
        t_cur = jnp.maximum(t_region_exit, t_cur) + 1e-6
        alive = alive & ~got & (t_cur < t_exit) & (t_cur <= t_max)
        return t_cur, alive, best_t, best_lin, it + 1

    def outer_cond(state):
        _, alive, _, _, it = state
        return jnp.logical_and(it < max_outer, jnp.any(alive))

    node_leaf = (children < 0).all(axis=1)
    init = (t_cur, alive, jnp.full(n, jnp.inf, jnp.float32),
            jnp.full(n, -1, jnp.int32), jnp.int32(0))
    _, _, best_t, best_lin, _ = jax.lax.while_loop(outer_cond, outer_body,
                                                   init)
    return best_t, best_lin


def trace_octree(origins, dirs, tree, t_min=TMIN, t_max=TMAX,
                 max_outer=512):
    """Nearest voxel hit via octree walk: (t, cell_lin), -1/inf on miss.

    tree: models.octree.Octree.  Hit cells are reported as linear indices
    in the tree's voxel dims (x + nx*(y + ny*z)) like the grid backends.
    """
    batch_shape = origins.shape[:-1]
    o = origins.reshape(-1, 3).astype(jnp.float32)
    d = dirs.reshape(-1, 3).astype(jnp.float32)
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                               batch_shape).reshape(-1)
    if tree.n_items == 0 or tree.bits_per_axis == 0:
        return (jnp.full(batch_shape, jnp.inf, jnp.float32),
                jnp.full(batch_shape, -1, jnp.int32))

    t, lin = _trace_octree_impl(
        o, d, tree.children, tree.node_start, tree.node_count,
        tree.item_x, tree.item_y, tree.item_z,
        jnp.float32(t_min), t_max_b,
        bits=tree.bits_per_axis, dims=tree.dims,
        voxel_size=tree.voxel_size,
        origin_key=tree.origin_key,
        max_items=int(tree.max_items), max_outer=max_outer)
    return t.reshape(batch_shape), lin.reshape(batch_shape)


def any_hit_octree(origins, dirs, tree, t_min=TMIN, t_max=TMAX):
    t, _ = trace_octree(origins, dirs, tree, t_min=t_min, t_max=t_max)
    return jnp.isfinite(t)
