"""Pallas TPU kernel: brick-level DDA walk over a VMEM-resident bitmask.

This is the TPU-native replacement for the driver's TLAS traversal
(vkCmdTraceRaysKHR + AABB BLAS, hello_vulkan.cpp:1047).  Design notes:

  * The voxel grid is grouped into 8^3-cell bricks.  Brick occupancy for
    grids up to 512^3 is a <= 64^3 bitmask = <= 8192 uint32 words — small
    enough to keep in VMEM as a (ROWS, 128) word table.
  * XLA's gather on TPU measures ~0.1 G lookups/s — useless per-ray.  But
    Mosaic's tpu.dynamic_gather does intra-vreg lane shuffles at VPU rate,
    so a W-word table lookup becomes a static ROWS-way select over
    per-row lane-gathers ("mux-gather"), measured ~3.5 G lookups/s.
  * One lane = one ray; a block walks (BQ, 128) rays (image-tile coherent)
    until each has entered an occupied brick, left the grid, or passed its
    t_max.  Per-voxel resolution inside hit bricks happens outside the
    kernel (ops/traverse_fast.py) as a dense slab test — the kernel only
    finds candidate bricks.
  * The walk is resumable: output = (hit brick, post-hit walk state), so
    rays whose brick contained no accepted voxel continue next round.
  * TWO-LEVEL walk (round-2): for big grids the brick mux is wide (a
    512^3 grid is a 29..64-row table = 29..64 lane-gathers per step, the
    round-1 bottleneck).  An L2 bitmask over 8^3-brick SUPERBRICKS (<= 1
    row for grids to 1024^3) gives each lane a second speed: inside an
    empty superbrick it lands on the last brick the ray touches there
    and crosses the boundary with one exact DDA step (one iteration per
    superbrick instead of ~8 per-brick steps); inside occupied
    superbricks it is the plain single-level walk.  Both speeds live in
    ONE fused loop, predicated per lane.  The skip lands CONSERVATIVELY
    (floor clamped inside the current — empty — superbrick, then one
    exact integer DDA step crosses the boundary), so float slop can only
    waste a step, never skip an occupied brick: hit order stays
    bit-identical to the single-level walk.  (An earlier phase-
    alternating variant serialized block latency across phases and
    burned the shared step budget on ghost increments at unrolled phase
    switches, dropping ~4% of hits at 512^3 on chip — fused per-lane
    selection has neither failure mode.)

The kernel carries only (cell, active) per ray: crossing times are
recomputed from the ray each step (3 fma + compares — cheaper than
carrying 3 extra f32 vregs through the resumable state).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["coarse_walk", "coarse_walk_init", "mux_lookup", "LANES"]

LANES = 128
UNROLL = 16
_INF = np.float32(np.inf)  # numpy scalar: stays a literal inside kernels


def hoist_rows(table_ref, bq):
    """Pre-broadcast table rows out of the walk loop.

    In-loop (1,128)->(BQ,128) broadcasts are a suspected slow lowering;
    hoisting is bounded to 8 rows (larger tables keep in-loop broadcast
    and should move to a words-as-input layout instead).
    """
    rows = table_ref.shape[0]
    if rows * max(1, bq // 8) > 256:
        return None
    return [jnp.broadcast_to(table_ref[r:r + 1, :], (bq, LANES))
            for r in range(rows)]


def mux_lookup(table_ref, word_idx, bq, hoisted=None):
    """table[word_idx] via a static mux over per-row lane-gathers.

    word_idx: (BQ, 128) int32 in [0, ROWS*128).  When `hoisted` row tiles
    are provided (loop-invariant broadcasts), they are used directly.
    """
    rows = table_ref.shape[0]
    row = (word_idx >> 7).astype(jnp.int32)
    col = (word_idx & 127).astype(jnp.int32)
    out = jnp.zeros(word_idx.shape, jnp.uint32)
    for r in range(rows):
        tr = (hoisted[r] if hoisted is not None else
              jnp.broadcast_to(table_ref[r:r + 1, :], (bq, LANES)))
        val = jnp.take_along_axis(tr, col, axis=1)
        out = jnp.where(row == r, val, out)
    return out


def _fused_init(ox, oy, oz, dx, dy, dz, tmin, tmax, bdims, origin, bw):
    """The _init_state bbox clip + entry-cell seed, in-kernel.

    Exact traverse_fast._init_state expression shapes (the t_min
    fast-forward included), so round 1 with fused init walks from the
    same cell the XLA init stage would produce.  Fusing it removes the
    separate init program plus the 4 full-width state arrays it
    materialized as walk inputs.
    """
    bx, by, bz = bdims
    ogx, ogy, ogz = (np.float32(origin[0]), np.float32(origin[1]),
                     np.float32(origin[2]))
    gmx = np.float32(ogx + np.float32(bx) * bw)
    gmy = np.float32(ogy + np.float32(by) * bw)
    gmz = np.float32(ogz + np.float32(bz) * bw)
    inv_x, inv_y, inv_z = 1.0 / dx, 1.0 / dy, 1.0 / dz
    tbx, tby, tbz = inv_x * (ogx - ox), inv_y * (ogy - oy), \
        inv_z * (ogz - oz)
    ttx, tty, ttz = inv_x * (gmx - ox), inv_y * (gmy - oy), \
        inv_z * (gmz - oz)
    tnx, tny, tnz = (jnp.minimum(tbx, ttx), jnp.minimum(tby, tty),
                     jnp.minimum(tbz, ttz))
    tfx, tfy, tfz = (jnp.maximum(tbx, ttx), jnp.maximum(tby, tty),
                     jnp.maximum(tbz, ttz))
    t_enter = jnp.maximum(jnp.maximum(tnx, tny), tnz)
    t_exit = jnp.minimum(jnp.minimum(tfx, tfy), tfz)
    lo = jnp.maximum(jnp.maximum(t_enter, 0.0), tmin)
    t_start = lo + np.float32(1e-7)
    ok = ((t_exit > jnp.maximum(t_enter, 0.0)) & (t_start <= tmax)
          & (t_start <= t_exit + np.float32(1e-7)))
    px = ox + dx * t_start
    py = oy + dy * t_start
    pz = oz + dz * t_start
    cx = jnp.clip(jnp.floor((px - ogx) / bw).astype(jnp.int32), 0, bx - 1)
    cy = jnp.clip(jnp.floor((py - ogy) / bw).astype(jnp.int32), 0, by - 1)
    cz = jnp.clip(jnp.floor((pz - ogz) / bw).astype(jnp.int32), 0, bz - 1)
    return cx, cy, cz, ok


def _make_kernel(bdims, origin, brick_world, max_steps, bq, k_hits,
                 fused_init=False):
    bx, by, bz = bdims
    ogx, ogy, ogz = (np.float32(origin[0]), np.float32(origin[1]),
                     np.float32(origin[2]))
    bw = np.float32(brick_world)

    def kernel(*refs):
        if fused_init:
            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref,
             tmax_ref, table_ref, hit_ref, ocx_ref, ocy_ref, ocz_ref,
             ocont_ref) = refs
        else:
            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, cx_ref,
             cy_ref, cz_ref, act_ref, tmax_ref, table_ref, hit_ref,
             ocx_ref, ocy_ref, ocz_ref, ocont_ref) = refs
        # loop-invariant broadcast of the brick-bitmask rows (small tables)
        rows_bc = hoist_rows(table_ref, bq)
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        tmax = tmax_ref[:]
        inv_x = 1.0 / dx
        inv_y = 1.0 / dy
        inv_z = 1.0 / dz
        sx = jnp.where(dx >= 0, 1, -1).astype(jnp.int32)
        sy = jnp.where(dy >= 0, 1, -1).astype(jnp.int32)
        sz = jnp.where(dz >= 0, 1, -1).astype(jnp.int32)
        # index offset of the exit plane along each axis (0 if d < 0)
        fx = (sx > 0).astype(jnp.int32)
        fy = (sy > 0).astype(jnp.int32)
        fz = (sz > 0).astype(jnp.int32)

        def next_t(cx, cy, cz):
            """t of the next brick-boundary crossing per axis."""
            tx = (ogx + (cx + fx).astype(jnp.float32) * bw - ox) * inv_x
            ty = (ogy + (cy + fy).astype(jnp.float32) * bw - oy) * inv_y
            tz = (ogz + (cz + fz).astype(jnp.float32) * bw - oz) * inv_z
            tx = jnp.where(dx == 0.0, _INF, tx)
            ty = jnp.where(dy == 0.0, _INF, ty)
            tz = jnp.where(dz == 0.0, _INF, tz)
            return tx, ty, tz

        def body(state):
            # active carried as int32: Mosaic cannot carry i1 vectors
            # through scf.while
            cx, cy, cz, active_i, hits, nhit, step = state
            active = active_i != 0
            lin = cx + bx * (cy + by * cz)
            word = mux_lookup(table_ref, lin >> 5, bq, rows_bc)
            occ = ((word >> (lin & 31).astype(jnp.uint32)) & 1) > 0
            hit_now = active & occ
            # record into the first free hit slot (branchless)
            hits = tuple(
                jnp.where(hit_now & (nhit == s), lin, hits[s])
                for s in range(k_hits)
            )
            nhit = nhit + hit_now.astype(jnp.int32)
            full = nhit >= k_hits
            # active lanes step; the lane that just filled its last slot
            # steps once more so its stored cell is the resume position
            tx, ty, tz = next_t(cx, cy, cz)
            tmin = jnp.minimum(tx, jnp.minimum(ty, tz))
            stepx = active & (tx == tmin)
            stepy = active & (~stepx) & (ty == tmin)
            stepz = active & ~(stepx | stepy)
            cx = cx + jnp.where(stepx, sx, 0)
            cy = cy + jnp.where(stepy, sy, 0)
            cz = cz + jnp.where(stepz, sz, 0)
            inb = ((cx >= 0) & (cx < bx) & (cy >= 0) & (cy < by)
                   & (cz >= 0) & (cz < bz))
            active = active & ~full & inb & (tmin <= tmax)
            return (cx, cy, cz, active.astype(jnp.int32), hits, nhit,
                    step + 1)

        # UNROLL vector-only steps per scalar loop check on TPU: the while
        # cond's any()-reduce + branch costs ~10-20us of scalar latency per
        # iteration, which dominates the walk.  Interpret mode (CPU tests)
        # keeps UNROLL=1 — unrolling only multiplies python overhead there.
        unroll = UNROLL if jax.default_backend() == "tpu" else 1

        def body_unrolled(state):
            for _ in range(unroll):
                state = body(state)
            return state

        def cond(state):
            return jnp.logical_and(state[6] < max_steps,
                                   jnp.any(state[3] != 0))

        if fused_init:
            icx, icy, icz, iok = _fused_init(
                ox, oy, oz, dx, dy, dz, tmin_ref[:], tmax,
                bdims, origin, bw)
            init = (icx, icy, icz, iok.astype(jnp.int32),
                    tuple(jnp.full((bq, LANES), -1, jnp.int32)
                          for _ in range(k_hits)),
                    jnp.zeros((bq, LANES), jnp.int32), jnp.int32(0))
        else:
            init = (cx_ref[:], cy_ref[:], cz_ref[:],
                    (act_ref[:] != 0).astype(jnp.int32),
                    tuple(jnp.full((bq, LANES), -1, jnp.int32)
                          for _ in range(k_hits)),
                    jnp.zeros((bq, LANES), jnp.int32), jnp.int32(0))
        cx, cy, cz, active_i, hits, nhit, _ = jax.lax.while_loop(
            cond, body_unrolled, init)
        for s in range(k_hits):
            hit_ref[s] = hits[s]
        ocx_ref[:] = cx
        ocy_ref[:] = cy
        ocz_ref[:] = cz
        # a lane can continue walking next round iff it is still in bounds
        # with budget left: lanes that filled their slots and stepped to a
        # valid cell, or (defensively) hit the step cap while active
        inb = ((cx >= 0) & (cx < bx) & (cy >= 0) & (cy < by)
               & (cz >= 0) & (cz < bz))
        ocont_ref[:] = (inb & ((active_i != 0) | (nhit >= k_hits))) \
            .astype(jnp.int32)

    return kernel


def _make_kernel_2l(bdims, origin, brick_world, max_steps, bq, k_hits,
                    fused_init=False):
    """Two-level walk: per-lane two-speed DDA (fused, no phases).

    Each iteration, every active lane takes ONE step sized by where it
    is: inside an EMPTY superbrick (L2 bit clear) it lands on the last
    brick the ray touches in that superbrick and crosses the boundary
    with one exact DDA step; inside an occupied superbrick it behaves
    exactly like the single-level walk (L1 mux, hit recording, one brick
    step).  Compared with the round-2 phase-alternating design this
    removes two pathologies measured on chip: idle lanes waiting out the
    other phase's while loop (block latency = SUM of phase times), and
    ghost step-counter increments at every unrolled phase switch that
    exhausted the step budget early and DROPPED hits (~4% at 512^3).
    One fused loop has one counter that counts real per-lane progress
    (>= 1 brick per iteration), so the single-level step cap is valid
    unchanged.

    Hit order is bit-identical to the single-level walk: a skip only
    jumps bricks inside a superbrick whose L2 bit is clear, and every
    brick in such a superbrick is empty by construction; the landing is
    clamped INTO the current superbrick so float slop can only
    under-shoot (wasting a step, never skipping an occupied brick).
    """
    bx, by, bz = bdims
    sbx, sby, sbz = -(-bx // 8), -(-by // 8), -(-bz // 8)
    ogx, ogy, ogz = (np.float32(origin[0]), np.float32(origin[1]),
                     np.float32(origin[2]))
    bw = np.float32(brick_world)

    def kernel(*refs):
        if fused_init:
            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref,
             tmax_ref, table_ref, l2_ref, hit_ref, ocx_ref, ocy_ref,
             ocz_ref, ocont_ref) = refs
        else:
            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, cx_ref,
             cy_ref, cz_ref, act_ref, tmax_ref, table_ref, l2_ref,
             hit_ref, ocx_ref, ocy_ref, ocz_ref, ocont_ref) = refs
        rows_bc = hoist_rows(table_ref, bq)
        l2_bc = hoist_rows(l2_ref, bq)
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        tmax = tmax_ref[:]
        inv_x = 1.0 / dx
        inv_y = 1.0 / dy
        inv_z = 1.0 / dz
        sx = jnp.where(dx >= 0, 1, -1).astype(jnp.int32)
        sy = jnp.where(dy >= 0, 1, -1).astype(jnp.int32)
        sz = jnp.where(dz >= 0, 1, -1).astype(jnp.int32)
        fx = (sx > 0).astype(jnp.int32)
        fy = (sy > 0).astype(jnp.int32)
        fz = (sz > 0).astype(jnp.int32)

        def l2_occ(cx, cy, cz):
            """Occupancy of the superbrick containing brick (cx,cy,cz).
            OOB coords produce no row match -> 0 (safe)."""
            lin = (cx >> 3) + sbx * ((cy >> 3) + sby * (cz >> 3))
            word = mux_lookup(l2_ref, lin >> 5, bq, l2_bc)
            return ((word >> (lin & 31).astype(jnp.uint32)) & 1) > 0

        def body(state):
            cx, cy, cz, active_i, hits, nhit, step = state
            active = active_i != 0
            # two-speed select: lanes in an empty superbrick first jump
            # to the LAST brick the ray touches inside it (clamped floor
            # of the superbrick exit point — conservative under float
            # slop), then everyone takes one exact brick DDA step
            skip = active & ~l2_occ(cx, cy, cz)
            scx, scy, scz = cx >> 3, cy >> 3, cz >> 3
            tsx = (ogx + ((scx + fx) * 8).astype(jnp.float32) * bw - ox) \
                * inv_x
            tsy = (ogy + ((scy + fy) * 8).astype(jnp.float32) * bw - oy) \
                * inv_y
            tsz = (ogz + ((scz + fz) * 8).astype(jnp.float32) * bw - oz) \
                * inv_z
            tsx = jnp.where(dx == 0.0, _INF, tsx)
            tsy = jnp.where(dy == 0.0, _INF, tsy)
            tsz = jnp.where(dz == 0.0, _INF, tsz)
            t_ex = jnp.minimum(tsx, jnp.minimum(tsy, tsz))
            # UNDERSHOOT-biased landing: floor() of the exit point can
            # round one brick PAST the DDA's true path (compiled-mode FMA
            # contraction differs from the stepped crossings — measured
            # on chip: 2 of 210k rays missed their hit).  Landing one
            # brick short per axis (relative to the ray direction) keeps
            # the lane at-or-behind the true path; behind-lanes
            # self-correct because their stale plane crossings sort
            # first in the DDA min.  Overshot lanes never correct —
            # hence the bias, not a symmetric clamp.
            lbx = jnp.floor((ox + dx * t_ex - ogx) / bw).astype(jnp.int32)
            lby = jnp.floor((oy + dy * t_ex - ogy) / bw).astype(jnp.int32)
            lbz = jnp.floor((oz + dz * t_ex - ogz) / bw).astype(jnp.int32)
            lx = jnp.clip(lbx - sx, scx * 8, scx * 8 + 7)
            ly = jnp.clip(lby - sy, scy * 8, scy * 8 + 7)
            lz = jnp.clip(lbz - sz, scz * 8, scz * 8 + 7)
            # ...but never BACKWARD of the lane's current brick: the
            # landing is position-independent, so a lane already at the
            # superbrick's far edge would be pulled back one brick and
            # ping-pong until the step budget dies (measured on chip:
            # 78% of hits lost).  Forward-max keeps progress monotone;
            # the subsequent exact step then crosses the boundary.
            lx = jnp.where(sx > 0, jnp.maximum(lx, cx), jnp.minimum(lx, cx))
            ly = jnp.where(sy > 0, jnp.maximum(ly, cy), jnp.minimum(ly, cy))
            lz = jnp.where(sz > 0, jnp.maximum(lz, cz), jnp.minimum(lz, cz))
            # and/or-mask select: jnp.where on i1-derived int vectors is
            # fine, but keep coords int32 selects (Mosaic-safe)
            cx = jnp.where(skip, lx, cx)
            cy = jnp.where(skip, ly, cy)
            cz = jnp.where(skip, lz, cz)

            # occupancy + hit recording (skip lanes sit on an empty
            # brick by construction — occ is false there)
            lin = cx + bx * (cy + by * cz)
            word = mux_lookup(table_ref, lin >> 5, bq, rows_bc)
            occ = ((word >> (lin & 31).astype(jnp.uint32)) & 1) > 0
            hit_now = active & occ
            hits = tuple(
                jnp.where(hit_now & (nhit == s), lin, hits[s])
                for s in range(k_hits)
            )
            nhit = nhit + hit_now.astype(jnp.int32)
            full = nhit >= k_hits

            # one exact brick DDA step for every active lane
            tx = (ogx + (cx + fx).astype(jnp.float32) * bw - ox) * inv_x
            ty = (ogy + (cy + fy).astype(jnp.float32) * bw - oy) * inv_y
            tz = (ogz + (cz + fz).astype(jnp.float32) * bw - oz) * inv_z
            tx = jnp.where(dx == 0.0, _INF, tx)
            ty = jnp.where(dy == 0.0, _INF, ty)
            tz = jnp.where(dz == 0.0, _INF, tz)
            tmin = jnp.minimum(tx, jnp.minimum(ty, tz))
            stepx = active & (tx == tmin)
            stepy = active & (~stepx) & (ty == tmin)
            stepz = active & ~(stepx | stepy)
            cx = cx + jnp.where(stepx, sx, 0)
            cy = cy + jnp.where(stepy, sy, 0)
            cz = cz + jnp.where(stepz, sz, 0)
            inb = ((cx >= 0) & (cx < bx) & (cy >= 0) & (cy < by)
                   & (cz >= 0) & (cz < bz))
            active = active & ~full & inb & (tmin <= tmax)
            return (cx, cy, cz, active.astype(jnp.int32), hits, nhit,
                    step + 1)

        unroll = UNROLL if jax.default_backend() == "tpu" else 1

        def body_unrolled(state):
            for _ in range(unroll):
                state = body(state)
            return state

        def cond(state):
            return jnp.logical_and(state[6] < max_steps,
                                   jnp.any(state[3] != 0))

        if fused_init:
            icx, icy, icz, iok = _fused_init(
                ox, oy, oz, dx, dy, dz, tmin_ref[:], tmax,
                bdims, origin, bw)
            init = (icx, icy, icz, iok.astype(jnp.int32),
                    tuple(jnp.full((bq, LANES), -1, jnp.int32)
                          for _ in range(k_hits)),
                    jnp.zeros((bq, LANES), jnp.int32), jnp.int32(0))
        else:
            init = (cx_ref[:], cy_ref[:], cz_ref[:],
                    (act_ref[:] != 0).astype(jnp.int32),
                    tuple(jnp.full((bq, LANES), -1, jnp.int32)
                          for _ in range(k_hits)),
                    jnp.zeros((bq, LANES), jnp.int32), jnp.int32(0))
        cx, cy, cz, active_i, hits, nhit, _ = jax.lax.while_loop(
            cond, body_unrolled, init)
        for s in range(k_hits):
            hit_ref[s] = hits[s]
        ocx_ref[:] = cx
        ocy_ref[:] = cy
        ocz_ref[:] = cz
        inb = ((cx >= 0) & (cx < bx) & (cy >= 0) & (cy < by)
               & (cz >= 0) & (cz < bz))
        ocont_ref[:] = (inb & ((active_i != 0) | (nhit >= k_hits))) \
            .astype(jnp.int32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("bdims", "origin_key", "brick_world", "bq", "k_hits"),
)
def coarse_walk(ox, oy, oz, dx, dy, dz, cx, cy, cz, active, tmax, table,
                l2=None, *, bdims, origin_key, brick_world, bq=64,
                k_hits=1):
    """Walk all rays to their next k_hits occupied bricks.

    All ray/state arrays are (N,) and get padded/reshaped to (blocks, BQ,
    128) internally.  `table` is the (ROWS, 128) uint32 brick bitmask.
    origin_key: the grid origin as a hashable (x, y, z) float tuple
    (static — baked into the kernel).

    Returns (hit_brick_lin int32 (k_hits, N) [-1 = none, in ray order],
    next_cx, next_cy, next_cz, can_continue int32).
    """
    n = ox.shape[0]
    per_block = bq * LANES
    n_blocks = max(1, -(-n // per_block))
    pad = n_blocks * per_block - n

    def prep(x, fill=0):
        x = jnp.pad(x, (0, pad), constant_values=fill)
        return x.reshape(n_blocks * bq, LANES)

    bx, by, bz = bdims
    max_steps = bx + by + bz + 3
    if l2 is None:
        kernel = _make_kernel(bdims, origin_key, brick_world, max_steps,
                              bq, k_hits)
    else:
        kernel = _make_kernel_2l(bdims, origin_key, brick_world,
                                 max_steps, bq, k_hits)

    out_shapes = [
        jax.ShapeDtypeStruct((k_hits, n_blocks * bq, LANES), jnp.int32),
    ] + [jax.ShapeDtypeStruct((n_blocks * bq, LANES), jnp.int32)
         for _ in range(4)]

    table_specs = [pl.BlockSpec(table.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)]
    operands = [prep(ox), prep(oy), prep(oz),
                prep(dx, 1.0), prep(dy, 1.0), prep(dz, 1.0),
                prep(cx), prep(cy), prep(cz), prep(active), prep(tmax),
                table]
    if l2 is not None:
        table_specs.append(pl.BlockSpec(l2.shape, lambda i: (0, 0),
                                        memory_space=pltpu.VMEM))
        operands.append(l2)

    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((bq, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 11
        + table_specs,
        out_specs=[pl.BlockSpec((k_hits, bq, LANES), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((bq, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)] * 4,
    )

    hit, ncx, ncy, ncz, cont = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=jax.default_backend() != "tpu",
    )(*operands)

    unpad = lambda x: x.reshape(-1)[:n]
    hitk = hit.reshape(k_hits, -1)[:, :n]
    return (hitk, unpad(ncx), unpad(ncy), unpad(ncz), unpad(cont))


@functools.partial(
    jax.jit,
    static_argnames=("bdims", "origin_key", "brick_world", "bq", "k_hits"),
)
def coarse_walk_init(ox, oy, oz, dx, dy, dz, tmin, tmax, table,
                     l2=None, *, bdims, origin_key, brick_world, bq=64,
                     k_hits=1):
    """coarse_walk with the grid-entry init fused in-kernel.

    Round-1 form for full-width traces: instead of a separate XLA init
    stage materializing (cx, cy, cz, active) for the walk to re-read,
    the kernel computes the bbox clip + entry cell from the rays
    directly (exact _init_state expression shapes).  Removes one
    program and 4 full-width state arrays from the frame.  Returns the
    same (hits, ncx, ncy, ncz, cont) contract.
    """
    n = ox.shape[0]
    per_block = bq * LANES
    n_blocks = max(1, -(-n // per_block))
    pad = n_blocks * per_block - n

    def prep(x, fill=0):
        x = jnp.pad(x, (0, pad), constant_values=fill)
        return x.reshape(n_blocks * bq, LANES)

    bx, by, bz = bdims
    max_steps = bx + by + bz + 3
    if l2 is None:
        kernel = _make_kernel(bdims, origin_key, brick_world, max_steps,
                              bq, k_hits, fused_init=True)
    else:
        kernel = _make_kernel_2l(bdims, origin_key, brick_world,
                                 max_steps, bq, k_hits, fused_init=True)

    out_shapes = [
        jax.ShapeDtypeStruct((k_hits, n_blocks * bq, LANES), jnp.int32),
    ] + [jax.ShapeDtypeStruct((n_blocks * bq, LANES), jnp.int32)
         for _ in range(4)]

    table_specs = [pl.BlockSpec(table.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)]
    operands = [prep(ox), prep(oy), prep(oz),
                prep(dx, 1.0), prep(dy, 1.0), prep(dz, 1.0),
                prep(tmin), prep(tmax),
                table]
    if l2 is not None:
        table_specs.append(pl.BlockSpec(l2.shape, lambda i: (0, 0),
                                        memory_space=pltpu.VMEM))
        operands.append(l2)

    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((bq, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 8
        + table_specs,
        out_specs=[pl.BlockSpec((k_hits, bq, LANES), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((bq, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)] * 4,
    )

    hit, ncx, ncy, ncz, cont = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=jax.default_backend() != "tpu",
    )(*operands)

    unpad = lambda x: x.reshape(-1)[:n]
    hitk = hit.reshape(k_hits, -1)[:, :n]
    return (hitk, unpad(ncx), unpad(ncy), unpad(ncz), unpad(cont))
