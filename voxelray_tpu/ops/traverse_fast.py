"""Accelerated grid traversal: Pallas brick walk + dense fine resolve.

Pipeline per ray batch (trace_grid_fast):

  1. init: clip rays to the grid bounds, seed the brick-level DDA state
  2. rounds (static python loop under jit): Pallas coarse_walk finds each
     ray's next K=4 occupied 8^3 bricks (VMEM mux-gather DDA), then the
     Pallas in-brick DDA (brick_fine.fine_walk) resolves each candidate
     brick in ray order using the reference float expressions
     (raytrace.rint:46-56 + report/interval rules).  Straggler rays are
     cumsum-compacted into n/4 then n/16 buffers for later rounds.  A
     dense 512-cell resolve (fine="dense") remains as the semantic
     reference implementation.
  3. output (t, cell_lin) — the same contract (and bit-parity class) as
     ops.traverse.trace_grid_dda.

The accel structure (BrickAccel) is precomputed once per grid: pad dims to
multiples of 8, brick-occupancy words in the (ROWS, 128) layout the kernel
muxes over, and per-brick packed fine words stored word-major (16, NB) so
the fine-stage gather is one compact take(axis=1).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .intersect import TMAX, TMIN
from .pallas.grid_walk import LANES, coarse_walk

__all__ = ["BrickAccel", "build_accel", "trace_grid_fast",
           "any_hit_grid_fast"]

BRICK = 8


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BrickAccel:
    coarse: Any                     # uint32[ROWS, 128] brick bitmask
    fine: Any                       # uint32[16, NB] per-brick cell bits
                                    # (transposed: row k = word k of every
                                    # brick — compact TPU layout for the
                                    # per-column gathers in the fine stage)
    origin: Any                     # float32[3]
    dims: tuple = field(metadata=dict(static=True))     # voxel dims X,Y,Z
    bdims: tuple = field(metadata=dict(static=True))    # brick dims
    voxel_size: float = field(metadata=dict(static=True))
    origin_key: tuple = field(metadata=dict(static=True))


def build_accel(occ, origin, voxel_size) -> BrickAccel:
    """occ (Z, Y, X) uint8 -> BrickAccel (device arrays)."""
    occ = jnp.asarray(occ)
    nz, ny, nx = occ.shape
    bx, by, bz = -(-nx // BRICK), -(-ny // BRICK), -(-nz // BRICK)
    pz, py, px = bz * BRICK - nz, by * BRICK - ny, bx * BRICK - nx
    occp = jnp.pad(occ, ((0, pz), (0, py), (0, px)))
    # (bz, 8, by, 8, bx, 8) -> brick-major (bz, by, bx, 8z, 8y, 8x)
    blocks = occp.reshape(bz, BRICK, by, BRICK, bx, BRICK) \
        .transpose(0, 2, 4, 1, 3, 5)
    # brick occupancy bitmask in x-fastest linear order
    bocc = (blocks.reshape(bz, by, bx, -1).max(axis=-1) > 0)
    n_bricks = bx * by * bz
    n_words = -(-n_bricks // 32)
    rows = max(1, -(-n_words // LANES))
    flat = jnp.zeros((rows * LANES * 32,), jnp.uint32) \
        .at[: n_bricks].set(bocc.transpose(0, 1, 2).reshape(-1)
                            .astype(jnp.uint32))
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = (flat.reshape(-1, 32) << shifts).sum(axis=1, dtype=jnp.uint32)
    coarse = words.reshape(rows, LANES)

    # fine words: per brick, 512 cell bits packed x-fastest into 16 words,
    # stored transposed (16, NB)
    cell_bits = blocks.reshape(n_bricks, BRICK * BRICK * BRICK) \
        .astype(jnp.uint32)
    fine = (cell_bits.reshape(n_bricks, 16, 32) << shifts).sum(
        axis=-1, dtype=jnp.uint32).transpose(1, 0)

    origin = np.asarray(origin, np.float32)
    return BrickAccel(
        coarse=coarse, fine=fine, origin=jnp.asarray(origin),
        dims=(nx, ny, nz), bdims=(bx, by, bz),
        voxel_size=float(voxel_size),
        origin_key=(float(origin[0]), float(origin[1]), float(origin[2])),
    )


def _init_state(o, d, accel, t_max):
    """Entry brick + active mask for each ray (mirrors the DDA init)."""
    bx, by, bz = accel.bdims
    bw = jnp.float32(accel.voxel_size * BRICK)
    origin = accel.origin
    gmax = origin + jnp.asarray([bx, by, bz], jnp.float32) * bw
    inv = 1.0 / d
    tbot = inv * (origin - o)
    ttop = inv * (gmax - o)
    tn = jnp.minimum(tbot, ttop)
    tf = jnp.maximum(tbot, ttop)
    t_enter = jnp.maximum(jnp.maximum(tn[:, 0], tn[:, 1]), tn[:, 2])
    t_exit = jnp.minimum(jnp.minimum(tf[:, 0], tf[:, 1]), tf[:, 2])
    t_start = jnp.maximum(t_enter, 0.0) + 1e-7
    ok = (t_exit > jnp.maximum(t_enter, 0.0)) & (t_start <= t_max)
    p = o + d * t_start[:, None]
    cell = jnp.clip(jnp.floor((p - origin) / bw).astype(jnp.int32), 0,
                    jnp.asarray([bx - 1, by - 1, bz - 1], jnp.int32))
    return cell[:, 0], cell[:, 1], cell[:, 2], ok


def _fine_resolve(o, d, brick_lin, accel, t_min, t_max, chunk=32768):
    """Dense 512-cell slab resolve inside each ray's hit brick, chunked
    over rays to bound the (chunk, 512) intermediates.

    Returns (t, cell_lin) with t = +inf where no accepted cell.
    """
    n = o.shape[0]
    if n > chunk:
        # python-loop chunking (straight-line under jit): gathers inside
        # lax.map/scan bodies are ~40x slower on this TPU
        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n

        def prep(x):
            cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, cfg).reshape((n_chunks, chunk) + x.shape[1:])

        po, pd, pb, pt = prep(o), prep(d), prep(brick_lin), prep(t_max)
        ts, lins = [], []
        for c in range(n_chunks):
            t, lin = _fine_resolve_block(po[c], pd[c], pb[c], pt[c],
                                         accel, t_min)
            ts.append(t)
            lins.append(lin)
        return (jnp.concatenate(ts)[:n], jnp.concatenate(lins)[:n])
    return _fine_resolve_block(o, d, brick_lin, t_max, accel, t_min)


def _fine_resolve_block(o, d, brick_lin, t_max, accel, t_min):
    nx, ny, nz = accel.dims
    bx, by, _bz = accel.bdims
    vs = jnp.float32(accel.voxel_size)
    origin = accel.origin
    half = jnp.float32(0.5) * vs

    has = brick_lin >= 0
    bl = jnp.maximum(brick_lin, 0)
    # one gather along axis 1 -> (16, N), then word-major use
    words = jnp.take(accel.fine, bl, axis=1).transpose(1, 0)  # (N, 16)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = ((words[:, :, None] >> shifts) & 1).astype(bool)  # (N, 16, 32)
    bits = bits.reshape(-1, 512)

    # brick -> base cell coords
    bcx = bl % bx
    bcy = (bl // bx) % by
    bcz = bl // (bx * by)
    k = jnp.arange(512, dtype=jnp.int32)
    lx = k % BRICK
    ly = (k // BRICK) % BRICK
    lz = k // (BRICK * BRICK)
    cx = bcx[:, None] * BRICK + lx[None, :]      # (N, 512)
    cy = bcy[:, None] * BRICK + ly[None, :]
    cz = bcz[:, None] * BRICK + lz[None, :]
    in_dims = (cx < nx) & (cy < ny) & (cz < nz)

    # reference cell AABB + slab test (raytrace.rint:46-56)
    ccx = origin[0] + (cx.astype(jnp.float32) + 0.5) * vs
    ccy = origin[1] + (cy.astype(jnp.float32) + 0.5) * vs
    ccz = origin[2] + (cz.astype(jnp.float32) + 0.5) * vs
    inv = 1.0 / d                                 # (N, 3)
    t0 = jnp.full(bits.shape, -jnp.inf, jnp.float32)
    t1 = jnp.full(bits.shape, jnp.inf, jnp.float32)
    for cc, oo, ii in ((ccx, o[:, 0:1], inv[:, 0:1]),
                       (ccy, o[:, 1:2], inv[:, 1:2]),
                       (ccz, o[:, 2:3], inv[:, 2:3])):
        tb = ii * ((cc - half) - oo)
        tt = ii * ((cc + half) - oo)
        t0 = jnp.maximum(t0, jnp.minimum(tb, tt))
        t1 = jnp.minimum(t1, jnp.maximum(tb, tt))
    accept = (t1 > jnp.maximum(t0, 0.0)) & (t0 > 0.0) \
        & (t0 >= t_min) & (t0 <= t_max[:, None]) \
        & bits & in_dims & has[:, None]
    t0m = jnp.where(accept, t0, jnp.inf)
    arg = jnp.argmin(t0m, axis=1)
    tbest = jnp.take_along_axis(t0m, arg[:, None], axis=1)[:, 0]
    lin = jnp.take_along_axis(
        cx + nx * (cy + ny * cz), arg[:, None], axis=1)[:, 0]
    lin = jnp.where(jnp.isfinite(tbest), lin, -1)
    return tbest, lin


@functools.partial(
    jax.jit,
    static_argnames=("accel_static", "rounds", "chunk", "fine"),
)
def _trace_fast_impl(o, d, accel, t_min, t_max, *, accel_static, rounds,
                     chunk, fine="walk"):
    cx, cy, cz, active = _init_state(o, d, accel, t_max)
    n = o.shape[0]
    best_t = jnp.full((n,), jnp.inf, jnp.float32)
    best_lin = jnp.full((n,), -1, jnp.int32)

    bdims, origin_key, vs, accel_static_dims = accel_static
    bw = float(vs * BRICK)

    # Rounds as a STATIC python loop (unrolled straight-line code under
    # jit).  Measured hard lesson: HBM gathers inside lax.while/scan
    # bodies run ~40x slower on this TPU than the same gathers in
    # straight-line code, so a data-dependent early-exit rounds loop is a
    # net catastrophe.

    def one_round(ox, oy, oz, dx, dy, dz, cx, cy, cz, act, tmx,
                  k_hits=4):
        hits, ncx, ncy, ncz, cont = coarse_walk(
            ox, oy, oz, dx, dy, dz, cx, cy, cz,
            act.astype(jnp.int32), tmx, accel.coarse,
            bdims=bdims, origin_key=origin_key, brick_world=bw,
            bq=chunk, k_hits=k_hits)
        nloc = ox.shape[0]
        t = jnp.full((nloc,), jnp.inf, jnp.float32)
        lin = jnp.full((nloc,), -1, jnp.int32)
        # resolve the k candidate bricks in ray order; a ray goes dead in
        # the fine kernel as soon as an earlier slot resolved it
        for s in range(k_hits):
            hit_s = jnp.where(jnp.isfinite(t), -1, hits[s])
            if fine == "walk":
                from .pallas.brick_fine import fine_walk
                bl = jnp.maximum(hit_s, 0)
                # one gather along axis 1 of the (16, NB) table -> (16, N)
                words = jnp.take(accel.fine, bl, axis=1)
                t_s, lin_s = fine_walk(
                    ox, oy, oz, dx, dy, dz, hit_s, words, t_min, tmx,
                    dims=accel_static_dims, bdims=bdims,
                    origin_key=origin_key, voxel_size=vs, bq=chunk)
            else:
                t_s, lin_s = _fine_resolve(
                    jnp.stack([ox, oy, oz], axis=-1),
                    jnp.stack([dx, dy, dz], axis=-1), hit_s, accel,
                    t_min, tmx)
            got = jnp.isfinite(t_s) & ~jnp.isfinite(t)
            t = jnp.where(got, t_s, t)
            lin = jnp.where(got, lin_s, lin)
        return t, lin, ncx, ncy, ncz, cont

    # round 1: all rays
    t, lin, cx, cy, cz, cont = one_round(
        o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
        cx, cy, cz, active, t_max)
    resolved = jnp.isfinite(t)
    best_t = jnp.where(resolved, t, best_t)
    best_lin = jnp.where(resolved, lin, best_lin)
    active = active & ~resolved & (cont > 0)

    # rounds 2+: compact the surviving rays into progressively smaller
    # buffers (cumsum compaction; overflow rays simply wait a round)
    min_cap = chunk * 128
    caps = ([max(min_cap, -(-n // 4))] * 3
            + [max(min_cap, -(-n // 16))] * max(0, rounds - 4))
    if caps and caps[0] < n:
        for cap in caps[: rounds - 1]:
            pos = jnp.cumsum(active.astype(jnp.int32)) - 1
            slot = jnp.where(active & (pos < cap), pos, cap)
            sel = jnp.full((cap,), n, jnp.int32).at[slot].set(
                jnp.arange(n, dtype=jnp.int32), mode="drop")
            live = sel < n
            sel_c = jnp.minimum(sel, n - 1)
            t, lin, scx, scy, scz, cont_s = one_round(
                o[sel_c, 0], o[sel_c, 1], o[sel_c, 2],
                d[sel_c, 0], d[sel_c, 1], d[sel_c, 2],
                cx[sel_c], cy[sel_c], cz[sel_c],
                live & active[sel_c], t_max[sel_c])
            # writes go through `sel` (empty slots hold the OOB index n and
            # get dropped) — clamped duplicates would race on ray n-1
            got = jnp.isfinite(t) & live
            best_t = best_t.at[sel].set(
                jnp.where(got, t, best_t[sel_c]), mode="drop")
            best_lin = best_lin.at[sel].set(
                jnp.where(got, lin, best_lin[sel_c]), mode="drop")
            cx = cx.at[sel].set(scx, mode="drop")
            cy = cy.at[sel].set(scy, mode="drop")
            cz = cz.at[sel].set(scz, mode="drop")
            new_act = active[sel_c] & ~got & (cont_s > 0) & live
            active = active.at[sel].set(new_act, mode="drop")
    else:
        for _ in range(rounds - 1):
            t, lin, cx, cy, cz, cont = one_round(
                o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                cx, cy, cz, active, t_max)
            resolved = jnp.isfinite(t) & active
            best_t = jnp.where(resolved, t, best_t)
            best_lin = jnp.where(resolved, lin, best_lin)
            active = active & ~resolved & (cont > 0)
    return best_t, best_lin


def trace_grid_fast(origins, dirs, accel: BrickAccel, t_min=TMIN,
                    t_max=TMAX, rounds=6, chunk=64, fine="walk"):
    """(t, cell_lin) nearest voxel hit; same contract as trace_grid_dda."""
    batch_shape = origins.shape[:-1]
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                               batch_shape).reshape(-1)
    # big coarse tables need small walk blocks so the hoisted mux rows
    # stay in vregs (rows * bq/8 vregs); 64-row tables (512^3 grids) run
    # at bq=32
    rows = accel.coarse.shape[0]
    if rows > 8:
        chunk = min(chunk, max(8, 2048 // rows // 8 * 8))
    t, lin = _trace_fast_impl(
        o, d, accel, jnp.float32(t_min), t_max_b,
        accel_static=(accel.bdims, accel.origin_key, accel.voxel_size,
                      accel.dims),
        rounds=rounds, chunk=chunk, fine=fine)
    return t.reshape(batch_shape), lin.reshape(batch_shape)


def any_hit_grid_fast(origins, dirs, accel: BrickAccel, t_min=TMIN,
                      t_max=TMAX, rounds=6, chunk=64, fine="walk"):
    t, _ = trace_grid_fast(origins, dirs, accel, t_min=t_min, t_max=t_max,
                           rounds=rounds, chunk=chunk, fine=fine)
    return jnp.isfinite(t)
