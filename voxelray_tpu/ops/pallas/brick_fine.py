"""Pallas kernel: per-voxel DDA inside a ray's hit brick(s).

Second stage of the accelerated traversal (after grid_walk finds each
ray's next K occupied 8^3 bricks): the bricks' 16 occupancy words arrive
pre-gathered from HBM, and this kernel walks the <= 22 cells the ray
actually crosses inside each brick — replacing the dense 512-cell slab
pass, whose (N, 512) float intermediates made it HBM-bandwidth-bound.

Per step: a 16-way register mux picks the word for the current cell,
the cell's AABB slab t0 is evaluated with the reference float expressions
(raytrace.rint:46-56 + report/interval rules), and the first accepted
cell wins.  Everything stays in vregs; no memory traffic beyond the
inputs.

fine_walk_multi fuses all K candidate slots into ONE kernel invocation
(round-2 roadmap item): slots run as K sequential in-register walks; a
lane goes dead for the remaining slots the moment an earlier slot
resolves it, and fully-resolved blocks exit each slot's while loop after
a single scalar check.  This replaces K separate kernel dispatches + K
separate HBM gathers with one of each.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid_walk import LANES

__all__ = ["fine_walk", "fine_walk_multi"]

BRICK = 8
_INF = np.float32(np.inf)


def _make_kernel(dims, bdims, origin, voxel_size, bq, k_slots, any_hit,
                 unroll=13):
    nx, ny, nz = dims
    bx, by, _bz = bdims
    ogx, ogy, ogz = (np.float32(origin[0]), np.float32(origin[1]),
                     np.float32(origin[2]))
    vs = np.float32(voxel_size)
    half = np.float32(0.5) * vs
    bwf = np.float32(BRICK) * vs
    max_steps = 3 * BRICK + 1

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               brick_ref, tmin_ref, tmax_ref, words_ref,
               t_ref, lin_ref):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        t_lo = tmin_ref[:]
        t_hi = tmax_ref[:]

        inv_x = 1.0 / dx
        inv_y = 1.0 / dy
        inv_z = 1.0 / dz
        sx = jnp.where(dx >= 0, 1, -1).astype(jnp.int32)
        sy = jnp.where(dy >= 0, 1, -1).astype(jnp.int32)
        sz = jnp.where(dz >= 0, 1, -1).astype(jnp.int32)
        fx = (sx > 0).astype(jnp.int32)
        fy = (sy > 0).astype(jnp.int32)
        fz = (sz > 0).astype(jnp.int32)

        best_t = jnp.full((bq, LANES), _INF, jnp.float32)
        best_lin = jnp.full((bq, LANES), -1, jnp.int32)

        # entry t into a brick along one axis
        def axis_entry(bmin, o, inv, d):
            t0 = (bmin - o) * inv
            t1 = (bmin + bwf - o) * inv
            return jnp.where(d == 0.0, -_INF, jnp.minimum(t0, t1))

        def make_slot(s, gate):
            """Context + initial sub-state for slot s.  gate: lanes still
            unresolved before this slot's GROUP; slot priority inside a
            group is restored at merge time (first finite slot in ray
            order wins), so gating per GROUP instead of per slot changes
            which lanes compute, never the result."""
            bid = brick_ref[0, s]
            valid = (bid >= 0) & gate
            b = jnp.maximum(bid, 0)
            bcx = b % bx
            bcy = (b // bx) % by
            bcz = b // (bx * by)
            bminx = ogx + (bcx * BRICK).astype(jnp.float32) * vs
            bminy = ogy + (bcy * BRICK).astype(jnp.float32) * vs
            bminz = ogz + (bcz * BRICK).astype(jnp.float32) * vs

            ex = axis_entry(bminx, ox, inv_x, dx)
            ey = axis_entry(bminy, oy, inv_y, dy)
            ez = axis_entry(bminz, oz, inv_z, dz)
            t_enter = jnp.maximum(jnp.maximum(ex, ey), ez)
            t_start = jnp.maximum(t_enter, 0.0) + np.float32(1e-7)

            px = ox + dx * t_start
            py = oy + dy * t_start
            pz = oz + dz * t_start
            lx = jnp.clip(jnp.floor((px - bminx) / vs).astype(jnp.int32),
                          0, BRICK - 1)
            ly = jnp.clip(jnp.floor((py - bminy) / vs).astype(jnp.int32),
                          0, BRICK - 1)
            lz = jnp.clip(jnp.floor((pz - bminz) / vs).astype(jnp.int32),
                          0, BRICK - 1)

            words = [words_ref[0, s, k] for k in range(16)]
            ctx = (bcx, bcy, bcz, bminx, bminy, bminz, words)
            sub = (lx, ly, lz,
                   jnp.full((bq, LANES), _INF, jnp.float32),
                   jnp.full((bq, LANES), -1, jnp.int32),
                   valid.astype(jnp.int32))
            return ctx, sub

        def slot_body(ctx, sub):
            """One DDA step of one slot's walk (the exact reference
            expressions; interleaving slots in a group reorders only
            instruction scheduling, never values)."""
            bcx, bcy, bcz, bminx, bminy, bminz, words = ctx
            lx, ly, lz, best_t, best_lin, act_i = sub
            act = act_i != 0
            lin_local = lx + BRICK * (ly + BRICK * lz)
            wsel = lin_local >> 5
            # binary mux tree: 15 selects + 4 bit tests instead of the
            # 16-way equality mux; identical result, fewer VPU ops
            lvl = words
            for bit in (1, 2, 4, 8):
                t_ = (wsel & bit) != 0
                lvl = [jnp.where(t_, lvl[i + 1], lvl[i])
                       for i in range(0, len(lvl), 2)]
            word = lvl[0]
            occ = ((word >> (lin_local & 31).astype(jnp.uint32)) & 1) > 0

            gx = bcx * BRICK + lx
            gy = bcy * BRICK + ly
            gz = bcz * BRICK + lz
            # no in-dims test: build_accel zero-pads boundary bricks, so
            # out-of-grid cells always read occ == 0

            # reference cell AABB slab test (raytrace.rint:46-56)
            ccx = ogx + (gx.astype(jnp.float32) + 0.5) * vs
            ccy = ogy + (gy.astype(jnp.float32) + 0.5) * vs
            ccz = ogz + (gz.astype(jnp.float32) + 0.5) * vs
            tb = inv_x * ((ccx - half) - ox)
            tt = inv_x * ((ccx + half) - ox)
            t0 = jnp.minimum(tb, tt)
            t1 = jnp.maximum(tb, tt)
            tb = inv_y * ((ccy - half) - oy)
            tt = inv_y * ((ccy + half) - oy)
            t0 = jnp.maximum(t0, jnp.minimum(tb, tt))
            t1 = jnp.minimum(t1, jnp.maximum(tb, tt))
            tb = inv_z * ((ccz - half) - oz)
            tt = inv_z * ((ccz + half) - oz)
            t0 = jnp.maximum(t0, jnp.minimum(tb, tt))
            t1 = jnp.minimum(t1, jnp.maximum(tb, tt))
            accept = (t1 > jnp.maximum(t0, 0.0)) & (t0 > 0.0) \
                & (t0 >= t_lo) & (t0 <= t_hi)

            hit = act & occ & accept
            best_t = jnp.where(hit, t0, best_t)
            best_lin = jnp.where(hit, gx + nx * (gy + ny * gz), best_lin)
            act = act & ~hit

            # step to the next cell in the brick
            tnx = jnp.where(
                dx == 0.0, _INF,
                (bminx + (lx + fx).astype(jnp.float32) * vs - ox)
                * inv_x)
            tny = jnp.where(
                dy == 0.0, _INF,
                (bminy + (ly + fy).astype(jnp.float32) * vs - oy)
                * inv_y)
            tnz = jnp.where(
                dz == 0.0, _INF,
                (bminz + (lz + fz).astype(jnp.float32) * vs - oz)
                * inv_z)
            tmin = jnp.minimum(tnx, jnp.minimum(tny, tnz))
            stx = act & (tnx == tmin)
            sty = act & (~stx) & (tny == tmin)
            stz = act & ~(stx | sty)
            lx = lx + jnp.where(stx, sx, 0)
            ly = ly + jnp.where(sty, sy, 0)
            lz = lz + jnp.where(stz, sz, 0)
            inb = ((lx >= 0) & (lx < BRICK) & (ly >= 0) & (ly < BRICK)
                   & (lz >= 0) & (lz < BRICK))
            act = act & inb & (tmin <= t_hi)
            return (lx, ly, lz, best_t, best_lin, act.astype(jnp.int32))

        # slots run sequentially; a lane goes dead for later slots the
        # moment an earlier slot resolves it (gate), and fully-dead
        # blocks exit each slot's while after one scalar check.
        # (Round-4 sweeps: slot-interleaved ILP groups and fully-static
        # step counts both measured within noise — pruned.)
        for s in range(k_slots):
            gate = ~jnp.isfinite(best_t)
            ctx, sub0 = make_slot(s, gate)

            def cond(state):
                # one scalar check per unrolled chunk; fully-dead blocks
                # (sky tiles, already-resolved rays) exit immediately
                return jnp.logical_and(state[0] < max_steps,
                                       jnp.any(state[1][5] != 0))

            init = (jnp.int32(0), sub0)
            if jax.default_backend() == "tpu":
                def chunk(state):
                    step, sb = state
                    for _ in range(unroll):
                        sb = slot_body(ctx, sb)
                        step = step + 1
                    return (step, sb)
                _, sub = jax.lax.while_loop(cond, chunk, init)
            else:
                # interpret mode: plain early-exit while keeps CPU
                # tests fast
                def one(state):
                    step, sb = state
                    return (step + 1, slot_body(ctx, sb))
                _, sub = jax.lax.while_loop(cond, one, init)

            # merge in slot order: first finite slot (ray order) wins —
            # identical to the sequential per-slot update
            bt, bl = sub[3], sub[4]
            take = jnp.isfinite(bt) & ~jnp.isfinite(best_t)
            best_t = jnp.where(take, bt, best_t)
            best_lin = jnp.where(take, bl, best_lin)
        t_ref[:] = best_t
        lin_ref[:] = best_lin

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("dims", "bdims", "origin_key", "voxel_size", "bq",
                     "any_hit", "unroll"),
)
def fine_walk_multi(ox, oy, oz, dx, dy, dz, bricks, words, t_min, t_max, *,
                    dims, bdims, origin_key, voxel_size, bq=64,
                    any_hit=False, unroll=13):
    """Resolve each ray against its K candidate bricks in ray order.

    bricks: (K, N) int32 brick ids (-1 = no brick); words: (K, 16, N)
    uint32 pre-gathered brick occupancy (word-major per slot — every
    gather/reshape stays in a compact TPU layout).  t_min: (N,) or
    scalar; t_max: (N,).  Returns (t (N,) f32 with +inf miss, cell_lin
    (N,) int32 with -1) — the first accepted cell across slots in ray
    order (identical contract to running fine_walk per slot and keeping
    the first finite result).
    """
    k = bricks.shape[0]
    n = ox.shape[0]
    # VMEM budget: the (k, 16, bq, 128) words block dominates at
    # k*16*bq*128*4 bytes (x2 double-buffered); k=16 at bq=32 measured
    # OOM (17M > the 16M scoped limit), so bq shrinks as k grows
    bq = min(bq, max(8, (512 // max(k, 1)) // 8 * 8))
    per_block = bq * LANES
    n_blocks = max(1, -(-n // per_block))
    pad = n_blocks * per_block - n

    def prep(x, fill=0):
        x = jnp.pad(x, (0, pad), constant_values=fill)
        return x.reshape(n_blocks * bq, LANES)

    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    # BLOCK-MAJOR layouts: with the round-2 (k, 16, blocks*bq, LANES)
    # layout each grid step's words block was k*16 = 80 strided DMA
    # slabs (plus k for bricks) — descriptor setup dominated the kernel
    # (round-3 finding: op count, conds, ilp, bq all measured flat).
    # One XLA transpose up front (~130 MB moved once) makes each block
    # a single contiguous DMA.
    bk = jnp.pad(bricks, ((0, 0), (0, pad)), constant_values=-1)
    bk = bk.reshape(k, n_blocks, bq, LANES).transpose(1, 0, 2, 3)
    w = jnp.pad(words, ((0, 0), (0, 0), (0, pad)))
    w = w.reshape(k, 16, n_blocks, bq, LANES).transpose(2, 0, 1, 3, 4)

    kernel = _make_kernel(dims, bdims, origin_key, voxel_size, bq, k,
                          any_hit, unroll=unroll)
    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((bq, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec((1, k, bq, LANES), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((bq, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((1, k, 16, bq, LANES),
                        lambda i: (i, 0, 0, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((bq, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
    )
    t, lin = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * bq, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * bq, LANES), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(prep(ox), prep(oy), prep(oz),
      prep(dx, 1.0), prep(dy, 1.0), prep(dz, 1.0),
      bk, prep(t_min_b), prep(t_max),
      w)
    return t.reshape(-1)[:n], lin.reshape(-1)[:n]


def fine_walk(ox, oy, oz, dx, dy, dz, brick, words, t_min, t_max, *,
              dims, bdims, origin_key, voxel_size, bq=64):
    """Single-slot compatibility wrapper over fine_walk_multi.

    brick: (N,) int32 (-1 = no brick); words: (16, N) uint32.
    """
    return fine_walk_multi(
        ox, oy, oz, dx, dy, dz, brick[None], words[None], t_min, t_max,
        dims=dims, bdims=bdims, origin_key=origin_key,
        voxel_size=voxel_size, bq=bq)
