"""Pallas TPU megakernel: the ENTIRE grid trace in one dispatch.

This is the literal TPU analog of the reference's fused driver traversal
(`vkCmdTraceRaysKHR`, hello_vulkan.cpp:1047): one kernel walks rays
across bricks, resolves per-voxel hits, and drains stragglers — with
ZERO host-visible intermediates.  The round-4 attribution proved the
two-kernel pipeline (grid_walk -> XLA compaction/gather -> brick_fine)
is glue-bound: isolated components sum ~34 ms while the frame pays ~50
(compaction ~9, fine-words take ~8, stage-boundary materialization ~15).
This kernel deletes all three plus the XLA drain.

How the fine words reach the kernel without the XLA gather:

  * The per-brick packed cell words are stored SUPERBRICK-major in HBM:
    fine_sb[s] is a (72, 128) uint32 tile — rows 0-63 hold word w of
    brick-local b at (w*4 + (b>>7), b&127), row 64 packs the 512 brick
    -occupancy bits (one superbrick = 512 bricks x 16 words + occupancy
    = 36 KB contiguous).
  * Each (BQ, 128) block of image-tile-coherent rays walks at SUPERBRICK
    speed (the grid_walk two-speed skip, L2 bitmask only — no L1 mux).
    A lane entering an occupied superbrick PENDS it and pauses.
  * Between walk bursts the block serves the B smallest distinct
    pending superbricks: B overlapped 36 KB DMAs HBM->VMEM, then every
    pending lane TRANSITS its superbrick in-kernel — empty bricks
    skipped via the tile's occupancy row (one broadcast+take), occupied
    bricks resolved by the inline per-voxel DDA (brick_fine slot_body
    expression shapes — raytrace.rint:46-56), words muxed from the
    lane's tile.  Accepted lanes retire; lanes that exit the superbrick
    unresolved resume the superbrick walk from the exit brick.
  * Bricks are visited in ray order per lane and a lane has one pending
    superbrick at a time, so the first accepted cell IS the nearest —
    identical contract to trace_grid_fast/trace_grid_dda.
  * transit=False keeps the v2 per-BRICK pending form (walk at brick
    speed with the L1 mux, serve = one brick fine-resolve per lane):
    measured 35.4 ms vs transit's 29.9 at the full preset — kept as the
    A/B reference.

Exactness: walk and fine expressions are the exact grid_walk/brick_fine
shapes, so results land in the same FMA-contraction class the bench
adjudicates (PARITY.md "grazing-cell hits").  A lane terminates only by
accept, grid exit, or t budget — the kernel is exhaustive by
construction (no k_hits x rounds coverage bound, no drain); the
`unresolved` output (lanes alive at the outer-iteration cap) is the
defensive invariant, asserted 0 by the bench gate.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid_walk import LANES, _fused_init

__all__ = ["build_fine_sb", "trace_grid_mega"]

BRICK = 8
_INF = np.float32(np.inf)
_IMAX = np.int32(2**31 - 1)
WALK_UNROLL = 16
FINE_STEPS = 3 * BRICK + 1   # max cells a ray crosses in one brick


TILE_ROWS = 72  # 64 word rows + occupancy row 64 + 7 alignment spares


def build_fine_sb(fine, bdims):
    """(16, NB) packed fine words -> (n_sb, 72, 128) superbrick-major.

    fine: the BrickAccel fine table (word-major, brick lin x-fastest).
    Within superbrick s, rows 0-63 hold word w of brick-local b at
    (w*4 + (b>>7), b&127) — flat index w*512 + b reshaped (64, 128).
    Row 64 lanes 0-15 hold the superbrick's BRICK-occupancy words
    (brick b occupied bit at lane b>>5, bit b&31) — the transit serve's
    brick test is one broadcast+take instead of 16 word reads.  Rows
    65-71 pad to an 8-sublane multiple.  Bricks outside bdims are zero.
    """
    bx, by, bz = bdims
    sbx, sby, sbz = -(-bx // 8), -(-by // 8), -(-bz // 8)
    n_sb = sbx * sby * sbz
    # host-built index map: sb-major (s, b) -> global brick lin (or NB =
    # zero pad slot)
    s = np.arange(n_sb)
    scx = s % sbx
    scy = (s // sbx) % sby
    scz = s // (sbx * sby)
    b = np.arange(512)
    lx = b % 8
    ly = (b // 8) % 8
    lz = b // 64
    gx = scx[:, None] * 8 + lx[None, :]
    gy = scy[:, None] * 8 + ly[None, :]
    gz = scz[:, None] * 8 + lz[None, :]
    valid = (gx < bx) & (gy < by) & (gz < bz)
    lin = gx + bx * (gy + by * gz)
    nb = fine.shape[1]
    idx = np.where(valid, lin, nb).astype(np.int32)  # nb -> zero column
    finep = jnp.pad(fine, ((0, 0), (0, 1)))          # (16, NB+1)
    # (16, n_sb*512) -> (n_sb, 16, 512) -> (n_sb, 64, 128)
    words = jnp.take(finep, jnp.asarray(idx.reshape(-1)), axis=1)
    words = words.reshape(16, n_sb, 512).transpose(1, 0, 2)
    tiles = words.reshape(n_sb, 64, 128)
    # brick-occupancy row: brick b occupied iff any of its 16 words != 0
    bocc = (words.max(axis=1) > 0)                   # (n_sb, 512)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    occw = (bocc.reshape(n_sb, 16, 32).astype(jnp.uint32)
            << shifts).sum(axis=-1, dtype=jnp.uint32)   # (n_sb, 16)
    occ_row = jnp.zeros((n_sb, 1, 128), jnp.uint32).at[:, 0, :16] \
        .set(occw)
    pad_rows = jnp.zeros((n_sb, TILE_ROWS - 65, 128), jnp.uint32)
    return jnp.concatenate([tiles, occ_row, pad_rows], axis=1)


def _make_mega_kernel(dims, bdims, origin, voxel_size, bq, serves_per_it,
                      outer_cap, any_hit, interp, n_serve_sb,
                      prof_mode=None, fine_unroll=13, transit=False,
                      a_steps=4):
    nx, ny, nz = dims
    bx, by, bz = bdims
    sbx, sby, sbz = -(-bx // 8), -(-by // 8), -(-bz // 8)
    n_sb = sbx * sby * sbz
    ogx, ogy, ogz = (np.float32(origin[0]), np.float32(origin[1]),
                     np.float32(origin[2]))
    vs = np.float32(voxel_size)
    half = np.float32(0.5) * vs
    bw = np.float32(voxel_size * BRICK)

    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref,
               tmax_ref, act_ref, table_ref, l2_ref, fine_ref,
               t_ref, lin_ref, alive_ref, fbuf, sem):
        from .grid_walk import hoist_rows, mux_lookup
        # transit mode never touches the L1 table: brick occupancy
        # comes from the DMA'd tiles, so skip the (rows x bq/8)-vreg
        # hoist entirely
        rows_bc = None if transit else hoist_rows(table_ref, bq)
        l2_bc = hoist_rows(l2_ref, bq)
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        t_lo = tmin_ref[:]
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
            lin = (cx >> 3) + sbx * ((cy >> 3) + sby * (cz >> 3))
            word = mux_lookup(l2_ref, lin >> 5, bq, l2_bc)
            return ((word >> (lin & 31).astype(jnp.uint32)) & 1) > 0

        def walk_step(st):
            """One two-speed brick DDA step (grid_walk _make_kernel_2l
            body, k=1 pending instead of the hits tuple)."""
            cx, cy, cz, wact, pend, rescont = st
            walking = (wact != 0) & (pend < 0)
            skip = walking & ~l2_occ(cx, cy, cz)
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
            lbx = jnp.floor((ox + dx * t_ex - ogx) / bw).astype(jnp.int32)
            lby = jnp.floor((oy + dy * t_ex - ogy) / bw).astype(jnp.int32)
            lbz = jnp.floor((oz + dz * t_ex - ogz) / bw).astype(jnp.int32)
            lx = jnp.clip(lbx - sx, scx * 8, scx * 8 + 7)
            ly = jnp.clip(lby - sy, scy * 8, scy * 8 + 7)
            lz = jnp.clip(lbz - sz, scz * 8, scz * 8 + 7)
            lx = jnp.where(sx > 0, jnp.maximum(lx, cx), jnp.minimum(lx, cx))
            ly = jnp.where(sy > 0, jnp.maximum(ly, cy), jnp.minimum(ly, cy))
            lz = jnp.where(sz > 0, jnp.maximum(lz, cz), jnp.minimum(lz, cz))
            cx = jnp.where(skip, lx, cx)
            cy = jnp.where(skip, ly, cy)
            cz = jnp.where(skip, lz, cz)

            lin = cx + bx * (cy + by * cz)
            if prof_mode == "nol1":
                # TIMING ABLATION: no L1 mux, no pends -> pure two-speed
                # walk + loop overhead (rays run to exit)
                occ = jnp.zeros((bq, LANES), bool)
            else:
                word = mux_lookup(table_ref, lin >> 5, bq, rows_bc)
                occ = ((word >> (lin & 31).astype(jnp.uint32)) & 1) > 0
            hit_now = walking & occ
            pend = jnp.where(hit_now, lin, pend)

            # one exact brick DDA step for every walking lane (the
            # hit_now lane steps too: its stored cell is the resume
            # position — grid_walk's "steps once more" rule)
            tx = (ogx + (cx + fx).astype(jnp.float32) * bw - ox) * inv_x
            ty = (ogy + (cy + fy).astype(jnp.float32) * bw - oy) * inv_y
            tz = (ogz + (cz + fz).astype(jnp.float32) * bw - oz) * inv_z
            tx = jnp.where(dx == 0.0, _INF, tx)
            ty = jnp.where(dy == 0.0, _INF, ty)
            tz = jnp.where(dz == 0.0, _INF, tz)
            tmin = jnp.minimum(tx, jnp.minimum(ty, tz))
            stepx = walking & (tx == tmin)
            stepy = walking & (~stepx) & (ty == tmin)
            stepz = walking & ~(stepx | stepy)
            cx = cx + jnp.where(stepx, sx, 0)
            cy = cy + jnp.where(stepy, sy, 0)
            cz = cz + jnp.where(stepz, sz, 0)
            inb = ((cx >= 0) & (cx < bx) & (cy >= 0) & (cy < by)
                   & (cz >= 0) & (cz < bz))
            cont = inb & (tmin <= tmax)
            # paused lanes store whether their resume position is live
            rescont = jnp.where(hit_now, cont.astype(jnp.int32), rescont)
            # walked-off lanes (no pending recorded this step) die
            dead = walking & ~hit_now & ~cont
            wact = jnp.where(dead, 0, wact)
            return (cx, cy, cz, wact, pend, rescont)

        def fine_resolve(pend_lin, gate, bufsel):
            """In-register per-voxel DDA inside the pending brick, fine
            words muxed from the lane's DMA'd superbrick tile (bufsel
            picks among the B tiles served this round; brick_fine
            slot_body expression shapes, raytrace.rint:46-56)."""
            b = jnp.maximum(pend_lin, 0)
            pbx = b % bx
            pby = (b // bx) % by
            pbz = b // (bx * by)
            blocal = (pbx & 7) + 8 * ((pby & 7) + 8 * (pbz & 7))
            col = blocal & 127
            rowsel = blocal >> 7          # 0..3
            if prof_mode == "nofetch":
                # TIMING ABLATION: word 0 of each tile, no per-lane mux
                words = [jnp.broadcast_to(fbuf[0, w * 4: w * 4 + 1, :],
                                          (bq, LANES))
                         for w in range(16)]
            else:
                words = []
                for w in range(16):
                    out = jnp.zeros((bq, LANES), jnp.uint32)
                    for bf in range(n_serve_sb):
                        for r in range(4):
                            tr = jnp.broadcast_to(
                                fbuf[bf, w * 4 + r: w * 4 + r + 1, :],
                                (bq, LANES))
                            val = jnp.take_along_axis(tr, col, axis=1)
                            out = jnp.where((rowsel == r) & (bufsel == bf),
                                            val, out)
                    words.append(out)

            bminx = ogx + (pbx * BRICK).astype(jnp.float32) * vs
            bminy = ogy + (pby * BRICK).astype(jnp.float32) * vs
            bminz = ogz + (pbz * BRICK).astype(jnp.float32) * vs

            def axis_entry(bmin, o, inv, d):
                t0 = (bmin - o) * inv
                t1 = (bmin + bw - o) * inv
                return jnp.where(d == 0.0, -_INF, jnp.minimum(t0, t1))

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

            def fine_step(sub):
                lx, ly, lz, best_t, best_lin, act_i = sub
                act = act_i != 0
                lin_local = lx + BRICK * (ly + BRICK * lz)
                wsel = lin_local >> 5
                lvl = words
                for bit in (1, 2, 4, 8):
                    t_ = (wsel & bit) != 0
                    lvl = [jnp.where(t_, lvl[i + 1], lvl[i])
                           for i in range(0, len(lvl), 2)]
                word = lvl[0]
                occ = ((word >> (lin_local & 31).astype(jnp.uint32)) & 1) \
                    > 0

                gx = pbx * BRICK + lx
                gy = pby * BRICK + ly
                gz = pbz * BRICK + lz
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
                    & (t0 >= t_lo) & (t0 <= tmax)

                hit = act & occ & accept
                best_t = jnp.where(hit, t0, best_t)
                best_lin = jnp.where(hit, gx + nx * (gy + ny * gz),
                                     best_lin)
                act = act & ~hit

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
                tmn = jnp.minimum(tnx, jnp.minimum(tny, tnz))
                stx = act & (tnx == tmn)
                sty = act & (~stx) & (tny == tmn)
                stz = act & ~(stx | sty)
                lx = lx + jnp.where(stx, sx, 0)
                ly = ly + jnp.where(sty, sy, 0)
                lz = lz + jnp.where(stz, sz, 0)
                inb = ((lx >= 0) & (lx < BRICK) & (ly >= 0) & (ly < BRICK)
                       & (lz >= 0) & (lz < BRICK))
                act = act & inb & (tmn <= tmax)
                return (lx, ly, lz, best_t, best_lin,
                        act.astype(jnp.int32))

            # while-loop form (brick_fine shape): static unroll on TPU,
            # single step + early exit in interpret — the 25x straight-
            # line unroll blew XLA:CPU compile time inside the nested
            # outer while.  fine_unroll=0 (TPU only): fully static
            # FINE_STEPS straight-line walk, NO inner while — the
            # f5/f7/f13 sweep measured flat, i.e. the while's scalar
            # cond syncs cost as much as the steps they skip.
            sub0 = (lx, ly, lz,
                    jnp.full((bq, LANES), _INF, jnp.float32),
                    jnp.full((bq, LANES), -1, jnp.int32),
                    gate.astype(jnp.int32))
            if fine_unroll == 0 and not interp:
                sub = sub0
                for _ in range(FINE_STEPS):
                    sub = fine_step(sub)
                return sub[3], sub[4]
            f_unroll = fine_unroll if not interp else 1

            def f_cond(state):
                return jnp.logical_and(state[0] < FINE_STEPS,
                                       jnp.any(state[1][5] != 0))

            def f_body(state):
                step, sub = state
                for _ in range(f_unroll):
                    sub = fine_step(sub)
                return (step + f_unroll, sub)

            _, sub = jax.lax.while_loop(f_cond, f_body,
                                        (jnp.int32(0), sub0))
            return sub[3], sub[4]

        def serve(st, best_t, best_lin):
            """Serve the B smallest distinct pending superbricks in one
            round: B overlapped DMAs, each lane muxes its own tile.

            Round-5 measurement that forced B > 1: single-sb serves ran
            the full-block fine walk at the served sb's lane density
            (~5-15%) — the SIMT waste replaced the XLA glue the kernel
            deleted.  B-way serves multiply fine-walk utilization by ~B
            for one extra mux level."""
            cx, cy, cz, wact, pend, rescont = st
            has_p = pend >= 0
            b = jnp.maximum(pend, 0)
            psb = ((b % bx) >> 3) \
                + sbx * ((((b // bx) % by) >> 3)
                         + sby * ((b // (bx * by)) >> 3))
            sb_key = jnp.where(has_p, psb, _IMAX)
            # B smallest distinct pending sb ids (scalar reduces)
            ids = []
            key = sb_key
            for _ in range(n_serve_sb):
                m = jnp.min(key)
                ids.append(m)
                key = jnp.where(key == m, _IMAX, key)
            valid = [i < _IMAX for i in ids]
            B = n_serve_sb
            # (A carried B-slot tile CACHE keyed on sb ids was built and
            # measured FLAT — 35.7 vs 35.4 ms: a round's served sbs have
            # their pendings cleared, so the next round's minima are
            # almost always fresh sbs.  Removed.)
            if interp:
                for bf in range(B):
                    fbuf[bf] = fine_ref[jnp.minimum(ids[bf], n_sb - 1)]
            elif prof_mode != "nodma":
                # start all B copies, then wait all: latency overlaps
                for bf in range(B):
                    @pl.when(valid[bf])
                    def _(bf=bf):
                        pltpu.make_async_copy(
                            fine_ref.at[jnp.minimum(ids[bf], n_sb - 1)],
                            fbuf.at[bf], sem.at[bf]).start()
                for bf in range(B):
                    @pl.when(valid[bf])
                    def _(bf=bf):
                        pltpu.make_async_copy(
                            fine_ref.at[jnp.minimum(ids[bf], n_sb - 1)],
                            fbuf.at[bf], sem.at[bf]).wait()
            srv_inc = (ids[0] < _IMAX).astype(jnp.int32)
            bufsel = jnp.full((bq, LANES), -1, jnp.int32)
            for bf in range(B):
                bufsel = jnp.where(
                    jnp.logical_and(valid[bf], sb_key == ids[bf]),
                    jnp.int32(bf), bufsel)
            gate = bufsel >= 0
            if prof_mode == "nofine":
                # TIMING ABLATION: every serve misses -> lanes resume;
                # preserves walk/serve round structure, skips cell DDA
                ft = jnp.full((bq, LANES), _INF, jnp.float32)
                flin = jnp.full((bq, LANES), -1, jnp.int32)
            else:
                ft, flin = fine_resolve(pend, gate,
                                        jnp.maximum(bufsel, 0))
            got = gate & jnp.isfinite(ft)
            best_t = jnp.where(got, ft, best_t)
            best_lin = jnp.where(got, flin, best_lin)
            # served lanes: hit -> retire; miss -> resume walking if the
            # stored resume position was live
            pend = jnp.where(gate, -1, pend)
            dead = got | (gate & (rescont == 0))
            wact = jnp.where(dead, 0, wact)
            return (cx, cy, cz, wact, pend, rescont), best_t, best_lin, \
                srv_inc

        def walk_step_t(st):
            """Transit-mode walk: SUPERBRICK-speed only.  A lane whose
            current brick sits in an occupied superbrick pends that SB
            (no step — the transit serve walks it from this entry
            brick); lanes in empty superbricks take the grid_walk
            two-speed skip + one exact brick step.  No L1 mux at all:
            brick occupancy lives in the DMA'd tiles (row 64)."""
            cx, cy, cz, wact, pend, rescont = st
            walking = (wact != 0) & (pend < 0)
            sb_occ = l2_occ(cx, cy, cz)
            pend_now = walking & sb_occ
            sb_lin = (cx >> 3) + sbx * ((cy >> 3) + sby * (cz >> 3))
            pend = jnp.where(pend_now, sb_lin, pend)
            moving = walking & ~sb_occ
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
            lbx = jnp.floor((ox + dx * t_ex - ogx) / bw).astype(jnp.int32)
            lby = jnp.floor((oy + dy * t_ex - ogy) / bw).astype(jnp.int32)
            lbz = jnp.floor((oz + dz * t_ex - ogz) / bw).astype(jnp.int32)
            lx = jnp.clip(lbx - sx, scx * 8, scx * 8 + 7)
            ly = jnp.clip(lby - sy, scy * 8, scy * 8 + 7)
            lz = jnp.clip(lbz - sz, scz * 8, scz * 8 + 7)
            lx = jnp.where(sx > 0, jnp.maximum(lx, cx), jnp.minimum(lx, cx))
            ly = jnp.where(sy > 0, jnp.maximum(ly, cy), jnp.minimum(ly, cy))
            lz = jnp.where(sz > 0, jnp.maximum(lz, cz), jnp.minimum(lz, cz))
            cx = jnp.where(moving, lx, cx)
            cy = jnp.where(moving, ly, cy)
            cz = jnp.where(moving, lz, cz)
            # one exact brick DDA step crosses the superbrick boundary
            tx = (ogx + (cx + fx).astype(jnp.float32) * bw - ox) * inv_x
            ty = (ogy + (cy + fy).astype(jnp.float32) * bw - oy) * inv_y
            tz = (ogz + (cz + fz).astype(jnp.float32) * bw - oz) * inv_z
            tx = jnp.where(dx == 0.0, _INF, tx)
            ty = jnp.where(dy == 0.0, _INF, ty)
            tz = jnp.where(dz == 0.0, _INF, tz)
            tmin = jnp.minimum(tx, jnp.minimum(ty, tz))
            stepx = moving & (tx == tmin)
            stepy = moving & (~stepx) & (ty == tmin)
            stepz = moving & ~(stepx | stepy)
            cx = cx + jnp.where(stepx, sx, 0)
            cy = cy + jnp.where(stepy, sy, 0)
            cz = cz + jnp.where(stepz, sz, 0)
            inb = ((cx >= 0) & (cx < bx) & (cy >= 0) & (cy < by)
                   & (cz >= 0) & (cz < bz))
            dead = moving & ~(inb & (tmin <= tmax))
            wact = jnp.where(dead, 0, wact)
            return (cx, cy, cz, wact, pend, rescont)

        def tile_occ_brick(bcx, bcy, bcz, bsel):
            """Brick occupancy from the DMA'd tiles' row 64 (one
            broadcast+take per buffer)."""
            bl = (bcx & 7) + 8 * ((bcy & 7) + 8 * (bcz & 7))
            w = jnp.zeros((bq, LANES), jnp.uint32)
            for bf in range(n_serve_sb):
                tr = jnp.broadcast_to(fbuf[bf, 64:65, :], (bq, LANES))
                val = jnp.take_along_axis(tr, bl >> 5, axis=1)
                w = jnp.where(bsel == bf, val, w)
            return ((w >> (bl & 31).astype(jnp.uint32)) & 1) > 0

        def brick_dda_step(bcx, bcy, bcz, move):
            """One exact brick step for `move` lanes; returns new coords
            + the crossing t (for the t budget)."""
            tx = (ogx + (bcx + fx).astype(jnp.float32) * bw - ox) * inv_x
            ty = (ogy + (bcy + fy).astype(jnp.float32) * bw - oy) * inv_y
            tz = (ogz + (bcz + fz).astype(jnp.float32) * bw - oz) * inv_z
            tx = jnp.where(dx == 0.0, _INF, tx)
            ty = jnp.where(dy == 0.0, _INF, ty)
            tz = jnp.where(dz == 0.0, _INF, tz)
            tmin = jnp.minimum(tx, jnp.minimum(ty, tz))
            stepx = move & (tx == tmin)
            stepy = move & (~stepx) & (ty == tmin)
            stepz = move & ~(stepx | stepy)
            bcx = bcx + jnp.where(stepx, sx, 0)
            bcy = bcy + jnp.where(stepy, sy, 0)
            bcz = bcz + jnp.where(stepz, sz, 0)
            return bcx, bcy, bcz, tmin

        def fine_brick(bcx, bcy, bcz, gate, bsel):
            """Per-voxel DDA through ONE brick (exact fine_resolve
            expressions, brick given by coords, words muxed from the
            lane's tile)."""
            blocal = (bcx & 7) + 8 * ((bcy & 7) + 8 * (bcz & 7))
            col = blocal & 127
            rowsel = blocal >> 7
            words = []
            for w in range(16):
                out = jnp.zeros((bq, LANES), jnp.uint32)
                for bf in range(n_serve_sb):
                    for r in range(4):
                        tr = jnp.broadcast_to(
                            fbuf[bf, w * 4 + r: w * 4 + r + 1, :],
                            (bq, LANES))
                        val = jnp.take_along_axis(tr, col, axis=1)
                        out = jnp.where((rowsel == r) & (bsel == bf),
                                        val, out)
                words.append(out)
            bminx = ogx + (bcx * BRICK).astype(jnp.float32) * vs
            bminy = ogy + (bcy * BRICK).astype(jnp.float32) * vs
            bminz = ogz + (bcz * BRICK).astype(jnp.float32) * vs

            def axis_entry(bmin, o, inv, d):
                t0 = (bmin - o) * inv
                t1 = (bmin + bw - o) * inv
                return jnp.where(d == 0.0, -_INF, jnp.minimum(t0, t1))

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
            def fb_step(sub):
                lx, ly, lz, best_t, best_lin, act_i = sub
                act = act_i != 0
                lin_local = lx + BRICK * (ly + BRICK * lz)
                wsel = lin_local >> 5
                lvl = words
                for bit in (1, 2, 4, 8):
                    t_ = (wsel & bit) != 0
                    lvl = [jnp.where(t_, lvl[i + 1], lvl[i])
                           for i in range(0, len(lvl), 2)]
                word = lvl[0]
                occ = ((word >> (lin_local & 31).astype(jnp.uint32)) & 1) \
                    > 0
                gx = bcx * BRICK + lx
                gy = bcy * BRICK + ly
                gz = bcz * BRICK + lz
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
                    & (t0 >= t_lo) & (t0 <= tmax)
                hit = act & occ & accept
                best_t = jnp.where(hit, t0, best_t)
                best_lin = jnp.where(hit, gx + nx * (gy + ny * gz),
                                     best_lin)
                act = act & ~hit
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
                tmn = jnp.minimum(tnx, jnp.minimum(tny, tnz))
                stx = act & (tnx == tmn)
                sty = act & (~stx) & (tny == tmn)
                stz = act & ~(stx | sty)
                lx = lx + jnp.where(stx, sx, 0)
                ly = ly + jnp.where(sty, sy, 0)
                lz = lz + jnp.where(stz, sz, 0)
                inbf = ((lx >= 0) & (lx < BRICK) & (ly >= 0)
                        & (ly < BRICK) & (lz >= 0) & (lz < BRICK))
                act = act & inbf & (tmn <= tmax)
                return (lx, ly, lz, best_t, best_lin,
                        act.astype(jnp.int32))

            sub = (lx, ly, lz,
                   jnp.full((bq, LANES), _INF, jnp.float32),
                   jnp.full((bq, LANES), -1, jnp.int32),
                   gate.astype(jnp.int32))
            if not interp:
                # straight-line: no scalar cond syncs inside the serve
                for _ in range(FINE_STEPS):
                    sub = fb_step(sub)
            else:
                # interpret: early-exit while (the 25x straight-line
                # unroll inside the nested transit/outer whiles blows
                # XLA:CPU compile time)
                def fb_cond(state):
                    return jnp.logical_and(state[0] < FINE_STEPS,
                                           jnp.any(state[1][5] != 0))

                def fb_body(state):
                    return (state[0] + 1, fb_step(state[1]))

                _, sub = jax.lax.while_loop(fb_cond, fb_body,
                                            (jnp.int32(0), sub))
            return sub[3], sub[4]

        TRANSIT_CAP = 3 * BRICK + 4
        A_STEPS = a_steps

        def serve_transit(st, best_t, best_lin):
            """Transit serve: walk each gated lane through its ENTIRE
            pending superbrick — empty bricks skipped via the tile's
            occupancy row, occupied bricks resolved with the inline
            per-voxel DDA — in one serve round.  Serves collapse to
            ~one per (block, occupied-superbrick) visit instead of one
            per brick candidate."""
            cx, cy, cz, wact, pend, rescont = st
            has_p = pend >= 0
            sb_key = jnp.where(has_p, pend, _IMAX)
            ids = []
            key = sb_key
            for _ in range(n_serve_sb):
                m = jnp.min(key)
                ids.append(m)
                key = jnp.where(key == m, _IMAX, key)
            valid = [i < _IMAX for i in ids]
            B = n_serve_sb
            if interp:
                for bf in range(B):
                    fbuf[bf] = fine_ref[jnp.minimum(ids[bf], n_sb - 1)]
            elif prof_mode != "nodma":
                for bf in range(B):
                    @pl.when(valid[bf])
                    def _(bf=bf):
                        pltpu.make_async_copy(
                            fine_ref.at[jnp.minimum(ids[bf], n_sb - 1)],
                            fbuf.at[bf], sem.at[bf]).start()
                for bf in range(B):
                    @pl.when(valid[bf])
                    def _(bf=bf):
                        pltpu.make_async_copy(
                            fine_ref.at[jnp.minimum(ids[bf], n_sb - 1)],
                            fbuf.at[bf], sem.at[bf]).wait()
            srv_inc = (ids[0] < _IMAX).astype(jnp.int32)
            bufsel = jnp.full((bq, LANES), -1, jnp.int32)
            for bf in range(B):
                bufsel = jnp.where(
                    jnp.logical_and(valid[bf], sb_key == ids[bf]),
                    jnp.int32(bf), bufsel)
            gate = bufsel >= 0
            bsel = jnp.maximum(bufsel, 0)
            tsb = jnp.maximum(pend, 0)
            tscx = tsb % sbx
            tscy = (tsb // sbx) % sby
            tscz = tsb // (sbx * sby)

            def in_transit_checks(bcx, bcy, bcz, tmin, act):
                """Post-step disposition: still transiting / resume the
                global walk (left the sb, still live) / dead."""
                in_sb = ((bcx >> 3) == tscx) & ((bcy >> 3) == tscy) \
                    & ((bcz >> 3) == tscz)
                inb = ((bcx >= 0) & (bcx < bx) & (bcy >= 0) & (bcy < by)
                       & (bcz >= 0) & (bcz < bz))
                live = inb & (tmin <= tmax)
                still = act & in_sb & live
                resumed = act & ~in_sb & live
                died = act & ~live
                return still, resumed, died

            def t_body(carry):
                (it, tcx, tcy, tcz, tact, res_i, ded_i, bt, bl) = carry
                act = tact != 0
                res = res_i != 0
                ded = ded_i != 0
                # phase A: advance lanes on EMPTY bricks (<= A_STEPS)
                for _ in range(A_STEPS):
                    occ_b = tile_occ_brick(tcx, tcy, tcz, bsel)
                    move = act & ~occ_b
                    ncx, ncy, ncz, tmin = brick_dda_step(tcx, tcy, tcz,
                                                         move)
                    still, resumed, died = in_transit_checks(
                        ncx, ncy, ncz, tmin, move)
                    res = res | resumed
                    ded = ded | died
                    act = act & (~move | still)
                    tcx, tcy, tcz = ncx, ncy, ncz
                # phase B: fine-resolve lanes on occupied bricks
                occ_b = tile_occ_brick(tcx, tcy, tcz, bsel)
                on_occ = act & occ_b
                ft, flin = fine_brick(tcx, tcy, tcz, on_occ, bsel)
                hit = on_occ & jnp.isfinite(ft)
                bt = jnp.where(hit, ft, bt)
                bl = jnp.where(hit, flin, bl)
                act = act & ~hit
                # missed occupied bricks: step past them
                move = on_occ & ~hit & act
                ncx, ncy, ncz, tmin = brick_dda_step(tcx, tcy, tcz, move)
                still, resumed, died = in_transit_checks(
                    ncx, ncy, ncz, tmin, move)
                res = res | resumed
                ded = ded | died
                act = act & (~move | still)
                tcx, tcy, tcz = ncx, ncy, ncz
                # bool vectors cannot be carried through scf.while
                # (Mosaic) — carry as int32
                return (it + 1, tcx, tcy, tcz, act.astype(jnp.int32),
                        res.astype(jnp.int32), ded.astype(jnp.int32),
                        bt, bl)

            def t_cond(carry):
                return jnp.logical_and(carry[0] < TRANSIT_CAP,
                                       jnp.any(carry[4] != 0))

            zero0 = jnp.zeros((bq, LANES), jnp.int32)
            init = (jnp.int32(0), cx, cy, cz, gate.astype(jnp.int32),
                    zero0, zero0, best_t, best_lin)
            (_, ecx, ecy, ecz, eact, _res, ded_i, best_t,
             best_lin) = jax.lax.while_loop(t_cond, t_body, init)
            # write back: gated lanes moved; hit lanes have best_t set
            hit_l = gate & jnp.isfinite(best_t)
            cx = jnp.where(gate, ecx, cx)
            cy = jnp.where(gate, ecy, cy)
            cz = jnp.where(gate, ecz, cz)
            pend = jnp.where(gate, -1, pend)
            # transit-cap leftovers (eact) stay wact=1 with pend=-1 and
            # re-pend on the next walk step (their sb is still occupied)
            # — never dropped, the outer cap is the only true bound
            dead = gate & ((ded_i != 0) | hit_l) & ~(eact != 0)
            wact = jnp.where(dead, 0, wact)
            return (cx, cy, cz, wact, pend, rescont), best_t, best_lin, \
                srv_inc

        # ---- init (grid_walk _fused_init expression shapes) ------------
        icx, icy, icz, iok = _fused_init(
            ox, oy, oz, dx, dy, dz, t_lo, tmax,
            (bx, by, bz), (ogx, ogy, ogz), bw)
        wact0 = (iok & (act_ref[:] != 0)).astype(jnp.int32)
        st0 = (icx, icy, icz, wact0,
               jnp.full((bq, LANES), -1, jnp.int32),
               jnp.zeros((bq, LANES), jnp.int32))
        bt0 = jnp.full((bq, LANES), _INF, jnp.float32)
        bl0 = jnp.full((bq, LANES), -1, jnp.int32)

        walk_unroll = WALK_UNROLL if not interp else 1
        max_walk = (bx + by + bz + 3 + walk_unroll - 1) // walk_unroll + 1

        def walk_cond(carry):
            st, w = carry
            return jnp.logical_and(
                w < max_walk,
                jnp.any((st[3] != 0) & (st[4] < 0)))

        def walk_chunk(carry):
            st, w = carry
            for _ in range(walk_unroll):
                st = walk_step_t(st) if transit else walk_step(st)
            return (st, w + 1)

        def outer_body(carry):
            st, best_t, best_lin, it, srv, wk = carry
            if transit and not interp:
                # STATIC walk chunk, no inner while: the pure-L2 walk is
                # cheap (~55 ops/step, no L1 mux) and 80% of bursts fit
                # one chunk — lanes that need more steps simply continue
                # next outer iteration (a serve with their pend unset is
                # a no-op for them).  Saves one scalar cond sync per
                # burst (~1k/frame at the full preset).
                for _ in range(walk_unroll):
                    st = walk_step_t(st)
                w_it = jnp.int32(1)
            else:
                # walk burst: until every live lane is pending or
                # retired (the while bound is per-burst; per-lane
                # termination is the DDA's own monotone t/bounds exit)
                st, w_it = jax.lax.while_loop(walk_cond, walk_chunk,
                                              (st, jnp.int32(0)))
            for _ in range(serves_per_it):
                st, best_t, best_lin, si = (
                    serve_transit(st, best_t, best_lin) if transit
                    else serve(st, best_t, best_lin))
                srv = srv + si
            return (st, best_t, best_lin, it + 1, srv, wk + w_it)

        def outer_cond(carry):
            st = carry[0]
            return jnp.logical_and(carry[3] < outer_cap,
                                   jnp.any(st[3] != 0))

        st, best_t, best_lin, it_f, srv_f, wk_f = jax.lax.while_loop(
            outer_cond, outer_body,
            (st0, bt0, bl0, jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        t_ref[:] = best_t
        lin_ref[:] = best_lin
        # alive in bit 0; per-block profile in the upper bits:
        # iterations*2^20 + serves*2^10 + walk-chunks (each saturated)
        prof = (jnp.minimum(it_f, 1023) * (1 << 20)
                + jnp.minimum(srv_f, 1023) * (1 << 10)
                + jnp.minimum(wk_f, 1023))
        alive_ref[:] = (st[3] != 0).astype(jnp.int32) + 2 * prof

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("dims", "bdims", "origin_key", "voxel_size", "bq",
                     "serves_per_it", "outer_cap_mul", "any_hit",
                     "n_serve_sb", "prof_mode", "fine_unroll",
                     "transit", "a_steps"),
)
def _mega_call(o, d, t_min, t_max, admit, coarse, l2, fine_sb, *,
               dims, bdims, origin_key, voxel_size, bq=16,
               serves_per_it=2, outer_cap_mul=32, any_hit=False,
               n_serve_sb=4, prof_mode=None, fine_unroll=13,
               transit=False, a_steps=4):
    n = o.shape[0]
    per_block = bq * LANES
    n_blocks = max(1, -(-n // per_block))
    pad = n_blocks * per_block - n

    def prep(x, fill=0):
        x = jnp.pad(x, (0, pad), constant_values=fill)
        return x.reshape(n_blocks * bq, LANES)

    bx, by, bz = bdims
    # every outer iteration with work either advances the walk 16 brick
    # steps or serves >= 1 pending superbrick; cap scaled by the walk
    # bound (a lane crosses <= bx+by+bz+3 bricks) — generous, verified
    # by the `unresolved` output
    outer_cap = outer_cap_mul * ((bx + by + bz + 3) // WALK_UNROLL + 2)

    interp = jax.default_backend() != "tpu"
    kernel = _make_mega_kernel(dims, bdims, origin_key, voxel_size, bq,
                               serves_per_it, outer_cap, any_hit, interp,
                               n_serve_sb, prof_mode, fine_unroll,
                               transit, a_steps)

    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    act = (jnp.ones((n,), jnp.int32) if admit is None
           else admit.astype(jnp.int32))

    ray_spec = pl.BlockSpec((bq, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    fine_space = pltpu.VMEM if interp else pltpu.ANY
    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[ray_spec] * 9
        + [pl.BlockSpec(coarse.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec(l2.shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec(memory_space=fine_space)],
        out_specs=[ray_spec] * 3,
        scratch_shapes=[
            pltpu.VMEM((n_serve_sb, TILE_ROWS, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((n_serve_sb,)),
        ],
    )
    t, lin, alive = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * bq, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * bq, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks * bq, LANES), jnp.int32),
        ],
        interpret=interp,
    )(prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
      prep(d[:, 0], 1.0), prep(d[:, 1], 1.0), prep(d[:, 2], 1.0),
      prep(t_min_b), prep(t_max_b), prep(act),
      coarse, l2, fine_sb)
    unpad = lambda x: x.reshape(-1)[:n]
    # alive bit 0 = lane unresolved at cap; upper bits = per-block
    # (iterations, serves, walk-chunks) profile (identical across the
    # block's lanes)
    unresolved = jnp.sum(unpad(alive) & 1)
    prof = (alive.reshape(n_blocks, -1)[:, 0] >> 1)
    return unpad(t), unpad(lin), unresolved, prof


def trace_grid_mega(origins, dirs, accel, t_min, t_max, admit=None,
                    bq=24, serves_per_it=1, n_serve_sb=3,
                    prof_mode=None, fine_unroll=0, transit=True,
                    a_steps=8, return_stats=False):
    """One-dispatch exhaustive nearest-hit trace (t, cell_lin).

    Same contract as trace_grid_fast(drain=True): t = +inf miss,
    cell_lin = -1.  `accel` must carry a fine_sb table (build_accel
    builds it).  return_stats=True additionally returns the number of
    lanes still alive at the outer cap (0 = provably exhaustive).
    """
    batch_shape = origins.shape[:-1]
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    admit_f = None if admit is None else admit.reshape(-1)
    t_min_in = jnp.asarray(t_min, jnp.float32)
    if t_min_in.ndim:
        t_min_in = t_min_in.reshape(-1)
    t_max_in = jnp.asarray(t_max, jnp.float32)
    if t_max_in.ndim:
        t_max_in = t_max_in.reshape(-1)
    t, lin, alive, prof = _mega_call(
        o, d, t_min_in, t_max_in, admit_f,
        accel.coarse, accel.l2, accel.fine_sb,
        dims=accel.dims, bdims=accel.bdims,
        origin_key=accel.origin_key, voxel_size=accel.voxel_size,
        bq=bq, serves_per_it=serves_per_it, n_serve_sb=n_serve_sb,
        prof_mode=prof_mode, fine_unroll=fine_unroll, transit=transit,
        a_steps=a_steps)
    if return_stats == "prof":
        # per-block packed (iters << 20 | serves << 10 | walk_chunks)
        return t.reshape(batch_shape), lin.reshape(batch_shape), alive, \
            prof
    if return_stats:
        return t.reshape(batch_shape), lin.reshape(batch_shape), alive
    return t.reshape(batch_shape), lin.reshape(batch_shape)
