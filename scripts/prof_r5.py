"""Round-4 profiling: shadow-pass attribution + voxelize scatter split.

Every timed number is PIPELINED (8 dispatches with varied inputs, one
sync) — per-call marginals through the axon tunnel carry a ~28 ms
dispatch floor and mispredict glue (round-3 lesson).

Stages (PROF_STAGES=A,B,C,D default A):
  A  shadow attribution: primary/shadowed frame refs, isolated any-hit,
     drain lap counts for primary trace and shadow any-hit
  B  shadow any-hit knob sweep (admit_frac / k_hits / drain_frac /
     rounds) on fixed shadow-ray inputs
  C  primary residuals: trace-only vs full frame (shading+format delta),
     raygen and gamma in isolation
  D  voxelize: full vs count_only (scatter marginal) at the bench scale

Usage (solo TPU process): JAX_PLATFORMS= python scripts/prof_r5.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    stages = os.environ.get("PROF_STAGES", "A").split(",")
    import jax
    import jax.numpy as jnp

    from voxelray_tpu.io import meshes
    from voxelray_tpu.models.grids import GridBool
    from voxelray_tpu.models.scene import build_scene
    from voxelray_tpu.ops.geometry import grid_dims, mesh_bbox
    from voxelray_tpu.ops.intersect import make_camera_rays
    from voxelray_tpu.ops.traverse_fast import (any_hit_grid_fast,
                                                trace_grid_fast)
    from voxelray_tpu.ops.voxelize import plan_voxelize, voxelize_planned
    from voxelray_tpu.render.camera import Camera, orbit_path
    from voxelray_tpu.render.pipeline import render_image

    log(f"backend={jax.default_backend()}")
    W, H = 1920, 1080
    v, f = meshes.torus_knot(2, 3, 1024, 512)
    bb_min, bb_max = mesh_bbox(v)
    extent = float(max(bb_max - bb_min))
    vs = extent / 512
    plan = plan_voxelize(v, f, vs, bb_min=bb_min, bb_max=bb_max)
    occ, _ = voxelize_planned(plan, jnp.asarray(v))
    grid = GridBool.from_occupancy(occ, bb_min, vs)
    scene = build_scene(models=None, grid=grid)
    accel = scene.accel
    center = (bb_min + bb_max) * 0.5
    r_orbit = float(np.linalg.norm(np.asarray([0.9, 0.55, -0.9]) * extent))
    K = 8
    cams = orbit_path(K, center=tuple(float(c) for c in center),
                      radius=r_orbit,
                      height=float(center[1] + 0.55 * extent))
    mats = [c.matrices(W, H)[2:] for c in cams]
    vi, pi = mats[0]

    # tiled ray sets for the K cameras (the render's layout)
    perm = np.arange(H * W, dtype=np.int32).reshape(H, W) \
        .reshape(H // 8, 8, W // 128, 128).transpose(2, 0, 1, 3) \
        .reshape(-1)
    rays = []
    for cvi, cpi in mats:
        o4, d4 = make_camera_rays(W, H, jnp.asarray(cvi), jnp.asarray(cpi))
        rays.append((o4.reshape(-1, 3)[perm], d4.reshape(-1, 3)[perm]))
    jax.block_until_ready(rays)

    def pipe(fn, inputs, reps=2):
        """fn over K varied inputs, one sync; best-of-reps per-call ms."""
        jax.block_until_ready([fn(*a) for a in inputs])
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready([fn(*a) for a in inputs])
            best = min(best, (time.perf_counter() - t0) / len(inputs))
        return best * 1e3

    def frame_inputs(shadows):
        return [(scene, cvi, cpi, shadows) for cvi, cpi in mats]

    def frame(scene, cvi, cpi, shadows):
        return render_image(scene, cvi, cpi, width=W, height=H,
                            backend="fast", shadows=shadows)

    # shadow-ray sets derived from each camera's primary results
    def shadow_sets():
        ldir = jnp.asarray([0.45, 0.8, 0.4], jnp.float32)
        ldir = ldir / jnp.linalg.norm(ldir)
        out = []
        tr = jax.jit(lambda o, d: trace_grid_fast(o, d, accel))
        for o, d in rays:
            t = tr(o, d)[0]
            hit = jnp.isfinite(t)
            p = o + d * jnp.where(hit, t, 1.0)[:, None]
            ld = jnp.broadcast_to(ldir, p.shape)
            out.append((p, ld, hit))
        jax.block_until_ready(out)
        return out

    if "A" in stages:
        ms_p = pipe(frame, frame_inputs(False))
        emit(stage="A", what="frame_primary", ms=round(ms_p, 2))
        ms_s = pipe(frame, frame_inputs(True))
        emit(stage="A", what="frame_shadowed", ms=round(ms_s, 2),
             shadow_marginal=round(ms_s - ms_p, 2))

        tr = jax.jit(lambda o, d: trace_grid_fast(o, d, accel))
        ms_t = pipe(tr, rays)
        emit(stage="A", what="trace_only", ms=round(ms_t, 2),
             shading_delta=round(ms_p - ms_t, 2))

        ssets = shadow_sets()
        ah = jax.jit(lambda p, ld, adm: any_hit_grid_fast(
            p, ld, accel, admit=adm))
        ms_a = pipe(ah, ssets)
        emit(stage="A", what="any_hit_isolated", ms=round(ms_a, 2))

        # drain laps + unresolved, primary and shadow (not timed)
        t, lin, unres, laps = jax.jit(
            lambda o, d: trace_grid_fast(o, d, accel,
                                         return_stats="full"))(*rays[0])
        emit(stage="A", what="primary_drain_stats", unresolved=int(unres),
             laps=int(laps),
             hits=int(np.isfinite(np.asarray(t)).sum()))
        p, ld, adm = ssets[0]
        t2, _, unres2, laps2 = jax.jit(
            lambda p, ld, adm: trace_grid_fast(
                p, ld, accel, admit=adm, k_hits=4, fine_frac=(1,),
                resident_frac=2, admit_frac=8,
                return_stats="full"))(p, ld, adm)
        emit(stage="A", what="shadow_drain_stats", unresolved=int(unres2),
             laps=int(laps2),
             occl=int(np.isfinite(np.asarray(t2)).sum()),
             admitted=int(np.asarray(adm).sum()))

    if "B" in stages:
        ssets = shadow_sets()
        variants = [
            ("default_af8_k4", dict()),
            ("groups_off", dict(resident_groups=False)),
            ("af4", dict(admit_frac=4)),
            ("af16", dict(admit_frac=16)),
            ("k6", dict(k_hits=6)),
            ("k8", dict(k_hits=8)),
            ("df16", dict(drain_frac=16)),
            ("dk16", dict(drain_k=16)),
            ("r2_k44", dict(rounds=2, k_hits=(4, 4), fine_frac=(1, 1))),
        ]
        for name, kv in variants:
            ah = jax.jit(lambda p, ld, adm, kv=kv: any_hit_grid_fast(
                p, ld, accel, admit=adm, **kv))
            ms = pipe(ah, ssets)
            occl = int(np.asarray(ah(*ssets[0])).sum())
            emit(stage="B", what=f"ah_{name}", ms=round(ms, 2), occl=occl)

    if "B3" in stages:
        # drain_hoist ablation (written after the last TPU run; never
        # measured): both primary and shadow run exactly 1 drain lap, so
        # hoisting lap 1 out of the outer while (whose body's
        # gather/scatter run far slower) should cut the always-paid cost
        ssets = shadow_sets()
        for dh in (0, 1, 4):
            tr = jax.jit(lambda o, d, dh=dh: trace_grid_fast(
                o, d, accel, drain_hoist=dh))
            ms = pipe(tr, rays)
            t0 = tr(*rays[0])[0]
            emit(stage="B3", what=f"trace_dh{dh}", ms=round(ms, 2),
                 hits=int(np.isfinite(np.asarray(t0)).sum()))
            ah = jax.jit(lambda p, ld, adm, dh=dh: any_hit_grid_fast(
                p, ld, accel, admit=adm, drain_hoist=dh))
            ms = pipe(ah, ssets)
            occl = int(np.asarray(ah(*ssets[0])).sum())
            emit(stage="B3", what=f"ah_dh{dh}", ms=round(ms, 2),
                 occl=occl)

    if "C" in stages:
        # raygen alone; gamma alone; trace+shade pieces
        rg = jax.jit(lambda vi, pi: sum(
            x.sum() for x in make_camera_rays(W, H, vi, pi)))
        ms = pipe(rg, [(jnp.asarray(a), jnp.asarray(b)) for a, b in mats])
        emit(stage="C", what="raygen_reduce", ms=round(ms, 2))
        from voxelray_tpu.render import shading
        imgs = [jnp.ones((H, W, 4), jnp.float32) * (0.5 + 0.01 * i)
                for i in range(K)]
        gm = jax.jit(shading.gamma_post)
        ms = pipe(gm, [(im,) for im in imgs])
        emit(stage="C", what="gamma_post", ms=round(ms, 2))

    if "E" in stages:
        # IN-FRAME shadow knob sweep (the isolated sweep's rays differ
        # from the frame's true shadow rays — point light, per-ray
        # light_dist t_max): full shadowed frame with shadow_opts.
        variants = [
            ("base", None),
            ("k6", dict(k_hits=6)),
            ("k6_af16", dict(k_hits=6, admit_frac=16)),
            ("k6_r2_rf32", dict(k_hits=(6, 8), rounds=2,
                                resident_frac=32, fine_frac=(1, 1))),
            ("k6_r3_rf32", dict(k_hits=(6, 8, 8), rounds=3,
                                resident_frac=32, fine_frac=(1, 1, 1))),
            ("k6_dk16", dict(k_hits=6, drain_k=16)),
        ]
        for name, so in variants:
            def fr(scene, cvi, cpi, so=so):
                return render_image(scene, cvi, cpi, width=W, height=H,
                                    backend="fast", shadows=True,
                                    shadow_opts=so)
            ms = pipe(fr, [(scene, cvi, cpi) for cvi, cpi in mats])
            img = np.asarray(fr(scene, *mats[0]))
            emit(stage="E", what=f"frame_{name}", ms=round(ms, 2),
                 img_mean=round(float(img.mean()), 6))

    if "E2" in stages:
        # split the in-frame shadow marginal: a frame whose any-hit is
        # stubbed to all-False keeps every shading/glue op but skips the
        # voxel any-hit machinery entirely.  (not a valid image — pure
        # attribution)
        from voxelray_tpu.models.scene import Light
        from voxelray_tpu.ops.intersect import make_camera_rays as mkrays
        from voxelray_tpu.render import shading as _sh
        from voxelray_tpu.render.pipeline import (_tile_rays, _untile_rays,
                                                  render_rays)
        light = Light()
        lp = jnp.asarray(light.position, jnp.float32)
        li = jnp.float32(light.intensity)
        lt = jnp.int32(light.type)
        cc = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)

        def stub_frame(scene, cvi, cpi):
            o4, d4 = mkrays(W, H, jnp.asarray(cvi), jnp.asarray(cpi))
            o = _tile_rays(o4, H, W)
            d = _tile_rays(d4, H, W)
            rgb = render_rays(
                scene, o, d, lp, li, lt, cc, backend="fast", shadows=True,
                any_hit_fn=lambda oo, dd, tmn, tmx:
                    jnp.zeros(oo.shape[:-1], bool))
            rgb = _untile_rays(rgb, H, W)
            rgba = jnp.concatenate(
                [rgb, jnp.ones(rgb.shape[:-1] + (1,), jnp.float32)],
                axis=-1)
            return _sh.gamma_post(rgba)
        fr = jax.jit(stub_frame, static_argnames=())
        ms = pipe(fr, [(scene, cvi, cpi) for cvi, cpi in mats])
        emit(stage="E2", what="frame_anyhit_stub", ms=round(ms, 2))

    if "F" in stages:
        # PIPELINED staged ablation of the primary trace (round-3's
        # stage H was per-call and carried dispatch noise): each stage
        # adds one pipeline piece, reduced to scalars so nothing DCEs.
        from voxelray_tpu.ops.compact import compact_mask
        from voxelray_tpu.ops.intersect import TMAX, TMIN
        from voxelray_tpu.ops.pallas.brick_fine import fine_walk_multi
        from voxelray_tpu.ops.pallas.grid_walk import coarse_walk
        from voxelray_tpu.ops.traverse_fast import BRICK, _init_state

        k_hits, chunk, fine_frac = 5, 32, 5
        bw = float(accel.voxel_size * BRICK)
        n = rays[0][0].shape[0]
        tmx = jnp.full((n,), TMAX)
        tmn = jnp.full((n,), np.float32(TMIN))
        per_block = chunk * 128
        _c = -(-n // fine_frac)
        fcap = max(per_block, -(-_c // per_block) * per_block)
        G = 8
        ng = n // G
        gcap = fcap // G

        def upto(stage):
            def fn(o, d):
                ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
                dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
                cx, cy, cz, active = _init_state(o, d, accel, tmx)
                if stage == "init":
                    return cx.sum() + cy.sum() + active.sum()
                hits, ncx, ncy, ncz, cont = coarse_walk(
                    ox, oy, oz, dx, dy, dz, cx, cy, cz,
                    active.astype(jnp.int32), tmx, accel.coarse, accel.l2,
                    bdims=accel.bdims, origin_key=accel.origin_key,
                    brick_world=bw, bq=chunk, k_hits=k_hits)
                if stage == "walk":
                    return hits[0].sum() + ncx.sum() + cont.sum()
                has = hits[0] >= 0
                has_g = has.reshape(ng, G).any(axis=1)
                gsel, glive, gsel_c, gpos = compact_mask(has_g, gcap, ng)
                lane = jnp.arange(G, dtype=jnp.int32)
                fsel = jnp.where(glive[:, None], gsel[:, None] * G + lane,
                                 n).reshape(-1)
                bricks_c = jnp.where(
                    glive[None, :, None],
                    jnp.take(hits.reshape(k_hits, ng, G), gsel_c, axis=1),
                    -1).reshape(k_hits, fcap)
                r7 = jnp.stack([ox, oy, oz, dx, dy, dz, tmx, tmn],
                               axis=1).reshape(ng, G * 8)[gsel_c] \
                    .reshape(fcap, 8)
                if stage == "compact":
                    return bricks_c.sum() + r7.sum() + fsel.sum()
                bl = jnp.maximum(bricks_c, 0).reshape(-1)
                words = jnp.take(accel.fine, bl, axis=1) \
                    .reshape(16, k_hits, fcap).transpose(1, 0, 2)
                if stage == "take":
                    return words.astype(jnp.float32).sum() \
                        + bricks_c.sum()
                t_c, lin_c = fine_walk_multi(
                    r7[:, 0], r7[:, 1], r7[:, 2], r7[:, 3], r7[:, 4],
                    r7[:, 5], bricks_c, words, r7[:, 7], r7[:, 6],
                    dims=accel.dims, bdims=accel.bdims,
                    origin_key=accel.origin_key,
                    voxel_size=accel.voxel_size, bq=chunk)
                if stage == "fine":
                    return jnp.where(jnp.isfinite(t_c), t_c, 0.0).sum() \
                        + lin_c.sum()
                t = jnp.full((n,), jnp.inf, jnp.float32).at[fsel].set(
                    t_c, mode="drop")
                lin = jnp.full((n,), -1, jnp.int32).at[fsel].set(
                    lin_c, mode="drop")
                return jnp.where(jnp.isfinite(t), t, 0.0).sum() + lin.sum()
            return jax.jit(fn)

        prev = 0.0
        for stage in ("init", "walk", "compact", "take", "fine", "out"):
            fn = upto(stage)
            ms = pipe(fn, rays)
            emit(stage="F", what=stage, ms=round(ms, 2),
                 marginal=round(ms - prev, 2))
            prev = ms
        for name, kv in [("full_k5", {}), ("k6", dict(k_hits=6)),
                         ("k7", dict(k_hits=7)),
                         ("k6_ff4", dict(k_hits=6, fine_frac=4)),
                         ("k5_dk16", dict(drain_k=16))]:
            tr = jax.jit(lambda o, d, kv=kv: trace_grid_fast(
                o, d, accel, **kv))
            ms = pipe(tr, rays)
            t0 = tr(*rays[0])[0]
            emit(stage="F", what=f"trace_{name}", ms=round(ms, 2),
                 marginal=round(ms - prev, 2),
                 hits=int(np.isfinite(np.asarray(t0)).sum()))

    if "G" in stages:
        # fine-kernel structure sweep, PIPELINED (stage F exposed the
        # fine kernel at +34 ms; every round-3 per-call sweep of these
        # knobs was invalidated by identical-input dispatch coalescing,
        # CLAUDE.md #9).  Conds model: ~10-20us per while_loop scalar
        # cond x 102 blocks x 5 slots.
        variants = [
            ("base_k5", {}),
            ("static", dict(fine_static=True)),
            ("static_bq64", dict(fine_static=True, fine_bq=64)),
            ("static_bq96", dict(fine_static=True, fine_bq=96)),
            ("ilp5", dict(fine_ilp=5)),
            ("ilp5_bq64", dict(fine_ilp=5, fine_bq=64)),
            ("unroll25", dict(fine_unroll=25)),
            ("bq96", dict(fine_bq=96)),
        ]
        for name, kv in variants:
            tr = jax.jit(lambda o, d, kv=kv: trace_grid_fast(
                o, d, accel, **kv))
            ms = pipe(tr, rays)
            t0 = tr(*rays[0])[0]
            emit(stage="G", what=f"trace_{name}", ms=round(ms, 2),
                 hits=int(np.isfinite(np.asarray(t0)).sum()))

    if "G2" in stages:
        # winner combos into the full frame (primary + shadowed)
        import json as _json
        opts = _json.loads(os.environ.get(
            "PROF_G2_OPTS", '{"fine_static": true, "fine_bq": 96}'))
        for shadows in (False, True):
            def fr(scene, cvi, cpi, shadows=shadows):
                return render_image(scene, cvi, cpi, width=W, height=H,
                                    backend="fast", shadows=shadows,
                                    fast_opts=opts,
                                    shadow_opts=opts if shadows else None)
            ms = pipe(fr, [(scene, cvi, cpi) for cvi, cpi in mats])
            emit(stage="G2", what=f"frame_shadows{int(shadows)}",
                 opts=opts, ms=round(ms, 2))

    if "H" in stages:
        # ISOLATED fine_walk_multi: build the real post-compaction fine
        # inputs once per camera (coarse walk + group compaction + word
        # gather, not timed), then time ONLY the pallas call — splits
        # the F-stage "fine +34 ms" into kernel vs surrounding glue
        # (transposes, gather, layout).  An all-dead variant (bricks=-1)
        # gives the fixed dispatch+DMA floor.
        from voxelray_tpu.ops.compact import compact_mask
        from voxelray_tpu.ops.intersect import TMAX, TMIN
        from voxelray_tpu.ops.pallas.brick_fine import fine_walk_multi
        from voxelray_tpu.ops.pallas.grid_walk import coarse_walk
        from voxelray_tpu.ops.traverse_fast import BRICK, _init_state

        k_hits, chunk, fine_frac = 5, 32, 5
        bw = float(accel.voxel_size * BRICK)
        n = rays[0][0].shape[0]
        tmx = jnp.full((n,), TMAX)
        tmn = jnp.full((n,), np.float32(TMIN))
        per_block = chunk * 128
        _c = -(-n // fine_frac)
        fcap = max(per_block, -(-_c // per_block) * per_block)
        G = 8
        ng = n // G
        gcap = fcap // G

        @jax.jit
        def fine_inputs(o, d):
            ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
            dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
            cx, cy, cz, active = _init_state(o, d, accel, tmx)
            hits, *_ = coarse_walk(
                ox, oy, oz, dx, dy, dz, cx, cy, cz,
                active.astype(jnp.int32), tmx, accel.coarse, accel.l2,
                bdims=accel.bdims, origin_key=accel.origin_key,
                brick_world=bw, bq=chunk, k_hits=k_hits)
            has = hits[0] >= 0
            has_g = has.reshape(ng, G).any(axis=1)
            gsel, glive, gsel_c, _ = compact_mask(has_g, gcap, ng)
            bricks_c = jnp.where(
                glive[None, :, None],
                jnp.take(hits.reshape(k_hits, ng, G), gsel_c, axis=1),
                -1).reshape(k_hits, fcap)
            r7 = jnp.stack([ox, oy, oz, dx, dy, dz, tmx, tmn],
                           axis=1).reshape(ng, G * 8)[gsel_c] \
                .reshape(fcap, 8)
            bl = jnp.maximum(bricks_c, 0).reshape(-1)
            words = jnp.take(accel.fine, bl, axis=1) \
                .reshape(16, k_hits, fcap).transpose(1, 0, 2)
            return r7, bricks_c, words

        fins = [fine_inputs(o, d) for o, d in rays]
        jax.block_until_ready(fins)
        n_has = int((np.asarray(fins[0][1][0]) >= 0).sum())
        emit(stage="H", what="inputs", fcap=int(fcap),
             slot0_live=n_has)

        def mk(kv):
            def fn(r7, bricks_c, words):
                t_c, lin_c = fine_walk_multi(
                    r7[:, 0], r7[:, 1], r7[:, 2], r7[:, 3], r7[:, 4],
                    r7[:, 5], bricks_c, words, r7[:, 7], r7[:, 6],
                    dims=accel.dims, bdims=accel.bdims,
                    origin_key=accel.origin_key,
                    voxel_size=accel.voxel_size, **kv)
                return jnp.where(jnp.isfinite(t_c), t_c, 0.0).sum() \
                    + lin_c.sum()
            return jax.jit(fn)

        for name, kv in [("bq32", dict(bq=32)),
                         ("bq32_ilp5", dict(bq=32, ilp=5))]:
            fn = mk(kv)
            ms = pipe(fn, fins)
            emit(stage="H", what=f"fine_{name}", ms=round(ms, 2))
        # fixed floor: identical shapes, every slot dead
        dead = [(r7, jnp.full_like(b, -1), w) for r7, b, w in fins]
        jax.block_until_ready(dead)
        fn = mk(dict(bq=32))
        ms = pipe(fn, dead)
        emit(stage="H", what="fine_bq32_alldead", ms=round(ms, 2))

        # the words GATHER alone (H showed kernel+transpose = 4.6 ms of
        # the staged fine +34 ms -> the jnp.take from accel.fine is the
        # real cost, priced per index)
        def gat(bricks_c):
            bl = jnp.maximum(bricks_c, 0).reshape(-1)
            return jnp.take(accel.fine, bl, axis=1) \
                .astype(jnp.uint32).sum().astype(jnp.float32)
        fn = jax.jit(gat)
        ms = pipe(fn, [(b,) for _, b, _ in fins])
        emit(stage="H", what="words_take_only", ms=round(ms, 2),
             n_indices=int(k_hits * fcap))
        # row-major fine table: gather (idx, 16) ROWS instead of columns
        fine_rows = jnp.asarray(accel.fine).T.copy()
        jax.block_until_ready(fine_rows)

        def gat_rows(bricks_c):
            bl = jnp.maximum(bricks_c, 0).reshape(-1)
            return jnp.take(fine_rows, bl, axis=0) \
                .astype(jnp.uint32).sum().astype(jnp.float32)
        fn = jax.jit(gat_rows)
        ms = pipe(fn, [(b,) for _, b, _ in fins])
        emit(stage="H", what="words_take_rows", ms=round(ms, 2))
        # slot-0-only gather (the two-phase fine design's phase-A cost)
        def gat0(bricks_c):
            bl = jnp.maximum(bricks_c[0], 0)
            return jnp.take(fine_rows, bl, axis=0) \
                .astype(jnp.uint32).sum().astype(jnp.float32)
        fn = jax.jit(gat0)
        ms = pipe(fn, [(b,) for _, b, _ in fins])
        emit(stage="H", what="words_take_slot0_rows", ms=round(ms, 2))

    if "I" in stages:
        # slot-resolve curve: fraction of rays resolved using only the
        # first s slots — sizes the two-phase fine design (phase A =
        # slot 0 for everyone; phase B = remaining slots for survivors)
        from voxelray_tpu.ops.compact import compact_mask
        from voxelray_tpu.ops.intersect import TMAX, TMIN
        from voxelray_tpu.ops.pallas.brick_fine import fine_walk_multi
        from voxelray_tpu.ops.pallas.grid_walk import coarse_walk
        from voxelray_tpu.ops.traverse_fast import BRICK, _init_state

        k_hits, chunk, fine_frac = 5, 32, 5
        bw = float(accel.voxel_size * BRICK)
        n = rays[0][0].shape[0]
        tmx = jnp.full((n,), TMAX)
        tmn = jnp.full((n,), np.float32(TMIN))
        per_block = chunk * 128
        _c = -(-n // fine_frac)
        fcap = max(per_block, -(-_c // per_block) * per_block)
        G = 8
        ng = n // G
        gcap = fcap // G

        @jax.jit
        def slot_stats(o, d):
            ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
            dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
            cx, cy, cz, active = _init_state(o, d, accel, tmx)
            hits, *_ = coarse_walk(
                ox, oy, oz, dx, dy, dz, cx, cy, cz,
                active.astype(jnp.int32), tmx, accel.coarse, accel.l2,
                bdims=accel.bdims, origin_key=accel.origin_key,
                brick_world=bw, bq=chunk, k_hits=k_hits)
            has = hits[0] >= 0
            has_g = has.reshape(ng, G).any(axis=1)
            gsel, glive, gsel_c, _ = compact_mask(has_g, gcap, ng)
            bricks_c = jnp.where(
                glive[None, :, None],
                jnp.take(hits.reshape(k_hits, ng, G), gsel_c, axis=1),
                -1).reshape(k_hits, fcap)
            r7 = jnp.stack([ox, oy, oz, dx, dy, dz, tmx, tmn],
                           axis=1).reshape(ng, G * 8)[gsel_c] \
                .reshape(fcap, 8)
            bl = jnp.maximum(bricks_c, 0).reshape(-1)
            words = jnp.take(accel.fine, bl, axis=1) \
                .reshape(16, k_hits, fcap).transpose(1, 0, 2)
            t5, _ = fine_walk_multi(
                r7[:, 0], r7[:, 1], r7[:, 2], r7[:, 3], r7[:, 4],
                r7[:, 5], bricks_c, words, r7[:, 7], r7[:, 6],
                dims=accel.dims, bdims=accel.bdims,
                origin_key=accel.origin_key,
                voxel_size=accel.voxel_size, bq=chunk)
            t1, _ = fine_walk_multi(
                r7[:, 0], r7[:, 1], r7[:, 2], r7[:, 3], r7[:, 4],
                r7[:, 5], bricks_c[:1], words[:1], r7[:, 7], r7[:, 6],
                dims=accel.dims, bdims=accel.bdims,
                origin_key=accel.origin_key,
                voxel_size=accel.voxel_size, bq=chunk)
            live0 = bricks_c[0] >= 0
            live_s = [(bricks_c[s] >= 0).sum() for s in range(k_hits)]
            res5 = jnp.isfinite(t5)
            res1 = jnp.isfinite(t1)
            # survivors needing phase B: live at slot 0, unresolved by
            # slot 0, and with at least one more slot
            surv = live0 & ~res1 & (bricks_c[1] >= 0)
            return (jnp.stack([x.astype(jnp.int32) if x.ndim == 0
                               else x.sum() for x in live_s]),
                    res5.sum(), res1.sum(), surv.sum())
        ls, r5_, r1_, sv = slot_stats(*rays[0])
        emit(stage="I", what="slot_resolve",
             live_per_slot=[int(x) for x in np.asarray(ls)],
             resolved_k5=int(r5_), resolved_slot0_only=int(r1_),
             phaseB_survivors=int(sv), fcap=int(fcap))

    if "J" in stages:
        # drain attribution (H/I round-4 finding: take+fine isolated =
        # 13 ms, staged-F's "fine +34 ms" was an XLA-fusion artifact;
        # the unaccounted ~18 ms of the 52.7 ms default trace points at
        # the drain).  drain=False is NOT exhaustive — attribution only.
        ssets = shadow_sets()
        # (first J run measured: default 53.1, nodrain 49.2 — drain costs
        # only ~4 ms; cont1_k8 70, cont1_k12 64, cont2_k8 75, dfrac16 144
        # — all mini-round/drain-domain variants lose)
        variants = [
            ("dfrac128", dict(drain_hoist=0, drain_frac=128)),
            ("dk16", dict(drain_hoist=0, drain_k=16)),
            ("ff8", dict(drain_hoist=0, fine_frac=8)),
            ("ff8_cont1", dict(drain_hoist=0, fine_frac=8,
                               cont_rounds=1, cont_k=8)),
            ("k4", dict(drain_hoist=0, k_hits=4, fine_frac=4)),
            ("k3", dict(drain_hoist=0, k_hits=3, fine_frac=3)),
        ]
        for name, kv in variants:
            tr = jax.jit(lambda o, d, kv=kv: trace_grid_fast(
                o, d, accel, return_stats=True, **kv))
            ms = pipe(tr, rays)
            t0, _, unres = tr(*rays[0])
            emit(stage="J", what=f"trace_{name}", ms=round(ms, 2),
                 hits=int(np.isfinite(np.asarray(t0)).sum()),
                 unresolved=int(unres))
        # width scaling: fixed overhead vs width-proportional split (the
        # ~20 ms gap between staged-component sums and the whole trace)
        for frac, name in ((2, "half"), (4, "quarter")):
            m = (H * W) // frac
            rays_f = [(o[:m], d[:m]) for o, d in rays]
            tr = jax.jit(lambda o, d: trace_grid_fast(o, d, accel))
            ms = pipe(tr, rays_f)
            t0 = tr(*rays_f[0])[0]
            emit(stage="J", what=f"trace_{name}", ms=round(ms, 2),
                 hits=int(np.isfinite(np.asarray(t0)).sum()))
        # shadow any-hit drain attribution (same idea; occl must match
        # 42567 except nodrain)
        for name, kv in [
            ("default", dict(drain_hoist=0)),
            ("nodrain", dict(drain_hoist=0, drain=False)),
            ("cont1_k8", dict(drain_hoist=0, cont_rounds=1, cont_k=8)),
            ("cont2_k8", dict(drain_hoist=0, cont_rounds=2, cont_k=8,
                              cont_frac=8)),
            ("k6_cont1", dict(drain_hoist=0, k_hits=6, cont_rounds=1,
                              cont_k=8)),
        ]:
            kh = kv.pop("k_hits", 4)

            def ah(p, ld, adm, kv=kv, kh=kh):
                t, _, unres = trace_grid_fast(
                    p, ld, accel, admit=adm, k_hits=kh,
                    fine_frac=(1,), resident_frac=2, admit_frac=8,
                    return_stats=True, **kv)
                return jnp.isfinite(t), unres
            fn = jax.jit(ah)
            ms = pipe(fn, ssets)
            occ0, unres = fn(*ssets[0])
            emit(stage="J", what=f"ah_{name}", ms=round(ms, 2),
                 occl=int(np.asarray(occ0).sum()), unresolved=int(unres))

    if "E5" in stages:
        # Round-4 second wave.  Isolated: self_admit round-1 compaction
        # (only ~20% of rays enter the grid bbox at the bench
        # viewpoints) x fine_frac; then IN-FRAME confirmation of the
        # isolated winners (E taught: in-frame is the only truth for
        # shadow knobs).
        iso = [
            ("ff8", dict(fine_frac=8)),
            ("ff10", dict(fine_frac=10)),
            ("ff12", dict(fine_frac=12)),
            ("sa4_ff1", dict(self_admit=True, admit_frac=4,
                             fine_frac=(1,))),
            ("sa4_ff2", dict(self_admit=True, admit_frac=4,
                             fine_frac=(2,))),
            ("sa2_ff4", dict(self_admit=True, admit_frac=2,
                             fine_frac=(4,))),
        ]
        for name, kv in iso:
            tr = jax.jit(lambda o, d, kv=kv: trace_grid_fast(
                o, d, accel, return_stats=True, **kv))
            ms = pipe(tr, rays)
            t0, _, unres = tr(*rays[0])
            emit(stage="E5", what=f"trace_{name}", ms=round(ms, 2),
                 hits=int(np.isfinite(np.asarray(t0)).sum()),
                 unresolved=int(unres))

        frames = [
            ("base", None, None, True),
            ("prim_ff8", dict(fine_frac=8), None, False),
            ("prim_sa4_ff2", dict(self_admit=True, admit_frac=4,
                                  fine_frac=[2]), None, False),
            ("sh_nodrain", None, dict(drain=False), True),
            ("sh_df128", None, dict(drain_frac=128), True),
            ("sh_r2_rf128", None, dict(rounds=2, k_hits=[4, 8],
                                       resident_frac=128,
                                       fine_frac=[1, 1]), True),
            ("ff8_both", dict(fine_frac=8), None, True),
        ]
        for name, fo, so, sh in frames:
            def fr(scene, cvi, cpi, fo=fo, so=so, sh=sh):
                return render_image(scene, cvi, cpi, width=W, height=H,
                                    backend="fast", shadows=sh,
                                    fast_opts=fo, shadow_opts=so)
            ms = pipe(fr, [(scene, cvi, cpi) for cvi, cpi in mats])
            img = np.asarray(fr(scene, *mats[0]))
            emit(stage="E5", what=f"frame_{name}", ms=round(ms, 2),
                 img_mean=round(float(img.mean()), 6))

    if "K2" in stages:
        # SURGICAL attribution of the ff8 trace (round-4: isolated
        # components sum to ~35 of the measured 46.5 ms — find the
        # missing ~11).  Re-implements the round-1 ff8 body with each
        # stage replaceable by a shape-identical INPUT (so XLA cannot
        # dead-code the downstream): timing deltas between variants
        # attribute stages IN CONTEXT, same dataflow, no staging
        # materialization artifacts.  Results are not images — timing
        # only (kill_* variants change values, never shapes).
        import functools as _ft

        from voxelray_tpu.ops.compact import compact_mask
        from voxelray_tpu.ops.pallas.brick_fine import fine_walk_multi
        from voxelray_tpu.ops.pallas.grid_walk import LANES, coarse_walk
        from voxelray_tpu.ops.traverse_fast import (BRICK, _init_state,
                                                    _tuned_chunk)

        n = H * W
        k_hits = 5
        chunk = _tuned_chunk(accel, 64)
        per_block = chunk * LANES
        need = -(-n // 8)                       # fine_frac=8
        fcap = -(-need // per_block) * per_block
        G = 8
        ng = n // G
        gcap = fcap // G
        bdims = accel.bdims
        bx, by, bz = bdims
        vs = accel.voxel_size
        bw = float(vs * BRICK)
        t_min = jnp.float32(0.001)
        t_max = jnp.float32(10000.0)

        def k2_trace(o, d, hits_in=None, words_in=None,
                     kill_walk=False, kill_take=False, kill_fine=False,
                     kill_compact=False, kill_out=False):
            cx, cy, cz, active = _init_state(o, d, accel, t_max)
            ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
            dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
            tmx = jnp.broadcast_to(t_max, (n,))
            tmn = jnp.broadcast_to(t_min, (n,))
            if kill_walk:
                hits = hits_in
                cont = jnp.zeros((n,), jnp.int32)
            else:
                hits, ncx, ncy, ncz, cont = coarse_walk(
                    ox, oy, oz, dx, dy, dz, cx, cy, cz,
                    active.astype(jnp.int32), tmx, accel.coarse, accel.l2,
                    bdims=bdims, origin_key=accel.origin_key,
                    brick_world=bw, bq=chunk, k_hits=k_hits)
            has = hits[0] >= 0
            if kill_compact:
                # fixed strided selection: no cumsum, no sel scatter
                gsel_c = jnp.arange(gcap, dtype=jnp.int32) * (ng // gcap)
                glive = jnp.ones((gcap,), bool)
            else:
                has_g = has.reshape(ng, G).any(axis=1)
                gsel, glive, gsel_c, gpos = compact_mask(has_g, gcap, ng)
            lane = jnp.arange(G, dtype=jnp.int32)
            flive = jnp.broadcast_to(glive[:, None], (gcap, G)).reshape(-1)
            bricks_c = jnp.where(
                glive[None, :, None],
                jnp.take(hits.reshape(k_hits, ng, G), gsel_c, axis=1),
                -1).reshape(k_hits, fcap)
            r7 = jnp.stack([ox, oy, oz, dx, dy, dz, tmx, tmn], axis=1) \
                .reshape(ng, G * 8)[gsel_c].reshape(fcap, 8)
            if kill_take:
                # words from input: the (16, k*fcap) gather replaced
                words = words_in
            else:
                bl = jnp.maximum(bricks_c, 0).reshape(-1)
                words = jnp.take(accel.fine, bl, axis=1) \
                    .reshape(16, k_hits, fcap).transpose(1, 0, 2)
            if kill_fine:
                # consume words + bricks with cheap vector math (keeps
                # both live; no Pallas dispatch).  With kill_take too,
                # no words exist — consume bricks only.
                if kill_take and words_in is None:
                    wsum = bricks_c.sum(axis=0)
                else:
                    wsum = words.sum(axis=(0, 1)).astype(jnp.int32)
                t_c = jnp.where((bricks_c[0] >= 0) & (wsum > 0),
                                jnp.float32(1.0), jnp.inf)
                lin_c = jnp.where(jnp.isfinite(t_c), wsum, -1)
            else:
                t_c, lin_c = fine_walk_multi(
                    r7[:, 0], r7[:, 1], r7[:, 2], r7[:, 3], r7[:, 4],
                    r7[:, 5], bricks_c, words, r7[:, 7], r7[:, 6],
                    dims=accel.dims, bdims=bdims,
                    origin_key=accel.origin_key, voxel_size=vs, bq=32,
                    unroll=13)
            if kill_out:
                # skip the fcap->n result scatters; pad to full width
                # with a reshape-free concat so outputs keep (n,) shape
                t = jnp.concatenate(
                    [t_c, jnp.full((n - fcap,), jnp.inf, jnp.float32)])
                lin = jnp.concatenate(
                    [lin_c, jnp.full((n - fcap,), -1, jnp.int32)])
                return t, lin
            if kill_compact:
                fsel = (gsel_c[:, None] * G + lane).reshape(-1)
            else:
                fsel = jnp.where(glive[:, None], gsel[:, None] * G + lane,
                                 n).reshape(-1)
            # FULL outputs (a reduction consumer lets XLA fold the
            # scatters away — the first K2 run's 26.8 ms "full" was
            # exactly that artifact)
            t = jnp.full((n,), jnp.inf, jnp.float32).at[fsel].set(
                t_c, mode="drop")
            lin = jnp.full((n,), -1, jnp.int32).at[fsel].set(
                lin_c, mode="drop")
            return t, lin

        # REAL stand-in inputs captured per frame (shape-identical AND
        # work-identical downstream — constants would skew the candidate
        # population the killed stage feeds)
        @jax.jit
        def cap_hits(o, d):
            cx, cy, cz, active = _init_state(o, d, accel, t_max)
            hits, *_ = coarse_walk(
                o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                cx, cy, cz, active.astype(jnp.int32),
                jnp.broadcast_to(t_max, (n,)), accel.coarse, accel.l2,
                bdims=bdims, origin_key=accel.origin_key,
                brick_world=bw, bq=chunk, k_hits=k_hits)
            return hits

        @jax.jit
        def cap_words(hits):
            has_g = (hits[0] >= 0).reshape(ng, G).any(axis=1)
            _, glive, gsel_c, _ = compact_mask(has_g, gcap, ng)
            bricks_c = jnp.where(
                glive[None, :, None],
                jnp.take(hits.reshape(k_hits, ng, G), gsel_c, axis=1),
                -1).reshape(k_hits, fcap)
            bl = jnp.maximum(bricks_c, 0).reshape(-1)
            return jnp.take(accel.fine, bl, axis=1) \
                .reshape(16, k_hits, fcap).transpose(1, 0, 2)

        hits_const = [cap_hits(o, d) for o, d in rays]
        words_const = [cap_words(h) for h in hits_const]
        jax.block_until_ready([hits_const, words_const])

        variants = [
            ("full", dict()),
            ("kill_walk", dict(kill_walk=True)),
            ("kill_take", dict(kill_take=True)),
            ("kill_fine", dict(kill_fine=True)),
            ("kill_take_fine", dict(kill_take=True, kill_fine=True)),
            ("kill_compact", dict(kill_compact=True)),
            ("kill_out", dict(kill_out=True)),
        ]
        for name, kv in variants:
            if kv.get("kill_walk"):
                fn = jax.jit(_ft.partial(k2_trace, **kv))
                inputs = [(o, d, h) for (o, d), h in zip(rays, hits_const)]
            elif kv.get("kill_take") and not kv.get("kill_fine"):
                fn = jax.jit(lambda o, d, w, kv=kv: k2_trace(
                    o, d, words_in=w, **kv))
                inputs = [(o, d, w) for (o, d), w in zip(rays, words_const)]
            else:
                fn = jax.jit(_ft.partial(k2_trace, **kv))
                inputs = rays
            ms = pipe(fn, inputs)
            emit(stage="K2", what=name, ms=round(ms, 2))

    if "K3" in stages:
        # K2's replicated core (init+walk+compact+take+fine+out) runs
        # 26.7 ms vs production's 46.5 at identical ff8/k5 — split the
        # ~16 ms of "extras": drain load at ff8 (overflow population
        # grew vs ff5), stats, rewind/ovf glue.
        variants = [
            ("ff8_stats_full", dict(), "full"),
            ("ff8_nodrain", dict(drain=False), True),
            ("ff6", dict(fine_frac=6), "full"),
            ("ff8_df32", dict(drain_frac=32), "full"),
            ("ff8_dh2", dict(drain_hoist=2), True),
        ]
        for name, kv, stats in variants:
            tr = jax.jit(lambda o, d, kv=kv, stats=stats: trace_grid_fast(
                o, d, accel, return_stats=stats, **kv))
            ms = pipe(tr, rays)
            out = tr(*rays[0])
            rec = dict(stage="K3", what=f"trace_{name}", ms=round(ms, 2),
                       hits=int(np.isfinite(np.asarray(out[0])).sum()),
                       unresolved=int(out[2]))
            if stats == "full":
                rec["laps"] = int(out[3])
            emit(**rec)

    if "K4" in stages:
        # (a) off_unsafe: no drain with the caller's ff RESPECTED (K3
        # taught drain=False forces the final round to ff1 — every
        # earlier nodrain comparison measured a different pipeline);
        # (b) pre-drain populations (debug stats) at ff8 vs ff5;
        # (c) the chained admit->drain shadow numbers (e08e3db landed
        # CPU-green but unmeasured on chip).
        variants = [
            ("ff8_drain", dict(), "debug"),
            ("ff8_offunsafe", dict(drain="off_unsafe"), True),
            ("ff5_drain", dict(fine_frac=5), "debug"),
        ]
        for name, kv, stats in variants:
            tr = jax.jit(lambda o, d, kv=kv, stats=stats: trace_grid_fast(
                o, d, accel, return_stats=stats, **kv))
            ms = pipe(tr, rays)
            out = tr(*rays[0])
            rec = dict(stage="K4", what=f"trace_{name}", ms=round(ms, 2),
                       hits=int(np.isfinite(np.asarray(out[0])).sum()),
                       unresolved=int(out[2]))
            if stats == "debug":
                rec["laps"] = int(out[3])
                rec["pre_drain"] = int(out[4])
            emit(**rec)

        ssets = shadow_sets()
        ah = jax.jit(lambda p, ld, adm: any_hit_grid_fast(
            p, ld, accel, admit=adm))
        ms = pipe(ah, ssets)
        occl = int(np.asarray(ah(*ssets[0])).sum())
        emit(stage="K4", what="ah_chained", ms=round(ms, 2), occl=occl)
        p, ld, adm = ssets[0]
        out = jax.jit(lambda p, ld, adm: trace_grid_fast(
            p, ld, accel, admit=adm, k_hits=4, fine_frac=(1,),
            resident_frac=2, admit_frac=8,
            return_stats="debug"))(p, ld, adm)
        emit(stage="K4", what="shadow_chained_stats",
             unresolved=int(out[2]), laps=int(out[3]),
             pre_drain=int(out[4]),
             occl=int(np.isfinite(np.asarray(out[0])).sum()))

        for name, sh in (("primary", False), ("shadowed", True)):
            def fr(scene, cvi, cpi, sh=sh):
                return render_image(scene, cvi, cpi, width=W, height=H,
                                    backend="fast", shadows=sh)
            ms = pipe(fr, [(scene, cvi, cpi) for cvi, cpi in mats])
            img = np.asarray(fr(scene, *mats[0]))
            emit(stage="K4", what=f"frame_{name}", ms=round(ms, 2),
                 img_mean=round(float(img.mean()), 6))

    if "K5" in stages:
        # Drain anatomy at ff8 (K4: drain costs 19.5 ms for 16356
        # stragglers — 42% of the trace for 0.8% of rays).  (a) inner
        # while iteration count (each iteration pays an in-while
        # k x cap_d gather + a pallas dispatch); (b) drain_frac/drain_k
        # sweep AT ff8 (earlier df sweeps ran at ff5 and measured a
        # different pipeline).
        variants = [
            ("ff8_df64_dk8", dict()),
            ("ff8_df128_dk8", dict(drain_frac=128)),
            ("ff8_df256_dk8", dict(drain_frac=256)),
            ("ff8_df64_dk16", dict(drain_k=16)),
            ("ff8_df128_dk16", dict(drain_frac=128, drain_k=16)),
            ("ff8_df64_dk4", dict(drain_k=4)),
        ]
        for name, kv in variants:
            tr = jax.jit(lambda o, d, kv=kv: trace_grid_fast(
                o, d, accel, return_stats="debug", **kv))
            ms = pipe(tr, rays)
            out = tr(*rays[0])
            emit(stage="K5", what=f"trace_{name}", ms=round(ms, 2),
                 hits=int(np.isfinite(np.asarray(out[0])).sum()),
                 unresolved=int(out[2]), laps=int(out[3]),
                 pre_drain=int(out[4]), inner_its=int(out[5]))

        # shadow chained drain inner iterations
        ssets = shadow_sets()
        p, ld, adm = ssets[0]
        out = jax.jit(lambda p, ld, adm: trace_grid_fast(
            p, ld, accel, admit=adm, k_hits=4, fine_frac=(1,),
            resident_frac=2, admit_frac=8,
            return_stats="debug"))(p, ld, adm)
        emit(stage="K5", what="shadow_chained_stats",
             unresolved=int(out[2]), laps=int(out[3]),
             pre_drain=int(out[4]), inner_its=int(out[5]))

    if "K6" in stages:
        # Straggler decay probe: cap the drain's inner while at N
        # iterations (drain_max_iters, profiling-only) and read the
        # surviving population off `unresolved`.  The ms series also
        # gives the true per-inner-iteration marginal cost.
        for cap in (1, 2, 3, 4, 6, 8, 12, 16):
            tr = jax.jit(lambda o, d, cap=cap: trace_grid_fast(
                o, d, accel, drain_max_iters=cap, return_stats="debug"))
            ms = pipe(tr, rays)
            out = tr(*rays[0])
            emit(stage="K6", what=f"decay_cap{cap}", ms=round(ms, 2),
                 surviving=int(out[2]), pre_drain=int(out[4]),
                 inner_its=int(out[5]))

    if "K7" in stages:
        # Restructured drain (cap-local while carries + straight-line
        # lap 1): trace at ff8, drain_hoist unroll sweep, chained
        # shadow, and the two frame headlines.
        for name, kv in (("ff8", dict()), ("ff8_dh1", dict(drain_hoist=1)),
                         ("ff8_dh2", dict(drain_hoist=2)),
                         ("ff8_dh3", dict(drain_hoist=3))):
            tr = jax.jit(lambda o, d, kv=kv: trace_grid_fast(
                o, d, accel, return_stats="debug", **kv))
            ms = pipe(tr, rays)
            out = tr(*rays[0])
            emit(stage="K7", what=f"trace_{name}", ms=round(ms, 2),
                 hits=int(np.isfinite(np.asarray(out[0])).sum()),
                 unresolved=int(out[2]), laps=int(out[3]),
                 pre_drain=int(out[4]), inner_its=int(out[5]))

        ssets = shadow_sets()
        ah = jax.jit(lambda p, ld, adm: any_hit_grid_fast(
            p, ld, accel, admit=adm))
        ms = pipe(ah, ssets)
        occl = int(np.asarray(ah(*ssets[0])).sum())
        emit(stage="K7", what="ah_chained", ms=round(ms, 2), occl=occl)

        for name, sh in (("primary", False), ("shadowed", True)):
            def fr(scene, cvi, cpi, sh=sh):
                return render_image(scene, cvi, cpi, width=W, height=H,
                                    backend="fast", shadows=sh)
            ms = pipe(fr, [(scene, cvi, cpi) for cvi, cpi in mats])
            img = np.asarray(fr(scene, *mats[0]))
            emit(stage="K7", what=f"frame_{name}", ms=round(ms, 2),
                 img_mean=round(float(img.mean()), 6))

    if "K8" in stages:
        # self_admit RE-MEASUREMENT post-chaining (the pre-chaining loss
        # was attributed to ~6 full-width write-back scatters — exactly
        # what the chained admit->drain path removed).  Only ~20% of
        # bench rays enter the grid bbox, so a compacted round-1 should
        # now keep its 5x domain shrink without the scatter tax.
        for name, kv in (("sa_af4", dict(self_admit=True)),
                         ("sa_af2", dict(self_admit=True, admit_frac=2)),
                         ("sa_af8", dict(self_admit=True, admit_frac=8))):
            tr = jax.jit(lambda o, d, kv=kv: trace_grid_fast(
                o, d, accel, return_stats="debug", **kv))
            ms = pipe(tr, rays)
            out = tr(*rays[0])
            emit(stage="K8", what=f"trace_{name}", ms=round(ms, 2),
                 hits=int(np.isfinite(np.asarray(out[0])).sum()),
                 unresolved=int(out[2]), laps=int(out[3]),
                 pre_drain=int(out[4]), inner_its=int(out[5]))

        fo = (("self_admit", True),)
        for name, sh in (("primary_sa", False), ("shadowed_sa", True)):
            def fr(scene, cvi, cpi, sh=sh, fo=fo):
                return render_image(scene, cvi, cpi, width=W, height=H,
                                    backend="fast", shadows=sh,
                                    fast_opts=dict(fo))
            ms = pipe(fr, [(scene, cvi, cpi) for cvi, cpi in mats])
            img = np.asarray(fr(scene, *mats[0]))
            emit(stage="K8", what=f"frame_{name}", ms=round(ms, 2),
                 img_mean=round(float(img.mean()), 6))

    if "K9" in stages:
        # K8 post-mortem: self_admit lost NOT on scatters (chained) but
        # because fine_frac prices off the COMPACTED width — ff8 at
        # cap=n/4 gave a 65k fine buffer vs the ~150k+ candidate
        # population (pre_drain 16k -> 121k, laps 4).  Hold the ABSOLUTE
        # fine capacity at the default's 260k by pairing self_admit with
        # a proportionally smaller ff.
        for name, kv in (
                ("sa_af4_ff2", dict(self_admit=True, fine_frac=2)),
                ("sa_af4_ff4", dict(self_admit=True, fine_frac=4))):
            tr = jax.jit(lambda o, d, kv=kv: trace_grid_fast(
                o, d, accel, return_stats="debug", **kv))
            ms = pipe(tr, rays)
            out = tr(*rays[0])
            emit(stage="K9", what=f"trace_{name}", ms=round(ms, 2),
                 hits=int(np.isfinite(np.asarray(out[0])).sum()),
                 unresolved=int(out[2]), laps=int(out[3]),
                 pre_drain=int(out[4]), inner_its=int(out[5]))

        fo = (("self_admit", True), ("fine_frac", 2))
        for name, sh in (("primary_sa2", False), ("shadowed_sa2", True)):
            def fr(scene, cvi, cpi, sh=sh, fo=fo):
                return render_image(scene, cvi, cpi, width=W, height=H,
                                    backend="fast", shadows=sh,
                                    fast_opts=dict(fo))
            ms = pipe(fr, [(scene, cvi, cpi) for cvi, cpi in mats])
            img = np.asarray(fr(scene, *mats[0]))
            emit(stage="K9", what=f"frame_{name}", ms=round(ms, 2),
                 img_mean=round(float(img.mean()), 6))

    if "S" in stages:
        # gate for the sort+paint voxelize design: lax.sort cost on the
        # FULL padded lin stream (misses = n_cells sentinel sort to the
        # tail), plus the stream materialization cost
        from voxelray_tpu.ops.voxelize import _chunk_hits
        nxd, nyd, nzd = plan.dims
        n_cells = nxd * nyd * nzd
        vsf = jnp.float32(plan.voxel_size)
        halff = jnp.float32(plan.voxel_size * 0.5)
        orgd = jnp.asarray(plan.origin, jnp.float32)
        vdevs = [jnp.asarray(v) * (1.0 + 1e-6 * i) for i in range(6)]
        jax.block_until_ready(vdevs)

        def lin_stream(vd):
            tri_all = vd[plan.faces_sorted]
            parts = []
            for off, cnt, win, chunk in plan.layout:
                tri = jax.lax.slice_in_dim(tri_all, off, off + cnt)
                f_total = tri.shape[0]
                n_chunks = max(1, -(-f_total // chunk))
                padn = n_chunks * chunk - f_total
                trip = jnp.pad(tri, ((0, padn), (0, 0), (0, 0)),
                               constant_values=np.inf)
                tc = trip.reshape(n_chunks, chunk, 3, 3)
                for c in range(n_chunks):
                    hit, lin, _ = _chunk_hits(tc[c], orgd, vsf, halff,
                                              plan.dims, win)
                    parts.append(jnp.where(hit, lin, n_cells).reshape(-1))
            return jnp.concatenate(parts)

        fn_m = jax.jit(lambda vd: lin_stream(vd)[::4096].sum())
        ms = pipe(fn_m, [(vd,) for vd in vdevs])
        emit(stage="S", what="stream_materialize", ms=round(ms, 2),
             lanes=int(fn_m(vdevs[0]).size) and None)
        fn_s = jax.jit(lambda vd: jax.lax.sort(lin_stream(vd))[::4096]
                       .sum())
        ms_s = pipe(fn_s, [(vd,) for vd in vdevs])
        emit(stage="S", what="stream_sorted", ms=round(ms_s, 2),
             sort_marginal=round(ms_s - ms, 2))

    if "D4" in stages:
        # op-count hypothesis: production runs ~100 chunked scatter ops
        # (94M lanes/s in context) vs the 153M lanes/s chained-loop rate.
        # Concat every chunk's lin stream and scatter ONCE (and in 8 big
        # ops) — isolates per-op overhead without compaction cost.
        from voxelray_tpu.ops.voxelize import _chunk_hits
        nxd, nyd, nzd = plan.dims
        n_cells = nxd * nyd * nzd
        vsf = jnp.float32(plan.voxel_size)
        halff = jnp.float32(plan.voxel_size * 0.5)
        orgd = jnp.asarray(plan.origin, jnp.float32)
        vdevs = [jnp.asarray(v) * (1.0 + 1e-6 * i) for i in range(6)]
        jax.block_until_ready(vdevs)

        def lin_stream_d(vd):
            tri_all = vd[plan.faces_sorted]
            parts = []
            for off, cnt, win, chunk in plan.layout:
                tri = jax.lax.slice_in_dim(tri_all, off, off + cnt)
                f_total = tri.shape[0]
                n_chunks = max(1, -(-f_total // chunk))
                padn = n_chunks * chunk - f_total
                trip = jnp.pad(tri, ((0, padn), (0, 0), (0, 0)),
                               constant_values=np.inf)
                tc = trip.reshape(n_chunks, chunk, 3, 3)
                for c in range(n_chunks):
                    hit, lin, _ = _chunk_hits(tc[c], orgd, vsf, halff,
                                              plan.dims, win)
                    parts.append(jnp.where(hit, lin, n_cells).reshape(-1))
            return jnp.concatenate(parts)

        def vox_one(vd, n_ops=1):
            s = lin_stream_d(vd)
            L = s.shape[0]
            step = -(-L // n_ops)
            s = jnp.pad(s, (0, n_ops * step - L), constant_values=n_cells)
            occ_acc = jnp.zeros((n_cells + 1,), jnp.uint8)
            for i in range(n_ops):
                part = jax.lax.slice_in_dim(s, i * step, (i + 1) * step)
                occ_acc = occ_acc.at[part].set(
                    jnp.uint8(1), mode="promise_in_bounds")
            return occ_acc[:n_cells].sum(dtype=jnp.int32)

        for n_ops in (1, 8):
            fn = jax.jit(lambda vd, n=n_ops: vox_one(vd, n))
            ms = pipe(fn, [(vd,) for vd in vdevs])
            emit(stage="D4", what=f"scatter_{n_ops}op", ms=round(ms, 2),
                 occupied=int(fn(vdevs[0])))

    if "D" in stages:
        # voxelize: full vs count_only (scatter marginal).  Vary vertices
        # per dispatch (tiny deform) so the runtime can't coalesce.
        vdevs = [jnp.asarray(v) * (1.0 + 1e-6 * i) for i in range(6)]
        jax.block_until_ready(vdevs)
        fn_full = lambda vd: voxelize_planned(plan, vd)[1]
        ms_full = pipe(fn_full, [(vd,) for vd in vdevs])
        emit(stage="D", what="voxelize_full", ms=round(ms_full, 2))
        fn_cnt = lambda vd: voxelize_planned(plan, vd, count_only=True)[1]
        ms_cnt = pipe(fn_cnt, [(vd,) for vd in vdevs])
        emit(stage="D", what="voxelize_count_only", ms=round(ms_cnt, 2),
             scatter_marginal=round(ms_full - ms_cnt, 2))
        slots = sum(c * w[0] * w[1] * w[2] for _, c, w, _ in plan.layout)
        emit(stage="D", what="plan_stats", padded_slots=int(slots),
             buckets=len(plan.layout))

    if "D2" in stages:
        # scatter-side experiments: the D split showed the occupancy
        # scatter marginal at 174 of 212 ms (16.4M padded lanes -> only
        # ~94M lanes/s in context vs the 153M chained-loop rate).
        # Candidates: wider target dtype (u8 sub-word RMW suspicion),
        # fewer/larger scatter ops, and a two-stage compact-then-scatter.
        import functools as _ft
        from voxelray_tpu.ops.voxelize import _chunk_hits
        nxd, nyd, nzd = plan.dims
        n_cells = nxd * nyd * nzd
        vsf = jnp.float32(plan.voxel_size)
        halff = jnp.float32(plan.voxel_size * 0.5)
        orgd = jnp.asarray(plan.origin, jnp.float32)
        vdevs = [jnp.asarray(v) * (1.0 + 1e-6 * i) for i in range(6)]
        jax.block_until_ready(vdevs)

        def vox_dtype(vd, dtype):
            occ_acc = jnp.zeros((n_cells + 1,), dtype)
            one = jnp.ones((), dtype)
            tri_all = vd[plan.faces_sorted]
            for off, cnt, win, chunk in plan.layout:
                tri = jax.lax.slice_in_dim(tri_all, off, off + cnt)
                f_total = tri.shape[0]
                n_chunks = max(1, -(-f_total // chunk))
                padn = n_chunks * chunk - f_total
                trip = jnp.pad(tri, ((0, padn), (0, 0), (0, 0)),
                               constant_values=np.inf)
                tc = trip.reshape(n_chunks, chunk, 3, 3)
                for c in range(n_chunks):
                    hit, lin, _ = _chunk_hits(tc[c], orgd, vsf, halff,
                                              plan.dims, win)
                    lin_t = jnp.where(hit, lin, n_cells)
                    occ_acc = occ_acc.at[lin_t.reshape(-1)].set(
                        one, mode="promise_in_bounds")
            return occ_acc[:n_cells].sum(dtype=jnp.int32)

        for dt_name, dt in [("u8", jnp.uint8), ("i16", jnp.int16),
                            ("u32", jnp.uint32), ("f32", jnp.float32)]:
            fn = jax.jit(_ft.partial(vox_dtype, dtype=dt))
            ms = pipe(fn, [(vd,) for vd in vdevs])
            emit(stage="D2", what=f"scatter_{dt_name}", ms=round(ms, 2),
                 occupied=int(fn(vdevs[0])))

        # two-stage: per-chunk compact hit lins into a dense buffer
        # (small target), one final scatter of ~6.7M hit lanes into the
        # volume
        def vox_2stage(vd):
            tri_all = vd[plan.faces_sorted]
            caps = []
            parts = []
            for off, cnt, win, chunk in plan.layout:
                tri = jax.lax.slice_in_dim(tri_all, off, off + cnt)
                f_total = tri.shape[0]
                n_chunks = max(1, -(-f_total // chunk))
                padn = n_chunks * chunk - f_total
                trip = jnp.pad(tri, ((0, padn), (0, 0), (0, 0)),
                               constant_values=np.inf)
                tc = trip.reshape(n_chunks, chunk, 3, 3)
                for c in range(n_chunks):
                    hit, lin, _ = _chunk_hits(tc[c], orgd, vsf, halff,
                                              plan.dims, win)
                    m = hit.reshape(-1)
                    ln = lin.reshape(-1)
                    kcap = m.shape[0] // 2  # hit rate ~40% -> /2 safe-ish
                    pos = jnp.cumsum(m.astype(jnp.int32)) - 1
                    slot = jnp.where(m & (pos < kcap), pos, kcap)
                    buf = jnp.full((kcap + 1,), n_cells, jnp.int32) \
                        .at[slot].set(ln, mode="promise_in_bounds")
                    parts.append(buf[:kcap])
            alllin = jnp.concatenate(parts)
            occ_acc = jnp.zeros((n_cells + 1,), jnp.uint8).at[alllin].set(
                jnp.uint8(1), mode="promise_in_bounds")
            return occ_acc[:n_cells].sum(dtype=jnp.int32)

        fn = jax.jit(vox_2stage)
        ms = pipe(fn, [(vd,) for vd in vdevs])
        emit(stage="D2", what="scatter_2stage", ms=round(ms, 2),
             occupied=int(fn(vdevs[0])))

    if "D3" in stages:
        # sorted-scatter: compact hit lins per chunk (as 2stage), then
        # lax.sort the whole hit-lin stream and scatter with
        # indices_are_sorted=True — sorted writes stream HBM instead of
        # random-accessing it, IF XLA's TPU scatter lowering exploits
        # the flag.  Variant "sortu" also dedups (unique_indices=True).
        import functools as _ft
        from voxelray_tpu.ops.voxelize import _chunk_hits
        nxd, nyd, nzd = plan.dims
        n_cells = nxd * nyd * nzd
        vsf = jnp.float32(plan.voxel_size)
        halff = jnp.float32(plan.voxel_size * 0.5)
        orgd = jnp.asarray(plan.origin, jnp.float32)
        vdevs = [jnp.asarray(v) * (1.0 + 1e-6 * i) for i in range(6)]
        jax.block_until_ready(vdevs)

        def hit_stream(vd):
            tri_all = vd[plan.faces_sorted]
            parts = []
            for off, cnt, win, chunk in plan.layout:
                tri = jax.lax.slice_in_dim(tri_all, off, off + cnt)
                f_total = tri.shape[0]
                n_chunks = max(1, -(-f_total // chunk))
                padn = n_chunks * chunk - f_total
                trip = jnp.pad(tri, ((0, padn), (0, 0), (0, 0)),
                               constant_values=np.inf)
                tc = trip.reshape(n_chunks, chunk, 3, 3)
                for c in range(n_chunks):
                    hit, lin, _ = _chunk_hits(tc[c], orgd, vsf, halff,
                                              plan.dims, win)
                    m = hit.reshape(-1)
                    ln = lin.reshape(-1)
                    kcap = m.shape[0] // 2
                    pos = jnp.cumsum(m.astype(jnp.int32)) - 1
                    slot = jnp.where(m & (pos < kcap), pos, kcap)
                    buf = jnp.full((kcap + 1,), n_cells, jnp.int32) \
                        .at[slot].set(ln, mode="promise_in_bounds")
                    parts.append(buf[:kcap])
            return jnp.concatenate(parts)

        def vox_sort(vd, unique=False):
            alllin = jax.lax.sort(hit_stream(vd))
            if unique:
                # scatter-max of the first-of-run flag keeps BOTH flags
                # honest: indices stay sorted, and max over dup runs
                # (first=1, rest=0) equals the dedup'd set
                first = jnp.concatenate([
                    jnp.ones((1,), bool), alllin[1:] != alllin[:-1]])
                occ_acc = jnp.zeros((n_cells + 1,), jnp.uint8).at[alllin] \
                    .max(first.astype(jnp.uint8),
                         mode="promise_in_bounds",
                         indices_are_sorted=True)
            else:
                occ_acc = jnp.zeros((n_cells + 1,), jnp.uint8).at[alllin] \
                    .set(jnp.uint8(1), mode="promise_in_bounds",
                         indices_are_sorted=True)
            return occ_acc[:n_cells].sum(dtype=jnp.int32)

        # attribution: compaction stage alone (no sort, no final scatter)
        fn_cs = jax.jit(lambda vd: hit_stream(vd).astype(jnp.int32).sum())
        ms = pipe(fn_cs, [(vd,) for vd in vdevs])
        emit(stage="D3", what="compact_only", ms=round(ms, 2))
        fn_srt = jax.jit(lambda vd: jax.lax.sort(hit_stream(vd))[::4096]
                         .astype(jnp.int32).sum())
        ms = pipe(fn_srt, [(vd,) for vd in vdevs])
        emit(stage="D3", what="compact_sort_only", ms=round(ms, 2))
        for name, uq in [("sorted", False), ("sorted_unique", True)]:
            fn = jax.jit(_ft.partial(vox_sort, unique=uq))
            ms = pipe(fn, [(vd,) for vd in vdevs])
            emit(stage="D3", what=f"scatter_{name}", ms=round(ms, 2),
                 occupied=int(fn(vdevs[0])))


if __name__ == "__main__":
    main()
