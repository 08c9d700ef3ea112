"""Round-3 late-session profiling: render glue, sort rates, extraction.

Stages (PROF_STAGES=A,B,C default all):
  A  trace vs render attribution at the full preset (where do the
     ~10 ms between trace and primary render go; shadow-pass glue)
  B  lax.sort rates at ray scale (sizing the space-binned traversal's
     per-round bin step: 2M keys, key+3 value limbs)
  C  AABB extraction phase attribution at bench capacities

Usage (solo TPU process): JAX_PLATFORMS= python scripts/prof_r4.py
"""
import functools
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


def time_call(fn, runs=3):
    import jax
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, compile_s


def main():
    stages = os.environ.get("PROF_STAGES", "A,B,C").split(",")
    runs = int(os.environ.get("PROF_RUNS", "3"))
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
    from voxelray_tpu.render.camera import Camera
    from voxelray_tpu.render.pipeline import render_image

    log(f"backend={jax.default_backend()}")
    W, H = 1920, 1080
    v, f = meshes.torus_knot(2, 3, 1024, 512)
    bb_min, bb_max = mesh_bbox(v)
    extent = float(max(bb_max - bb_min))
    vs = extent / 512
    dims = grid_dims(bb_min, bb_max, vs)
    plan = plan_voxelize(v, f, vs, bb_min=bb_min, bb_max=bb_max)
    occ, _ = voxelize_planned(plan, jnp.asarray(v))
    grid = GridBool.from_occupancy(occ, bb_min, vs)
    scene = build_scene(models=None, grid=grid)
    accel = scene.accel
    center = (bb_min + bb_max) * 0.5
    cam = Camera(eye=tuple(center + np.asarray([0.9, 0.55, -0.9]) * extent),
                 center=tuple(center))
    _, _, vi, pi = cam.matrices(W, H)
    o4, d4 = make_camera_rays(W, H, jnp.asarray(vi), jnp.asarray(pi))
    o = o4.reshape(-1, 3)
    d = d4.reshape(-1, 3)
    # tile order (the render's layout)
    perm = np.arange(H * W, dtype=np.int32).reshape(H, W) \
        .reshape(H // 8, 8, W // 128, 128).transpose(2, 0, 1, 3) \
        .reshape(-1)
    ot, dt_ = o[perm], d[perm]

    if "A" in stages:
        trace = jax.jit(lambda o, d: trace_grid_fast(o, d, accel))
        dt, cs = time_call(lambda: trace(ot, dt_), runs)
        emit(stage="A", what="trace_tiled_defaults", ms=round(dt, 2),
             compile_s=round(cs, 1))

        dt, cs = time_call(
            lambda: render_image(scene, vi, pi, width=W, height=H,
                                 backend="fast", shadows=False), runs)
        emit(stage="A", what="render_primary", ms=round(dt, 2),
             compile_s=round(cs, 1))
        dt, cs = time_call(
            lambda: render_image(scene, vi, pi, width=W, height=H,
                                 backend="fast", shadows=True), runs)
        emit(stage="A", what="render_shadows", ms=round(dt, 2),
             compile_s=round(cs, 1))

        # shadow components: trace + any_hit from hit surfaces
        t_hit = trace(ot, dt_)[0]
        hit = jnp.isfinite(t_hit)
        p = ot + dt_ * jnp.where(hit, t_hit, 1.0)[:, None]
        ldir = jnp.asarray([0.45, 0.8, 0.4], jnp.float32)
        ldir = ldir / jnp.linalg.norm(ldir)
        ld = jnp.broadcast_to(ldir, p.shape)
        ah = jax.jit(lambda p, ld, adm: any_hit_grid_fast(
            p, ld, accel, admit=adm))
        dt, cs = time_call(lambda: ah(p, ld, hit), runs)
        emit(stage="A", what="any_hit_admit", ms=round(dt, 2),
             compile_s=round(cs, 1))

    if "B" in stages:
        n = 1 << 21
        rng = np.random.default_rng(3)
        keys = jnp.asarray(rng.integers(0, 1 << 18, n, dtype=np.int32))
        vals = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
        v2 = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
        v3 = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
        s1 = jax.jit(lambda k: jax.lax.sort(k))
        dt, _ = time_call(lambda: s1(keys), runs)
        emit(stage="B", prim="sort_i32_2M", ms=round(dt, 2))
        s2 = jax.jit(lambda k, a: jax.lax.sort((k, a), num_keys=1))
        dt, _ = time_call(lambda: s2(keys, vals), runs)
        emit(stage="B", prim="sortkv_i32_2M", ms=round(dt, 2))
        s4 = jax.jit(lambda k, a, b, c: jax.lax.sort((k, a, b, c),
                                                     num_keys=1))
        dt, _ = time_call(lambda: s4(keys, vals, v2, v3), runs)
        emit(stage="B", prim="sortk3v_i32_2M", ms=round(dt, 2))
        # argsort alternative: sort (key, iota) then gather rows
        si = jax.jit(lambda k: jax.lax.sort(
            (k, jax.lax.iota(jnp.int32, n)), num_keys=1)[1])
        dt, _ = time_call(lambda: si(keys), runs)
        emit(stage="B", prim="argsort_via_sortkv", ms=round(dt, 2))
        # segment ids via sorted keys: boundary detect + cumsum
        ssum = jax.jit(lambda k: jnp.cumsum(
            (jnp.diff(jax.lax.sort(k), prepend=jnp.int32(-1)) != 0)
            .astype(jnp.int32)))
        dt, _ = time_call(lambda: ssum(keys), runs)
        emit(stage="B", prim="sort_plus_segids", ms=round(dt, 2))

    if "D" in stages:
        # trace knob sweep at the full preset: the stage-A finding is
        # that shading glue is free (render_primary == trace), so the
        # only road to >=30 Mrays/s is the trace itself.  k shrinks the
        # fine take (prices per k x fcap index); ff shrinks fcap; the
        # drain absorbs whatever the shallower coverage misses.
        import itertools
        base = dict(rounds=1, k_hits=5, fine_frac=8, drain_frac=64,
                    drain_k=8)
        variants = [
            ("defaults", {}),
            ("k4", dict(k_hits=4)),
            ("k3", dict(k_hits=3)),
            ("k2", dict(k_hits=2)),
            ("k4_ff12", dict(k_hits=4, fine_frac=12)),
            ("k5_ff12", dict(fine_frac=12)),
            ("k5_ff16", dict(fine_frac=16)),
            ("k4_ff16", dict(k_hits=4, fine_frac=16)),
            ("k4_df32", dict(k_hits=4, drain_frac=32)),
            ("k4_dk16", dict(k_hits=4, drain_k=16)),
            ("k3_ff12_dk16", dict(k_hits=3, fine_frac=12, drain_k=16)),
        ]
        for name, kv in variants:
            opts = dict(base, **kv)
            fn = jax.jit(lambda o, d, opts=opts: trace_grid_fast(
                o, d, accel, return_stats=True, **opts))
            dt, cs = time_call(lambda: fn(ot, dt_), runs)
            t, lin, unres = fn(ot, dt_)
            emit(stage="D", what=name, ms=round(dt, 2),
                 hits=int(np.isfinite(np.asarray(t)).sum()),
                 unresolved=int(unres), compile_s=round(cs, 1))

    if "F" in stages:
        # continuation mini-rounds vs the drain (stage-D follow-up):
        # attribution first (drain cost via drain=False), then the
        # cont ladder.
        base = dict(rounds=1, k_hits=5, fine_frac=8, drain_frac=64,
                    drain_k=8)
        variants = [
            ("nocont_nodrain", dict(cont_rounds=0, drain=False)),
            ("nocont", dict(cont_rounds=0)),
            ("cont1", dict(cont_rounds=1)),
            ("cont2", dict(cont_rounds=2)),
            ("cont3", dict(cont_rounds=3)),
            ("cont2_nodrain", dict(cont_rounds=2, drain=False)),
            ("cont2_k12", dict(cont_rounds=2, cont_k=12)),
            ("cont2_cf8", dict(cont_rounds=2, cont_frac=8)),
            ("cont1_k16", dict(cont_rounds=1, cont_k=16)),
        ]
        for name, kv in variants:
            opts = dict(base, **kv)
            fn = jax.jit(lambda o, d, opts=opts: trace_grid_fast(
                o, d, accel, return_stats=True, **opts))
            dt, cs = time_call(lambda: fn(ot, dt_), runs)
            t, lin, unres = fn(ot, dt_)
            emit(stage="F", what=name, ms=round(dt, 2),
                 hits=int(np.isfinite(np.asarray(t)).sum()),
                 unresolved=int(unres), compile_s=round(cs, 1))
        # shadow path with continuation
        trace = jax.jit(lambda o, d: trace_grid_fast(o, d, accel))
        t_hit = trace(ot, dt_)[0]
        hit = jnp.isfinite(t_hit)
        p = ot + dt_ * jnp.where(hit, t_hit, 1.0)[:, None]
        ldir = jnp.asarray([0.45, 0.8, 0.4], jnp.float32)
        ldir = ldir / jnp.linalg.norm(ldir)
        ld = jnp.broadcast_to(ldir, p.shape)
        for name, kv in [("ah_cont0", dict(cont_rounds=0)),
                         ("ah_cont1", dict(cont_rounds=1)),
                         ("ah_cont1_af8", dict(cont_rounds=1,
                                               admit_frac=8)),
                         ("ah_cont2_af8", dict(cont_rounds=2,
                                               admit_frac=8))]:
            ah = jax.jit(lambda p, ld, adm, kv=kv: any_hit_grid_fast(
                p, ld, accel, admit=adm, **kv))
            dt, cs = time_call(lambda: ah(p, ld, hit), runs)
            occl = int(np.asarray(ah(p, ld, hit)).sum())
            emit(stage="F", what=name, ms=round(dt, 2), occl=occl,
                 compile_s=round(cs, 1))

    if "G" in stages:
        # group compaction + fine-buffer sizing (stage-F finding: the
        # 26k "stragglers" at ff8 are fcap OVERFLOW rays — candidates
        # ~288k vs 262144 slots — that only the drain serves; a wider
        # fine buffer should zero the drain entirely)
        base = dict(rounds=1, k_hits=5, drain_frac=64, drain_k=8)
        variants = [
            ("g_ff8", dict(fine_frac=8)),
            ("g_ff8_nodrain", dict(fine_frac=8, drain=False)),
            ("g_ff6", dict(fine_frac=6)),
            ("g_ff6_nodrain", dict(fine_frac=6, drain=False)),
            ("g_ff5", dict(fine_frac=5)),
            ("g_ff4", dict(fine_frac=4)),
            ("g_ff6_k4", dict(fine_frac=6, k_hits=4)),
            ("g_ff6_k6", dict(fine_frac=6, k_hits=6)),
        ]
        for name, kv in variants:
            opts = dict(base, **kv)
            fn = jax.jit(lambda o, d, opts=opts: trace_grid_fast(
                o, d, accel, return_stats=True, **opts))
            dt, cs = time_call(lambda: fn(ot, dt_), runs)
            t, lin, unres = fn(ot, dt_)
            emit(stage="G", what=name, ms=round(dt, 2),
                 hits=int(np.isfinite(np.asarray(t)).sum()),
                 unresolved=int(unres), compile_s=round(cs, 1))
        trace = jax.jit(lambda o, d: trace_grid_fast(o, d, accel))
        t_hit = trace(ot, dt_)[0]
        hit = jnp.isfinite(t_hit)
        p = ot + dt_ * jnp.where(hit, t_hit, 1.0)[:, None]
        ldir = jnp.asarray([0.45, 0.8, 0.4], jnp.float32)
        ldir = ldir / jnp.linalg.norm(ldir)
        ld = jnp.broadcast_to(ldir, p.shape)
        # shadow sizing: the fine buffer must cover ~ALL admitted rays
        # (they start on surfaces), so af8 (cap 262144 just above the
        # 210k admit population) must pair with ff1; af4+ff2 is the
        # equivalent-capacity default
        for name, kv in [("ah_g", dict()),
                         ("ah_g_af8_ff1", dict(admit_frac=8,
                                               fine_frac=(1,))),
                         ("ah_g_k3", dict(k_hits=3))]:
            ah = jax.jit(lambda p, ld, adm, kv=kv: any_hit_grid_fast(
                p, ld, accel, admit=adm, **kv))
            dt, cs = time_call(lambda: ah(p, ld, hit), runs)
            occl = int(np.asarray(ah(p, ld, hit)).sum())
            emit(stage="G", what=name, ms=round(dt, 2), occl=occl,
                 compile_s=round(cs, 1))

    if "H" in stages:
        # staged ablation of the ff5/group/k5 trace: each stage adds one
        # pipeline piece; outputs are reduced to scalars so XLA cannot
        # DCE the stage under test.  Differences between stages are the
        # true in-context marginal costs (stage-K microbenchmarks
        # mispredicted the glue).
        from voxelray_tpu.ops.compact import compact_mask
        from voxelray_tpu.ops.traverse_fast import _init_state, BRICK
        from voxelray_tpu.ops.pallas.grid_walk import coarse_walk
        from voxelray_tpu.ops.pallas.brick_fine import fine_walk_multi
        from voxelray_tpu.ops.intersect import TMIN, TMAX

        k_hits, chunk, fine_frac = 5, 32, 5
        bw = float(accel.voxel_size * BRICK)
        n = ot.shape[0]
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
            dt, cs = time_call(lambda: fn(ot, dt_), runs)
            emit(stage="H", what=stage, ms=round(dt, 2),
                 marginal=round(dt - prev, 2), compile_s=round(cs, 1))
            prev = dt
        # the full production trace at the same knobs, for the residue
        fn = jax.jit(lambda o, d: trace_grid_fast(
            o, d, accel, k_hits=5, fine_frac=5, return_stats=True))
        dt, cs = time_call(lambda: fn(ot, dt_), runs)
        emit(stage="H", what="full_trace", ms=round(dt, 2),
             marginal=round(dt - prev, 2), compile_s=round(cs, 1))

    if "I" in stages:
        # (a) floor vs relayout split of stage H's 24.8 ms "init":
        from voxelray_tpu.ops.traverse_fast import _init_state
        from voxelray_tpu.ops.intersect import TMAX

        n = ot.shape[0]
        tmx = jnp.full((n,), TMAX)
        noop = jax.jit(lambda o, d: (o[0, 0] + d[0, 0]))
        dt, _ = time_call(lambda: noop(ot, dt_), runs)
        emit(stage="I", what="noop_floor", ms=round(dt, 2))
        slc = jax.jit(lambda o, d: sum(o[:, i].sum() + d[:, i].sum()
                                       for i in range(3)))
        dt, _ = time_call(lambda: slc(ot, dt_), runs)
        emit(stage="I", what="column_slices", ms=round(dt, 2))
        ini = jax.jit(lambda o, d: sum(
            x.sum() for x in _init_state(o, d, accel, tmx)[:3]))
        dt, _ = time_call(lambda: ini(ot, dt_), runs)
        emit(stage="I", what="init_state", ms=round(dt, 2))
        # planar variants: inputs pre-transposed to (3, n) on device
        otT = jnp.asarray(np.asarray(ot).T.copy())
        dtT = jnp.asarray(np.asarray(dt_).T.copy())
        slcT = jax.jit(lambda o, d: sum(o[i].sum() + d[i].sum()
                                        for i in range(3)))
        dt, _ = time_call(lambda: slcT(otT, dtT), runs)
        emit(stage="I", what="planar_rows", ms=round(dt, 2))

        # (b) fine-kernel unroll sweep at the production knobs
        for unroll in (5, 7, 9, 13):
            fn = jax.jit(lambda o, d, u=unroll: trace_grid_fast(
                o, d, accel, k_hits=5, fine_frac=5, return_stats=True,
                fine_unroll=u))
            dt, cs = time_call(lambda: fn(ot, dt_), runs)
            t, lin, unres = fn(ot, dt_)
            emit(stage="I", what=f"trace_unroll{unroll}", ms=round(dt, 2),
                 hits=int(np.isfinite(np.asarray(t)).sum()),
                 unresolved=int(unres), compile_s=round(cs, 1))

    if "J" in stages:
        # fine-kernel block size: smaller blocks exit the per-slot while
        # loop as soon as THEIR lanes resolve (coherent tiles) at the
        # cost of more per-block overhead; plus the pipelined-throughput
        # measurement of the winning trace (dispatch floor amortized).
        for name, kv in [("bq32", dict()),
                         ("bq16", dict(fine_bq=16)),
                         ("bq8", dict(fine_bq=8))]:
            fn = jax.jit(lambda o, d, kv=kv: trace_grid_fast(
                o, d, accel, return_stats=True, **kv))
            dt, cs = time_call(lambda: fn(ot, dt_), runs)
            t, lin, unres = fn(ot, dt_)
            emit(stage="J", what=f"trace_{name}", ms=round(dt, 2),
                 hits=int(np.isfinite(np.asarray(t)).sum()),
                 unresolved=int(unres), compile_s=round(cs, 1))
        # pipelined trace throughput (8 dispatches, one sync, varying
        # t_max epsilon per call to defeat dispatch coalescing)
        fn = jax.jit(lambda o, d, tm: trace_grid_fast(
            o, d, accel, t_max=tm))
        tms = [jnp.float32(10000.0 + i) for i in range(8)]
        jax.block_until_ready([fn(ot, dt_, tm) for tm in tms])
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready([fn(ot, dt_, tm) for tm in tms])
            best = min(best, (time.perf_counter() - t0) / len(tms))
        emit(stage="J", what="trace_pipelined", ms=round(best * 1e3, 2))

    if "J2" in stages:
        # fine_static: straight-line max_steps bodies, NO while_loop
        # scalar conds (hypothesis: the 10-20us/cond dominates the fine
        # kernel — body compute models to ~0.15us; flat unroll/mux-tree
        # sweeps support it).  hits must stay exactly 210157.
        for name, kv in [("static_bq32", dict(fine_static=True)),
                         ("static_bq64", dict(fine_static=True,
                                              fine_bq=64)),
                         ("static_bq96", dict(fine_static=True,
                                              fine_bq=96)),
                         ("while_base", dict())]:
            fn = jax.jit(lambda o, d, kv=kv: trace_grid_fast(
                o, d, accel, return_stats=True, **kv))
            dt, cs = time_call(lambda: fn(ot, dt_), runs)
            t, lin, unres = fn(ot, dt_)
            emit(stage="J2", what=f"trace_{name}", ms=round(dt, 2),
                 hits=int(np.isfinite(np.asarray(t)).sum()),
                 unresolved=int(unres), compile_s=round(cs, 1))
        # pipelined with the static fine
        fn = jax.jit(lambda o, d, tm: trace_grid_fast(
            o, d, accel, t_max=tm, fine_static=True))
        tms = [jnp.float32(10000.0 + i) for i in range(8)]
        jax.block_until_ready([fn(ot, dt_, tm) for tm in tms])
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready([fn(ot, dt_, tm) for tm in tms])
            best = min(best, (time.perf_counter() - t0) / len(tms))
        emit(stage="J2", what="trace_static_pipelined",
             ms=round(best * 1e3, 2))

    if "J3" in stages:
        # slot-interleaved fine walks: ilp independent DDA chains per
        # while loop fill VPU latency bubbles (body measured ~2.5us =
        # latency-bound serial chain) and cut scalar conds by ilp.
        # Register pressure grows with ilp x bq -> sweep both.
        for name, kv in [("ilp2", dict(fine_ilp=2)),
                         ("ilp5", dict(fine_ilp=5)),
                         ("ilp2_bq16", dict(fine_ilp=2, fine_bq=16)),
                         ("ilp5_bq16", dict(fine_ilp=5, fine_bq=16)),
                         ("ilp5_bq8", dict(fine_ilp=5, fine_bq=8))]:
            fn = jax.jit(lambda o, d, kv=kv: trace_grid_fast(
                o, d, accel, return_stats=True, **kv))
            dt, cs = time_call(lambda: fn(ot, dt_), runs)
            t, lin, unres = fn(ot, dt_)
            emit(stage="J3", what=f"trace_{name}", ms=round(dt, 2),
                 hits=int(np.isfinite(np.asarray(t)).sum()),
                 unresolved=int(unres), compile_s=round(cs, 1))
        # pipelined with the best (read PROF_J3_OPTS json, default ilp5)
        opts = json.loads(os.environ.get("PROF_J3_OPTS", '{"fine_ilp":5}'))
        fn = jax.jit(lambda o, d, tm: trace_grid_fast(
            o, d, accel, t_max=tm, **opts))
        tms = [jnp.float32(10000.0 + i) for i in range(8)]
        jax.block_until_ready([fn(ot, dt_, tm) for tm in tms])
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready([fn(ot, dt_, tm) for tm in tms])
            best = min(best, (time.perf_counter() - t0) / len(tms))
        emit(stage="J3", what="trace_ilp_pipelined", opts=opts,
             ms=round(best * 1e3, 2))

    if "J4" in stages:
        # the fine-words take in isolation: is it the hidden 25-30 ms?
        # (stage-H's 0.6 ms take marginal vs stage-K's 25.3 ms for the
        # same-shape gather disagree; the noop-kernel micro shows the
        # pallas body is ~1 ms, so the take is the prime suspect)
        m = ot.shape[0] // 5
        rng = np.random.default_rng(0)
        nb = accel.fine.shape[1]
        idx = jnp.asarray(rng.integers(0, nb, (5, m), dtype=np.int32))

        def take3(ix):
            w = accel.fine[:, ix]                     # (16, 5, m)
            # dependency chain x3 to amortize dispatch
            for _ in range(2):
                ix = (ix + w[0].astype(jnp.int32)) % nb
                w = accel.fine[:, ix]
            return w.sum(dtype=jnp.uint32)
        fn = jax.jit(take3)
        dt, cs = time_call(lambda: fn(idx), runs)
        emit(stage="J4", what="take_16xk5_chained3",
             ms_per_take=round(dt / 3, 2), compile_s=round(cs, 1))

        # row-layout alternative: fine stored (NB, 16), row gather
        fine_rows = accel.fine.transpose(1, 0)        # (NB, 16)

        def take3r(ix):
            w = fine_rows[ix]                         # (5, m, 16)
            for _ in range(2):
                ix = (ix + w[..., 0].astype(jnp.int32)) % nb
                w = fine_rows[ix]
            return w.sum(dtype=jnp.uint32)
        fn = jax.jit(take3r)
        dt, cs = time_call(lambda: fn(idx), runs)
        emit(stage="J4", what="take_rows_16_chained3",
             ms_per_take=round(dt / 3, 2), compile_s=round(cs, 1))

        # single-slot take (the lazy-gather round structure's unit)
        def take1(ix):
            w = accel.fine[:, ix[0]]
            for _ in range(2):
                i2 = (ix[0] + w[0].astype(jnp.int32)) % nb
                w = accel.fine[:, i2]
            return w.sum(dtype=jnp.uint32)
        fn = jax.jit(take1)
        dt, cs = time_call(lambda: fn(idx), runs)
        emit(stage="J4", what="take_16xk1_chained3",
             ms_per_take=round(dt / 3, 2), compile_s=round(cs, 1))

    if "J5" in stages:
        # group divergence: within 8 consecutive tiled rays, how often
        # does a lane's slot-s candidate brick differ from the group's
        # first live lane?  (feasibility of a per-group words take)
        from voxelray_tpu.ops.traverse_fast import _init_state
        from voxelray_tpu.ops.pallas.grid_walk import coarse_walk
        n = ot.shape[0]
        cx, cy, cz, act = _init_state(ot, dt_, accel,
                                      jnp.full((n,), 1e4, jnp.float32))
        bw = accel.voxel_size * 8.0
        hits, *_ = jax.jit(lambda: coarse_walk(
            ot[:, 0], ot[:, 1], ot[:, 2], dt_[:, 0], dt_[:, 1],
            dt_[:, 2], cx, cy, cz, act.astype(jnp.int32),
            jnp.full((n,), 1e4, jnp.float32), accel.coarse, accel.l2,
            bdims=accel.bdims, origin_key=accel.origin_key,
            brick_world=bw, bq=32, k_hits=5))()
        hb = np.asarray(hits)                     # (5, n)
        g = hb.reshape(5, n // 8, 8)
        live = g >= 0
        # representative: first live lane per (slot, group)
        first = np.argmax(live, axis=2)
        rep = np.take_along_axis(g, first[:, :, None], axis=2)
        same = (g == rep) | ~live
        div = (~same).sum(axis=(1, 2))
        tot = live.sum(axis=(1, 2))
        emit(stage="J5", what="group_divergence",
             per_slot_live=[int(x) for x in tot],
             per_slot_divergent=[int(x) for x in div],
             per_slot_pct=[round(100 * d / max(t, 1), 1)
                           for d, t in zip(div, tot)])

    if "J6" in stages:
        # TRUE attribution: pipelined (8 dispatches, one sync) deltas
        # between knob ablations — per-call marginals carry dispatch
        # noise (the J4/noop finding), pipelined deltas don't.
        def pipelined(kv):
            fn = jax.jit(lambda o, d, tm, kv=kv: trace_grid_fast(
                o, d, accel, t_max=tm, **kv))
            tms = [jnp.float32(10000.0 + i) for i in range(8)]
            jax.block_until_ready([fn(ot, dt_, tm) for tm in tms])
            best = np.inf
            for _ in range(2):
                t0 = time.perf_counter()
                jax.block_until_ready([fn(ot, dt_, tm) for tm in tms])
                best = min(best, (time.perf_counter() - t0) / len(tms))
            return best * 1e3
        for name, kv in [("defaults", {}),
                         ("drain_off", dict(drain=False)),
                         ("ff1", dict(fine_frac=1)),
                         ("k3", dict(k_hits=3)),
                         ("k8", dict(k_hits=8)),
                         ("2level_off", dict(two_level=False)),
                         ("rounds2", dict(rounds=2))]:
            emit(stage="J6", what=f"pipe_{name}",
                 ms=round(pipelined(kv), 2))

    if "E" in stages:
        # render with the stage-D winner knobs (set via PROF_E_OPTS json)
        opts = json.loads(os.environ.get("PROF_E_OPTS", "{}"))
        dt, cs = time_call(
            lambda: render_image(scene, vi, pi, width=W, height=H,
                                 backend="fast", shadows=False,
                                 fast_opts=opts or None), runs)
        emit(stage="E", what="render_primary_opts", opts=opts,
             ms=round(dt, 2), compile_s=round(cs, 1))
        dt, cs = time_call(
            lambda: render_image(scene, vi, pi, width=W, height=H,
                                 backend="fast", shadows=True,
                                 fast_opts=opts or None), runs)
        emit(stage="E", what="render_shadows_opts", opts=opts,
             ms=round(dt, 2), compile_s=round(cs, 1))

    if "C" in stages:
        from voxelray_tpu.ops.aabbs import (count_nonzero_bytes,
                                            count_nonzero_words)
        nzw = count_nonzero_words(occ)
        wcap = -(-int(nzw * 1.1) // 8192) * 8192
        nzb = count_nonzero_bytes(occ)
        bcap = -(-int(nzb * 1.1) // 8192) * 8192
        emit(stage="C", nzw=int(nzw), nzb=int(nzb), wcap=wcap, bcap=bcap)
        from voxelray_tpu.ops.aabbs import extract_aabbs_words
        for phase in ("pack", "p1", "p2a", None):
            fn = lambda ph=phase: extract_aabbs_words(
                grid.words, grid.origin, capacity=1 << 20,
                dims=grid.dims, voxel_size_static=grid.voxel_size,
                word_capacity=wcap, byte_capacity=bcap, stop_after=ph)
            dt, cs = time_call(fn, runs)
            emit(stage="C", stop_after=str(phase), ms=round(dt, 2),
                 compile_s=round(cs, 1))
        # rank-fill default: no byte_capacity bound (skips its cumsum)
        fn = lambda: extract_aabbs_words(
            grid.words, grid.origin, capacity=1 << 20, dims=grid.dims,
            voxel_size_static=grid.voxel_size, word_capacity=wcap)
        dt, cs = time_call(fn, runs)
        emit(stage="C", stop_after="None_nobcap", ms=round(dt, 2),
             compile_s=round(cs, 1))
        # 8-word group pre-compaction for phase 1
        from voxelray_tpu.ops.aabbs import count_nonzero_groups
        nzg = count_nonzero_groups(occ)
        gcap = -(-int(nzg * 1.1) // 8192) * 8192
        emit(stage="C", nzg=int(nzg), gcap=gcap)
        for ph in ("p1", None):
            fn = lambda p=ph: extract_aabbs_words(
                grid.words, grid.origin, capacity=1 << 20, dims=grid.dims,
                voxel_size_static=grid.voxel_size, word_capacity=wcap,
                group_capacity=gcap, stop_after=p)
            dt, cs = time_call(fn, runs)
            emit(stage="C", stop_after=f"grouped_{ph}", ms=round(dt, 2),
                 compile_s=round(cs, 1))
        # pipelined extraction throughput (dispatch floor amortized):
        # vary capacity-invariant input (word rotation) per dispatch
        import jax
        base = grid.words
        variants = [base.at[0].set(base[0] | jnp.uint32(0)) if i == 0
                    else jnp.roll(base, i) for i in range(6)]
        fn_j = jax.jit(lambda w: extract_aabbs_words(
            w, grid.origin, capacity=1 << 20, dims=grid.dims,
            voxel_size_static=grid.voxel_size, word_capacity=wcap))
        jax.block_until_ready([fn_j(w) for w in variants])
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready([fn_j(w) for w in variants])
            best = min(best, (time.perf_counter() - t0) / len(variants))
        emit(stage="C", stop_after="pipelined", ms=round(best * 1e3, 2))


if __name__ == "__main__":
    main()
