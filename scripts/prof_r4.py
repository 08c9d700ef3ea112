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


if __name__ == "__main__":
    main()
