"""Sweep 2: fewer rounds x deeper candidate queues, on chip.

Clean round-2 finding: marginal rounds cost 120-200 ms each while round 1
resolves 92% of hits in 175 ms.  k_hits x rounds >= 24 preserves the
default configuration's occupied-brick coverage (hit parity class), so
k8 x r3 / k12 x r2 should trade cheap in-kernel slots for expensive
rounds.  Also sweeps voxelize chunk/buckets toward the <=250 ms target
and times a dda reference for ground-truth hit count.

Run as the ONLY TPU process:  JAX_PLATFORMS= python scripts/prof_sweep2.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def time_call(fn, runs=3):
    import jax
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / runs, compile_s


def main():
    stages = os.environ.get("PROF_STAGES", "trace,shadow,render,vox").split(",")
    runs = int(os.environ.get("PROF_RUNS", "3"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from voxelray_tpu.io import meshes
    from voxelray_tpu.models.grids import GridBool
    from voxelray_tpu.models.scene import build_scene
    from voxelray_tpu.ops.geometry import grid_dims, mesh_bbox
    from voxelray_tpu.ops.intersect import make_camera_rays
    from voxelray_tpu.ops.traverse_fast import (any_hit_grid_fast,
                                                build_accel, trace_grid_fast)
    from voxelray_tpu.ops.voxelize import plan_voxelize, voxelize_planned
    from voxelray_tpu.render.camera import Camera
    from voxelray_tpu.render.pipeline import render_image

    log(f"backend={jax.default_backend()}")
    v, f = meshes.torus_knot(2, 3, 1024, 512)
    grid_res, width, height = 512, 1920, 1080
    bb_min, bb_max = mesh_bbox(v)
    extent = float(max(bb_max - bb_min))
    vs = extent / grid_res
    v_dev = jnp.asarray(v)

    plan = plan_voxelize(v, f, vs, bb_min=bb_min, bb_max=bb_max)
    occ, _ = voxelize_planned(plan, v_dev, scatter="flat")
    accel = build_accel(occ, bb_min, vs)
    center = (bb_min + bb_max) * 0.5
    cam = Camera(eye=tuple(center + np.asarray([0.9, 0.55, -0.9]) * extent),
                 center=tuple(center))
    _, _, vi, pi = cam.matrices(width, height)
    origins, dirs = make_camera_rays(width, height, jnp.asarray(vi),
                                     jnp.asarray(pi))

    if "trace" in stages:
        variants = [
            dict(rounds=6, k_hits=4),            # current default (670ms)
            dict(rounds=3, k_hits=8),
            dict(rounds=2, k_hits=8),
            dict(rounds=2, k_hits=12),
            dict(rounds=3, k_hits=8, fine_frac=8),
            dict(rounds=3, k_hits=8, two_level=True),
        ]
        for kv in variants:
            def fn(kv=kv):
                t, lin = trace_grid_fast(origins, dirs, accel, **kv)
                return t
            try:
                dt, cs = time_call(fn, runs)
            except Exception as e:
                emit(stage="trace", error=str(e)[:160], **kv)
                continue
            t = fn()
            emit(stage="trace", ms=round(dt * 1e3, 1),
                 compile_s=round(cs, 1),
                 mrays_s=round(width * height / dt / 1e6, 2),
                 hits=int(np.isfinite(np.asarray(t)).sum()), **kv)

        # dda ground truth (hit count only, timed once)
        from voxelray_tpu.ops.traverse import trace_grid_dda
        occ_flat = jnp.asarray(np.asarray(occ).reshape(-1))
        def dda():
            t, _ = trace_grid_dda(origins, dirs, occ_flat,
                                  jnp.asarray(bb_min), dims=accel.dims,
                                  voxel_size_static=accel.voxel_size)
            return t
        dt, cs = time_call(dda, 1)
        t = dda()
        emit(stage="trace", backend="dda", ms=round(dt * 1e3, 1),
             hits=int(np.isfinite(np.asarray(t)).sum()))

    if "shadow" in stages:
        # realistic shadow-ray population: start at primary hit points
        t, lin = trace_grid_fast(origins, dirs, accel)
        hit = jnp.isfinite(t)
        wp = origins + dirs * jnp.where(hit, t, 1.0)[..., None]
        lp = jnp.asarray([10.0, 55.0, 8.0], jnp.float32)
        lv = lp - wp
        dist = jnp.linalg.norm(lv, axis=-1, keepdims=True)
        lv = lv / jnp.maximum(dist, 1e-20)
        for kv in (dict(), dict(rounds=3), dict(rounds=2),
                   dict(rounds=3, fine="walk")):
            kv = dict(kv)
            def fn(kv=kv):
                return any_hit_grid_fast(wp, lv, accel, t_max=dist[..., 0],
                                         admit=hit, **kv)
            try:
                dt, cs = time_call(fn, runs)
            except Exception as e:
                emit(stage="shadow", error=str(e)[:160], **kv)
                continue
            s = fn()
            emit(stage="shadow", ms=round(dt * 1e3, 1),
                 compile_s=round(cs, 1),
                 occluded=int(np.asarray(s).sum()), **kv)

    if "render" in stages:
        grid = GridBool.from_occupancy(occ, bb_min, vs)
        scene = build_scene(models=None, grid=grid)
        for opts in (None, dict(rounds=3, k_hits=8)):
            def fn(opts=opts):
                return render_image(scene, vi, pi, width=width,
                                    height=height, backend="fast",
                                    shadows=True, fast_opts=opts)
            dt, cs = time_call(fn, runs)
            emit(stage="render", opts=opts, ms=round(dt * 1e3, 1),
                 compile_s=round(cs, 1),
                 mrays_s=round(width * height / dt / 1e6, 2))

    if "vox" in stages:
        for chunk, mb in ((8192, 12), (32768, 12), (16384, 6), (16384, 24)):
            p2 = plan_voxelize(v, f, vs, bb_min=bb_min, bb_max=bb_max,
                               chunk=chunk, max_buckets=mb)
            def fn(p2=p2):
                o, _ = voxelize_planned(p2, v_dev, scatter="flat")
                return o
            dt, cs = time_call(fn, runs)
            o2 = fn()
            emit(stage="vox", chunk=chunk, max_buckets=mb,
                 ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
                 occupied=int(np.asarray(o2.sum())))


if __name__ == "__main__":
    main()
