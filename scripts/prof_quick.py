"""Quick trace/shadow/render measurement with a cached occupancy grid.

The full-preset voxelize costs ~11 min of remote compile per process;
this script voxelizes once, saves occupancy to /tmp/occ512.npz, and
reuses it on later runs so a measurement round-trip is ~3 min.

Run as the ONLY TPU process:  JAX_PLATFORMS= python scripts/prof_quick.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CACHE = "/tmp/occ512.npz"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def time_call(fn, runs=5):
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
    runs = int(os.environ.get("PROF_RUNS", "5"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from voxelray_tpu.io import meshes
    from voxelray_tpu.models.grids import GridBool
    from voxelray_tpu.models.scene import build_scene
    from voxelray_tpu.ops.geometry import mesh_bbox
    from voxelray_tpu.ops.intersect import make_camera_rays
    from voxelray_tpu.ops.traverse_fast import (any_hit_grid_fast,
                                                build_accel, trace_grid_fast)
    from voxelray_tpu.render.camera import Camera
    from voxelray_tpu.render.pipeline import render_image

    log(f"backend={jax.default_backend()}")
    v, f = meshes.torus_knot(2, 3, 1024, 512)
    grid_res, width, height = 512, 1920, 1080
    bb_min, bb_max = mesh_bbox(v)
    extent = float(max(bb_max - bb_min))
    vs = extent / grid_res

    if os.path.exists(CACHE):
        occ = jnp.asarray(np.load(CACHE)["occ"])
        log("occupancy loaded from cache")
    else:
        from voxelray_tpu.ops.voxelize import plan_voxelize, voxelize_planned
        plan = plan_voxelize(v, f, vs, bb_min=bb_min, bb_max=bb_max)
        occ, _ = voxelize_planned(plan, jnp.asarray(v))
        np.savez_compressed(CACHE, occ=np.asarray(occ))
        log("occupancy voxelized + cached")

    accel = build_accel(occ, bb_min, vs)
    center = (bb_min + bb_max) * 0.5
    cam = Camera(eye=tuple(center + np.asarray([0.9, 0.55, -0.9]) * extent),
                 center=tuple(center))
    _, _, vi, pi = cam.matrices(width, height)
    origins, dirs = make_camera_rays(width, height, jnp.asarray(vi),
                                     jnp.asarray(pi))

    def trace():
        return trace_grid_fast(origins, dirs, accel)[0]
    dt, cs = time_call(trace, runs)
    t = trace()
    emit(stage="trace", ms=round(dt * 1e3, 1),
         mrays_s=round(width * height / dt / 1e6, 2),
         hits=int(np.isfinite(np.asarray(t)).sum()))

    hit = jnp.isfinite(t)
    wp = origins + dirs * jnp.where(hit, t, 1.0)[..., None]
    lp = jnp.asarray([10.0, 55.0, 8.0], jnp.float32)
    lv = lp - wp
    dist = jnp.linalg.norm(lv, axis=-1, keepdims=True)
    lv = lv / jnp.maximum(dist, 1e-20)

    def shadow():
        return any_hit_grid_fast(wp, lv, accel, t_max=dist[..., 0],
                                 admit=hit)
    dt, cs = time_call(shadow, runs)
    s = shadow()
    emit(stage="shadow", ms=round(dt * 1e3, 1),
         occluded=int(np.asarray(s).sum()))

    grid = GridBool.from_occupancy(occ, bb_min, vs)
    scene = build_scene(models=None, grid=grid)
    for shadows in (True, False):
        def fn(shadows=shadows):
            return render_image(scene, vi, pi, width=width, height=height,
                                backend="fast", shadows=shadows)
        dt, cs = time_call(fn, runs)
        emit(stage="render", shadows=shadows, ms=round(dt * 1e3, 1),
             mrays_s=round(width * height / dt / 1e6, 2))


if __name__ == "__main__":
    main()
