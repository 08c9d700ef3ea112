"""On-chip A/B profiler for the hot paths (run as the ONLY TPU process).

One process, many variants: remote kernel compiles are 20-40 s each, so
batching every variant into a single run amortizes startup and keeps the
measurements mutually comparable.  Prints one JSON line per variant.

Usage:
  JAX_PLATFORMS= python scripts/profile_tpu.py [stages]
    stages: comma list from {vox,trace,render}, default all
  PROF_PRESET=full|mid  (default full)
  PROF_RUNS=N           (default 3)
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


def time_call(fn, runs):
    import jax
    fn()  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / runs


def main():
    stages = (sys.argv[1].split(",") if len(sys.argv) > 1
              else ["vox", "trace", "render"])
    preset = os.environ.get("PROF_PRESET", "full")
    runs = int(os.environ.get("PROF_RUNS", "3"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from voxelray_tpu.io import meshes
    from voxelray_tpu.models.grids import GridBool
    from voxelray_tpu.models.scene import build_scene
    from voxelray_tpu.ops.geometry import grid_dims, mesh_bbox
    from voxelray_tpu.ops.intersect import make_camera_rays
    from voxelray_tpu.ops.traverse_fast import build_accel, trace_grid_fast
    from voxelray_tpu.ops.voxelize import plan_voxelize, voxelize_planned
    from voxelray_tpu.render.camera import Camera
    from voxelray_tpu.render.pipeline import render_image

    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    if preset == "mid":
        v, f = meshes.torus_knot(2, 3, 512, 256)
        grid_res, width, height = 256, 1280, 720
    else:
        v, f = meshes.torus_knot(2, 3, 1024, 512)
        grid_res, width, height = 512, 1920, 1080

    bb_min, bb_max = mesh_bbox(v)
    extent = float(max(bb_max - bb_min))
    vs = extent / grid_res
    dims = grid_dims(bb_min, bb_max, vs)
    log(f"mesh {len(f)} tris dims {dims}")

    plan = plan_voxelize(v, f, vs, bb_min=bb_min, bb_max=bb_max)
    v_dev = jnp.asarray(v)

    # ---- voxelize variants ------------------------------------------------
    occ = None
    if "vox" in stages:
        for scatter in ("flat", "window"):
            def fn(scatter=scatter):
                o, _ = voxelize_planned(plan, v_dev, scatter=scatter)
                return o
            dt = time_call(fn, runs)
            occ = fn()
            emit(stage="vox", scatter=scatter, ms=round(dt * 1e3, 1),
                 mtris_s=round(len(f) / dt / 1e6, 2),
                 occupied=int(np.asarray(occ.sum())))
    if occ is None:
        occ, _ = voxelize_planned(plan, v_dev, scatter="flat")

    # ---- traversal variants ------------------------------------------------
    accel = build_accel(occ, bb_min, vs)
    center = (bb_min + bb_max) * 0.5
    cam = Camera(eye=tuple(center + np.asarray([0.9, 0.55, -0.9]) * extent),
                 center=tuple(center))
    _, _, vi, pi = cam.matrices(width, height)
    origins, dirs = make_camera_rays(width, height, jnp.asarray(vi),
                                     jnp.asarray(pi))
    log(f"accel coarse rows {accel.coarse.shape[0]} "
        f"l2 rows {accel.l2.shape[0]} bdims {accel.bdims}")

    if "trace" in stages:
        variants = [
            dict(two_level=False, fine_frac=1),
            dict(two_level=False, fine_frac=4),
            dict(two_level=True, fine_frac=4),
            dict(two_level=True, fine_frac=1),
            dict(two_level=False, fine_frac=1, fine="dense"),
        ]
        for kv in variants:
            def fn(kv=kv):
                t, lin = trace_grid_fast(origins, dirs, accel, **kv)
                return t
            try:
                dt = time_call(fn, runs)
            except Exception as e:  # keep profiling the other variants
                emit(stage="trace", error=str(e)[:200], **kv)
                continue
            t = fn()
            emit(stage="trace", ms=round(dt * 1e3, 1),
                 mrays_s=round(width * height / dt / 1e6, 2),
                 hits=int(np.isfinite(np.asarray(t)).sum()), **kv)

    # ---- full-frame render (current defaults) ------------------------------
    if "render" in stages:
        grid = GridBool.from_occupancy(occ, bb_min, vs)
        scene = build_scene(models=None, grid=grid)

        for shadows in (True, False):
            def fn(shadows=shadows):
                return render_image(scene, vi, pi, width=width,
                                    height=height, backend="fast",
                                    shadows=shadows)
            dt = time_call(fn, runs)
            emit(stage="render", shadows=shadows, ms=round(dt * 1e3, 1),
                 mrays_s=round(width * height / dt / 1e6, 2))


if __name__ == "__main__":
    main()
