"""Attribution profiler: where does the composed trace/voxelize time go?

Round-2 context: standalone components (coarse 22ms, gather 15ms, fine
11ms, glue 29ms) sum to ~450ms for a 6-round trace, but the composed
trace measured 1421ms and the composed render-with-shadows 4057ms.  This
script measures marginal round cost and every structural knob in ONE
process so the numbers are mutually comparable.

Run as the ONLY TPU process:  JAX_PLATFORMS= python scripts/prof_attrib.py
Optionally:  PROF_STAGES=vox,trace,render  PROF_RUNS=3
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
    stages = os.environ.get("PROF_STAGES", "vox,trace,render").split(",")
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
    from voxelray_tpu.ops.voxelize import (plan_voxelize, required_window_shape,
                                           voxelize_dense, voxelize_planned)
    from voxelray_tpu.render.camera import Camera
    from voxelray_tpu.render.pipeline import render_image

    log(f"backend={jax.default_backend()}")
    v, f = meshes.torus_knot(2, 3, 1024, 512)
    grid_res, width, height = 512, 1920, 1080
    bb_min, bb_max = mesh_bbox(v)
    extent = float(max(bb_max - bb_min))
    vs = extent / grid_res
    dims = grid_dims(bb_min, bb_max, vs)
    v_dev = jnp.asarray(v)
    org = jnp.asarray(bb_min)

    occ = None
    if "vox" in stages:
        # V1: round-1 exact repro — one global window, chunk 16384, flat
        win = required_window_shape(v, f, bb_min, vs, dims)
        tri = jnp.asarray(v[f])

        def v1():
            o, _ = voxelize_dense(tri, org, dims=dims,
                                  voxel_size_static=float(vs), window=win,
                                  chunk=16384, scatter="flat")
            return o
        dt, cs = time_call(v1, runs)
        occ = v1()
        emit(stage="vox", variant="r1_global_window_flat", window=list(win),
             ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
             occupied=int(np.asarray(occ.sum())))
        del tri

        # V2/V3/V4: planned buckets at small vs big chunks, flat vs window
        for chunk, scatter in ((16384, "flat"), (262144, "flat"),
                               (262144, "window")):
            plan = plan_voxelize(v, f, vs, bb_min=bb_min, bb_max=bb_max,
                                 chunk=chunk)
            def fn(plan=plan, scatter=scatter):
                o, _ = voxelize_planned(plan, v_dev, scatter=scatter)
                return o
            dt, cs = time_call(fn, runs)
            o2 = fn()
            emit(stage="vox", variant="planned", chunk=chunk, scatter=scatter,
                 ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
                 occupied=int(np.asarray(o2.sum())))
    if occ is None:
        plan = plan_voxelize(v, f, vs, bb_min=bb_min, bb_max=bb_max)
        occ, _ = voxelize_planned(plan, v_dev, scatter="flat")

    accel = build_accel(occ, bb_min, vs)
    center = (bb_min + bb_max) * 0.5
    cam = Camera(eye=tuple(center + np.asarray([0.9, 0.55, -0.9]) * extent),
                 center=tuple(center))
    _, _, vi, pi = cam.matrices(width, height)
    origins, dirs = make_camera_rays(width, height, jnp.asarray(vi),
                                     jnp.asarray(pi))
    log(f"accel rows={accel.coarse.shape[0]} bdims={accel.bdims}")

    if "trace" in stages:
        variants = [
            dict(rounds=1, fine_frac=4),
            dict(rounds=2, fine_frac=4),
            dict(rounds=3, fine_frac=4),
            dict(rounds=4, fine_frac=4),
            dict(rounds=6, fine_frac=4),          # prior: 1421ms
            dict(rounds=6, fine_frac=4, k_hits=2),
            dict(rounds=6, fine_frac=1),          # prior: 2639ms
            dict(rounds=6, fine_frac=4, resident_frac=1),
            dict(rounds=6, fine="walk1"),         # round-1 structure
            dict(rounds=3, fine="walk1"),
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

    if "render" in stages:
        grid = GridBool.from_occupancy(occ, bb_min, vs)
        scene = build_scene(models=None, grid=grid)
        for shadows in (False, True):
            def fn(shadows=shadows):
                return render_image(scene, vi, pi, width=width,
                                    height=height, backend="fast",
                                    shadows=shadows)
            dt, cs = time_call(fn, runs)
            emit(stage="render", shadows=shadows, ms=round(dt * 1e3, 1),
                 compile_s=round(cs, 1),
                 mrays_s=round(width * height / dt / 1e6, 2))


if __name__ == "__main__":
    main()
