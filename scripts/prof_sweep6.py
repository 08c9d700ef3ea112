"""Sweep 6: packed-row glue + two-level auto-on, end-to-end numbers.

Run as the ONLY TPU process:  JAX_PLATFORMS= python scripts/prof_sweep6.py
"""
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


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

    for kv in (dict(), dict(two_level=False)):
        def fn(kv=kv):
            t, lin = trace_grid_fast(origins, dirs, accel, **kv)
            return t
        dt, cs = time_call(fn, runs)
        t = fn()
        emit(stage="trace", ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
             mrays_s=round(width * height / dt / 1e6, 2),
             hits=int(np.isfinite(np.asarray(t)).sum()), **kv)

    t, lin = trace_grid_fast(origins, dirs, accel)
    hit = jnp.isfinite(t)
    wp = origins + dirs * jnp.where(hit, t, 1.0)[..., None]
    lp = jnp.asarray([10.0, 55.0, 8.0], jnp.float32)
    lv = lp - wp
    dist = jnp.linalg.norm(lv, axis=-1, keepdims=True)
    lv = lv / jnp.maximum(dist, 1e-20)
    for kv in (dict(), dict(rounds=2, k_hits=6)):
        def fn(kv=kv):
            return any_hit_grid_fast(wp, lv, accel, t_max=dist[..., 0],
                                     admit=hit, **kv)
        dt, cs = time_call(fn, runs)
        s = fn()
        emit(stage="shadow", ms=round(dt * 1e3, 1), compile_s=round(cs, 1),
             occluded=int(np.asarray(s).sum()), **kv)

    grid = GridBool.from_occupancy(occ, bb_min, vs)
    scene = build_scene(models=None, grid=grid)
    for shadows in (True, False):
        def fn(shadows=shadows):
            return render_image(scene, vi, pi, width=width, height=height,
                                backend="fast", shadows=shadows)
        dt, cs = time_call(fn, runs)
        emit(stage="render", shadows=shadows, ms=round(dt * 1e3, 1),
             compile_s=round(cs, 1),
             mrays_s=round(width * height / dt / 1e6, 2))

    # profile the default trace
    try:
        jax.block_until_ready(trace_grid_fast(origins, dirs, accel)[0])
        with jax.profiler.trace("/tmp/jxt6"):
            jax.block_until_ready(trace_grid_fast(origins, dirs, accel)[0])
        path = sorted(glob.glob("/tmp/jxt6/**/*.trace.json.gz",
                                recursive=True))[-1]
        with gzip.open(path) as fh:
            data = json.load(fh)
        pids = {e["pid"]: e["args"].get("name", "")
                for e in data["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        rows = collections.Counter()
        for e in data["traceEvents"]:
            if (e.get("ph") == "X" and "dur" in e
                    and pids.get(e.get("pid"), "").startswith("/device")
                    and not e.get("name", "").startswith("jit__")):
                src = (e.get("args") or {}).get("source", "?")
                op = (e.get("args") or {}).get("tf_op", e.get("name"))
                rows[(src.split("/")[-1], op.split("/")[-1])] += e["dur"]
        for (src, op), d in rows.most_common(16):
            emit(stage="profile", src=src, op=op, ms=round(d / 1e3, 2))
    except Exception as e:
        emit(stage="profile", error=str(e)[:200])


if __name__ == "__main__":
    main()
