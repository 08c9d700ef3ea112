"""Profile the full shadowed render jit: where do the non-trace ms go?

Run as the ONLY TPU process:  JAX_PLATFORMS= python scripts/prof_render.py
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


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from voxelray_tpu.io import meshes
    from voxelray_tpu.models.grids import GridBool
    from voxelray_tpu.models.scene import build_scene
    from voxelray_tpu.ops.geometry import mesh_bbox
    from voxelray_tpu.ops.voxelize import plan_voxelize, voxelize_planned
    from voxelray_tpu.render.camera import Camera
    from voxelray_tpu.render.pipeline import render_image

    log(f"backend={jax.default_backend()}")
    v, f = meshes.torus_knot(2, 3, 1024, 512)
    grid_res, width, height = 512, 1920, 1080
    bb_min, bb_max = mesh_bbox(v)
    extent = float(max(bb_max - bb_min))
    vs = extent / grid_res
    plan = plan_voxelize(v, f, vs, bb_min=bb_min, bb_max=bb_max)
    occ, _ = voxelize_planned(plan, jnp.asarray(v))
    grid = GridBool.from_occupancy(occ, bb_min, vs)
    scene = build_scene(models=None, grid=grid)
    center = (bb_min + bb_max) * 0.5
    cam = Camera(eye=tuple(center + np.asarray([0.9, 0.55, -0.9]) * extent),
                 center=tuple(center))
    _, _, vi, pi = cam.matrices(width, height)

    def fn():
        return render_image(scene, vi, pi, width=width, height=height,
                            backend="fast", shadows=True)
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn()
    jax.block_until_ready(out)
    emit(stage="render", ms=round((time.perf_counter() - t0) / 5 * 1e3, 1))

    with jax.profiler.trace("/tmp/jxtr"):
        jax.block_until_ready(fn())
    path = sorted(glob.glob("/tmp/jxtr/**/*.trace.json.gz",
                            recursive=True))[-1]
    with gzip.open(path) as fh:
        data = json.load(fh)
    pids = {e["pid"]: e["args"].get("name", "")
            for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    rows = collections.Counter()
    total = 0
    for e in data["traceEvents"]:
        if (e.get("ph") == "X" and "dur" in e
                and pids.get(e.get("pid"), "").startswith("/device")
                and not e.get("name", "").startswith("jit__")):
            src = (e.get("args") or {}).get("source", "?")
            op = (e.get("args") or {}).get("tf_op", e.get("name"))
            rows[(src.split("/")[-1], op.split("/")[-1])] += e["dur"]
            total += e["dur"]
    emit(stage="profile_total", ms=round(total / 1e3, 1))
    for (src, op), d in rows.most_common(28):
        emit(stage="profile", src=src, op=op, ms=round(d / 1e3, 2))


if __name__ == "__main__":
    main()
