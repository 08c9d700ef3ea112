"""Round-2 iteration profiler: the compacted/fused fast path on TPU.

Launch: JAX_PLATFORMS= PYTHONPATH=/root/repo:/root/.axon_site \
            python scripts/profile_r2.py [preset]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from voxelray_tpu.io import meshes
from voxelray_tpu.models.grids import GridBool
from voxelray_tpu.models.scene import build_scene
from voxelray_tpu.ops.geometry import grid_dims, mesh_bbox
from voxelray_tpu.ops.intersect import TMAX, TMIN, make_camera_rays
from voxelray_tpu.ops.traverse_fast import (build_accel, trace_grid_fast,
                                            any_hit_grid_fast)
from voxelray_tpu.ops.voxelize import plan_voxelize, voxelize_planned
from voxelray_tpu.render.camera import Camera
from voxelray_tpu.render.pipeline import render_image
from voxelray_tpu.utils.timing import time_fn


def log(msg):
    print(msg, flush=True)


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "full"
    if preset == "small":
        v, f = meshes.torus_knot(2, 3, 128, 64)
        grid_res, width, height = 128, 640, 360
    elif preset == "mid":
        v, f = meshes.torus_knot(2, 3, 512, 256)
        grid_res, width, height = 256, 1280, 720
    else:
        v, f = meshes.torus_knot(2, 3, 1024, 512)
        grid_res, width, height = 512, 1920, 1080

    log(f"backend={jax.default_backend()} preset={preset} "
        f"tris={len(f)} res={grid_res} {width}x{height}")

    bb_min, bb_max = mesh_bbox(v)
    extent = float(max(bb_max - bb_min))
    vs = extent / grid_res
    dims = grid_dims(bb_min, bb_max, vs)

    # ---- planned voxelize -------------------------------------------------
    plan = plan_voxelize(v, f, vs, bb_min=bb_min, bb_max=bb_max)
    slots = sum(w[0] * w[1] * w[2] * len(fi) for w, fi in plan.buckets)
    log("plan: " + ", ".join(f"{w}x{len(fi)}" for w, fi in plan.buckets))
    log(f"scatter slots: {slots/1e6:.1f}M (vs one-window baseline 151M)")
    v_dev = jnp.asarray(v)
    t, (occ, calls) = time_fn(lambda: voxelize_planned(plan, v_dev),
                              iters=3, warmup=1)
    n_occ = int(np.asarray(occ.sum()))
    log(f"voxelize_planned   {t*1e3:9.1f} ms ({len(f)/t/1e6:.2f} Mtris/s) "
        f"occ={n_occ} set_calls={int(calls)}")

    accel = build_accel(occ, bb_min, vs)
    center = (bb_min + bb_max) * 0.5
    cam = Camera(eye=tuple(center + np.asarray([0.9, 0.55, -0.9]) * extent),
                 center=tuple(center))
    _, _, vi, pi = cam.matrices(width, height)
    origins, dirs = jax.jit(
        lambda vi, pi: make_camera_rays(width, height, vi, pi))(
            jnp.asarray(vi), jnp.asarray(pi))
    n = width * height

    t, (tp, linp) = time_fn(lambda: trace_grid_fast(origins, dirs, accel),
                            iters=3, warmup=1)
    hit_frac = float(np.isfinite(np.asarray(tp)).mean())
    log(f"trace_primary      {t*1e3:9.1f} ms  hit_frac={hit_frac:.3f} "
        f"({n/t/1e6:.1f} Mrays/s)")

    # shadow with admit compaction
    wp = origins + dirs * jnp.where(jnp.isfinite(tp), tp, 1.0)[..., None]
    lp = jnp.asarray([10.0, 55.0, 8.0], jnp.float32)
    ldir = lp - wp
    ldist = jnp.linalg.norm(ldir, axis=-1)
    ldir = ldir / jnp.maximum(ldist[..., None], 1e-20)
    admit = jnp.isfinite(tp)

    t, sh = time_fn(lambda: any_hit_grid_fast(
        wp, ldir, accel, t_min=TMIN, t_max=ldist, admit=admit),
        iters=3, warmup=1)
    log(f"shadow_admit       {t*1e3:9.1f} ms  "
        f"occl={float(np.asarray(sh).mean()):.3f}")

    grid = GridBool.from_occupancy(occ, bb_min, vs)
    scene = build_scene(models=None, grid=grid)

    t, img = time_fn(lambda: render_image(
        scene, vi, pi, width=width, height=height, backend="fast"),
        iters=3, warmup=1)
    log(f"render_full        {t*1e3:9.1f} ms -> {n/t/1e6:.2f} Mrays/s "
        f"(img mean {float(np.asarray(img).mean()):.3f})")

    t, img2 = time_fn(lambda: render_image(
        scene, vi, pi, width=width, height=height, backend="fast",
        shadows=False), iters=3, warmup=1)
    log(f"render_noshadow    {t*1e3:9.1f} ms -> {n/t/1e6:.2f} Mrays/s")
    log("done")


if __name__ == "__main__":
    main()
