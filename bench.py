"""Headline benchmark: 1M-triangle voxelization to 512^3 + 1080p render.

Prints ONE JSON line on stdout:
  {"metric": "...", "value": N, "unit": "Mrays/s", "vs_baseline": N, ...}

vs_baseline is measured Mrays/s / 100 (the BASELINE.json north-star:
>= 100 Mrays/s primary rays at 1920x1080 over a 512^3 grid).
Detail timings go to stderr.

Env knobs:
  BENCH_PRESET=full|mid|small   scene scale (default full)
  BENCH_RUNS=N                  timed repetitions (default 5)
  BENCH_BACKEND=fast|dda|brute  traversal backend (default fast)
"""
import json
import os
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from voxelray_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from voxelray_tpu.io import meshes
    from voxelray_tpu.models.grids import GridBool
    from voxelray_tpu.models.scene import build_scene
    from voxelray_tpu.render.camera import Camera
    from voxelray_tpu.render.pipeline import render_image
    from voxelray_tpu.utils.timing import time_fn
    from voxelray_tpu.ops.voxelize import (required_window_shape,
                                           voxelize_dense)
    from voxelray_tpu.ops.geometry import grid_dims, mesh_bbox

    preset = os.environ.get("BENCH_PRESET", "full")
    runs = int(os.environ.get("BENCH_RUNS", "5"))
    backend = os.environ.get("BENCH_BACKEND", "fast")

    log(f"backend={jax.default_backend()} devices={jax.devices()} "
        f"preset={preset}")

    if preset == "small":
        v, f = meshes.torus_knot(2, 3, 128, 64)
        grid_res, width, height = 128, 640, 360
    elif preset == "mid":
        v, f = meshes.torus_knot(2, 3, 512, 256)
        grid_res, width, height = 256, 1280, 720
    else:
        v, f = meshes.torus_knot(2, 3, 1024, 512)   # ~1.05M triangles
        grid_res, width, height = 512, 1920, 1080

    bb_min, bb_max = mesh_bbox(v)
    extent = float(max(bb_max - bb_min))
    vs = extent / grid_res
    dims = grid_dims(bb_min, bb_max, vs)
    log(f"mesh: {len(f)} tris, dims {dims}, voxel {vs:.5f}")

    # ---- voxelize (timed; single-window jit path — the bucketed host
    # wrapper pays per-call host work, wrong for per-frame re-voxelize) ---
    # exact per-axis window (pow2 rounding would inflate the scatter
    # slot count ~3x; per-mesh recompiles are fine here)
    win = required_window_shape(v, f, bb_min, vs, dims)
    tri = jnp.asarray(v[f])
    org = jnp.asarray(bb_min)

    def build():
        occ, calls = voxelize_dense(
            tri, org, dims=dims, voxel_size_static=float(vs), window=win,
            chunk=16384)
        return occ

    t_build, occ = time_fn(build, iters=max(1, runs // 2), warmup=1)
    n_occ = int(np.asarray(occ.sum()))
    log(f"voxelize: {t_build*1e3:.1f} ms ({len(f)/t_build/1e6:.2f} Mtris/s), "
        f"{n_occ} occupied")

    # ---- render (timed) -----------------------------------------------
    grid = GridBool.from_occupancy(occ, bb_min, vs)
    scene = build_scene(models=None, grid=grid)
    center = (bb_min + bb_max) * 0.5
    cam = Camera(eye=tuple(center + np.asarray([0.9, 0.55, -0.9])
                           * extent), center=tuple(center))
    _, _, vi, pi = cam.matrices(width, height)

    def render():
        return render_image(scene, vi, pi, width=width, height=height,
                            backend=backend)

    t_render, img = time_fn(render, iters=runs, warmup=1)
    mrays = width * height / t_render / 1e6
    img_np = np.asarray(img)
    log(f"render: {t_render*1e3:.1f} ms -> {mrays:.1f} Mrays/s "
        f"(img mean {img_np.mean():.3f})")

    print(json.dumps({
        "metric": f"primary-ray Mrays/s @{width}x{height}, "
                  f"{grid_res}^3 grid, {len(f)} tris",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
        "voxelize_ms": round(t_build * 1e3, 2),
        "voxelize_mtris_per_s": round(len(f) / t_build / 1e6, 2),
        "render_ms": round(t_render * 1e3, 2),
        "occupied_voxels": n_occ,
        "backend": backend,
        "preset": preset,
    }))


if __name__ == "__main__":
    main()
