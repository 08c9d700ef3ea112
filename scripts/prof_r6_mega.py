"""Round-5: megakernel trace on chip — exactness gate + knob sweep.

Builds the bench scene (1M-tri knot, 512^3), verifies trace_grid_mega
against the production fast backend (hits/cells exact, t to 2e-6 —
residual diffs are the adjudicated FMA class), then times pipelined
mega vs fast over 8 orbit cameras and sweeps (bq, serves_per_it).

Run SOLO on TPU:
  JAX_PLATFORMS= PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/prof_r6_mega.py
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from voxelray_tpu.io import meshes
    from voxelray_tpu.models.grids import GridBool
    from voxelray_tpu.models.scene import build_scene
    from voxelray_tpu.ops.geometry import mesh_bbox
    from voxelray_tpu.ops.intersect import make_camera_rays
    from voxelray_tpu.ops.traverse_fast import trace_grid_fast
    from voxelray_tpu.ops.pallas.mega_trace import trace_grid_mega
    from voxelray_tpu.render.camera import orbit_path
    from voxelray_tpu.render.pipeline import _tile_rays

    log(backend=jax.default_backend())
    W, H = 1920, 1080
    v, f = meshes.torus_knot(2, 3, 1024, 512)
    bb_min, bb_max = mesh_bbox(v)
    vs = float(max(bb_max - bb_min)) / 512
    t0 = time.time()
    cache = "/tmp/bench_occ512.npz"
    import os
    if os.path.exists(cache):
        z = np.load(cache)
        grid = GridBool.from_occupancy(jnp.asarray(z["occ"]), z["origin"],
                                       float(z["vs"]))
        log(stage="occ_cache", hit=True)
    else:
        grid = GridBool.from_mesh(v, f, vs)
        occ_np = np.asarray(grid.occupancy()).astype(np.uint8)
        np.savez_compressed(cache, occ=occ_np,
                            origin=np.asarray(grid.origin, np.float32),
                            vs=np.float32(grid.voxel_size))
    scene = build_scene(models=None, grid=grid)
    jax.block_until_ready(scene.accel.fine_sb)
    log(stage="scene", dims=list(grid.dims), s=round(time.time() - t0, 1))

    center = tuple(((bb_min + bb_max) * 0.5).tolist())
    radius = float(np.max(bb_max - bb_min)) * 1.2
    cams = list(orbit_path(8, center=center, radius=radius,
                           height=center[1] + radius * 0.3))
    mats = [c.matrices(W, H)[2:] for c in cams]
    rays = []
    for vi, pi in mats:
        o, d = make_camera_rays(W, H, jnp.asarray(vi), jnp.asarray(pi))
        rays.append((_tile_rays(o, H, W), _tile_rays(d, H, W)))
    jax.block_until_ready(rays)

    # ---- exactness gate (camera 0) ------------------------------------
    t_f, lin_f = trace_grid_fast(*rays[0], scene.accel)
    t_m, lin_m, alive = trace_grid_mega(*rays[0], scene.accel,
                                        0.001, 10000.0,
                                        return_stats=True)
    t_f, lin_f = np.asarray(t_f), np.asarray(lin_f)
    t_m, lin_m = np.asarray(t_m), np.asarray(lin_m)
    hf, hm = np.isfinite(t_f), np.isfinite(t_m)
    both = hf & hm
    diff = (hf != hm) | (both & (lin_f != lin_m))
    t_ok = np.allclose(t_m[both & (lin_f == lin_m)],
                       t_f[both & (lin_f == lin_m)], rtol=2e-6, atol=0.0)
    log(stage="exact", fast_hits=int(hf.sum()), mega_hits=int(hm.sum()),
        diffs=int(diff.sum()), t_ok=bool(t_ok), alive=int(alive))

    # ---- timing: pipelined over 8 cameras -----------------------------
    def timed(fn, tag):
        jax.block_until_ready([fn(*r) for r in rays])
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready([fn(*r) for r in rays])
            best = min(best, (time.perf_counter() - t0) / len(rays))
        log(stage="timing", tag=tag, ms=round(best * 1e3, 1))
        return best

    timed(lambda o, d: trace_grid_fast(o, d, scene.accel), "fast")

    # per-block profile at the current best config: where do iterations
    # go (walk chunks vs serve rounds)?
    _, _, _, prof = trace_grid_mega(*rays[0], scene.accel, 0.001,
                                    10000.0, bq=8, serves_per_it=1,
                                    n_serve_sb=4, return_stats="prof")
    prof = np.asarray(prof)
    its, srv, wk = prof >> 20, (prof >> 10) & 1023, prof & 1023
    def q(x):
        return [int(np.percentile(x, p)) for p in (50, 90, 99, 100)]
    log(stage="prof", blocks=len(prof), iters_q=q(its), serves_q=q(srv),
        walk_chunks_q=q(wk), iters_sum=int(its.sum()),
        serves_sum=int(srv.sum()), walk_sum=int(wk.sum()))

    sweep = [(8, 1, 4, 13, 1), (8, 1, 4, 0, 1), (16, 1, 4, 13, 1),
             (8, 2, 4, 13, 1), (8, 1, 2, 13, 1), (8, 1, 4, 13, 0),
             (8, 1, 4, 0, 0)]
    if len(sys.argv) > 1:
        sweep = [tuple(map(int, a.split(","))) for a in sys.argv[1:]
                 if "," in a]
    for cfg in sweep:
        bq, spi, nsb, fu, tr = cfg[:5]
        asp = cfg[5] if len(cfg) > 5 else 4
        try:
            t0 = time.time()
            fn = lambda o, d: trace_grid_mega(
                o, d, scene.accel, 0.001, 10000.0, bq=bq,
                serves_per_it=spi, n_serve_sb=nsb, fine_unroll=fu,
                transit=bool(tr), a_steps=asp)
            t_m, lin_m, alive, prof2 = trace_grid_mega(
                *rays[0], scene.accel, 0.001, 10000.0, bq=bq,
                serves_per_it=spi, n_serve_sb=nsb, fine_unroll=fu,
                transit=bool(tr), a_steps=asp, return_stats="prof")
            jax.block_until_ready(t_m)
            hm2 = np.isfinite(np.asarray(t_m))
            prof2 = np.asarray(prof2)
            log(stage="compile", bq=bq, spi=spi, nsb=nsb, fu=fu, tr=tr,
                s=round(time.time() - t0, 1), hits=int(hm2.sum()),
                alive=int(alive),
                iters=int((prof2 >> 20).sum()),
                serves=int(((prof2 >> 10) & 1023).sum()),
                walks=int((prof2 & 1023).sum()),
                hits_eq_fast=bool(np.array_equal(hm2, hf)))
            timed(fn, f"mega_bq{bq}_s{spi}_n{nsb}_f{fu}_t{tr}_a{asp}")
        except Exception as e:
            log(stage="error", bq=bq, spi=spi, nsb=nsb, fu=fu, tr=tr,
                err=f"{type(e).__name__}: {e}"[:400])


if __name__ == "__main__" and "--abl" not in sys.argv:
    main()


def ablations():
    """Timing-only ablation ladder at the winning config (results are
    garbage for nodma/nofetch/nofine/nol1 — structure timing only)."""
    from voxelray_tpu.io import meshes
    from voxelray_tpu.models.grids import GridBool
    from voxelray_tpu.models.scene import build_scene
    from voxelray_tpu.ops.geometry import mesh_bbox
    from voxelray_tpu.ops.intersect import make_camera_rays
    from voxelray_tpu.ops.pallas.mega_trace import trace_grid_mega
    from voxelray_tpu.render.camera import orbit_path
    from voxelray_tpu.render.pipeline import _tile_rays

    log(backend=jax.default_backend())
    W, H = 1920, 1080
    v, f = meshes.torus_knot(2, 3, 1024, 512)
    bb_min, bb_max = mesh_bbox(v)
    z = np.load("/tmp/bench_occ512.npz")
    grid = GridBool.from_occupancy(jnp.asarray(z["occ"]), z["origin"],
                                   float(z["vs"]))
    scene = build_scene(models=None, grid=grid)
    jax.block_until_ready(scene.accel.fine_sb)
    log(stage="scene_ready")
    center = tuple(((bb_min + bb_max) * 0.5).tolist())
    radius = float(np.max(bb_max - bb_min)) * 1.2
    cams = list(orbit_path(8, center=center, radius=radius,
                           height=center[1] + radius * 0.3))
    rays = []
    for c in cams:
        vi, pi = c.matrices(W, H)[2:]
        o, d = make_camera_rays(W, H, jnp.asarray(vi), jnp.asarray(pi))
        rays.append((_tile_rays(o, H, W), _tile_rays(d, H, W)))
    jax.block_until_ready(rays)

    def timed(fn, tag):
        jax.block_until_ready([fn(*r) for r in rays])
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready([fn(*r) for r in rays])
            best = min(best, (time.perf_counter() - t0) / len(rays))
        log(stage="timing", tag=tag, ms=round(best * 1e3, 1))

    for mode in (None, "nofine", "nofetch", "nodma", "nol1"):
        fn = lambda o, d: trace_grid_mega(
            o, d, scene.accel, 0.001, 10000.0, bq=8, serves_per_it=1,
            n_serve_sb=4, prof_mode=mode)
        timed(fn, f"abl_{mode}")


if __name__ == "__main__" and "--abl" in sys.argv:
    ablations()
