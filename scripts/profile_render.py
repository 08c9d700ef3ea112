"""On-TPU cost breakdown of the full-preset pipeline (round-2 planning).

Times each stage of the fast traversal in isolation so optimization
effort goes where the milliseconds are:

  voxelize        full scatter path vs SAT-compute-only (scatter cost)
  build_accel     brick accel build
  coarse_walk     Pallas brick DDA, round-1 shape (all 2M rays)
  fine_gather     the (16, NB) -> (16, N) HBM take for one slot
  fine_walk       Pallas in-brick DDA for one slot
  trace_primary   trace_grid_fast end to end
  shadow_anyhit   any_hit_grid_fast on the shadow-ray shapes
  render_full     render_image (the bench number)

Launch: JAX_PLATFORMS= PYTHONPATH=/root/repo:/root/.axon_site \
            python scripts/profile_render.py [preset]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from voxelray_tpu.io import meshes
from voxelray_tpu.models.grids import GridBool
from voxelray_tpu.models.scene import build_scene
from voxelray_tpu.ops.geometry import grid_dims, mesh_bbox
from voxelray_tpu.ops.intersect import TMAX, TMIN, make_camera_rays
from voxelray_tpu.ops.sat import tri_box_overlap
from voxelray_tpu.ops.traverse_fast import (BRICK, build_accel,
                                            trace_grid_fast)
from voxelray_tpu.ops.pallas.grid_walk import coarse_walk
from voxelray_tpu.ops.pallas.brick_fine import fine_walk
from voxelray_tpu.ops.voxelize import required_window_shape, voxelize_dense
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
    win = required_window_shape(v, f, bb_min, vs, dims)
    log(f"dims={dims} window={win}")
    tri = jnp.asarray(v[f])
    org = jnp.asarray(bb_min)

    # ---- voxelize: full vs SAT-only --------------------------------------
    def vox_full():
        occ, calls = voxelize_dense(
            tri, org, dims=dims, voxel_size_static=float(vs), window=win,
            chunk=16384)
        return occ

    t, occ = time_fn(vox_full, iters=3, warmup=1)
    log(f"voxelize_full      {t*1e3:9.1f} ms  "
        f"({len(f)/t/1e6:.2f} Mtris/s)")

    # SAT-compute-only: same windows + SAT, reduce instead of scatter
    @jax.jit
    def vox_sat_only(tri):
        nx, ny, nz = dims
        wx, wy, wz = win
        cap = wx * wy * wz
        vsf = jnp.float32(vs)
        half = jnp.float32(vs * 0.5)
        k = np.arange(cap)
        dx = jnp.asarray((k % wx).astype(np.int32))
        dy = jnp.asarray(((k // wx) % wy).astype(np.int32))
        dz = jnp.asarray((k // (wx * wy)).astype(np.int32))
        total = jnp.int32(0)
        chunk = 16384
        n_chunks = -(-tri.shape[0] // chunk)
        pad = n_chunks * chunk - tri.shape[0]
        trip = jnp.pad(tri, ((0, pad), (0, 0), (0, 0)),
                       constant_values=np.inf).reshape(n_chunks, chunk, 3, 3)
        for c in range(n_chunks):
            t3 = trip[c]
            v0, v1, v2 = t3[:, 0], t3[:, 1], t3[:, 2]
            tmin = jnp.minimum(v0, jnp.minimum(v1, v2))
            tmax = jnp.maximum(v0, jnp.maximum(v1, v2))
            finite = jnp.isfinite(tmin).all(axis=-1)
            tmin = jnp.where(finite[:, None], tmin, 0.0)
            tmax = jnp.where(finite[:, None], tmax, -1.0)
            start = jnp.maximum(0, ((tmin - org) / vsf).astype(jnp.int32))
            end = jnp.minimum(jnp.asarray(dims, jnp.int32),
                              ((tmax - org) / vsf).astype(jnp.int32) + 2)
            w = jnp.where(finite[:, None], jnp.maximum(end - start, 0), 0)
            inside = ((dx[None] < w[:, 0:1]) & (dy[None] < w[:, 1:2])
                      & (dz[None] < w[:, 2:3]))
            cx = start[:, 0:1] + dx[None]
            cy = start[:, 1:2] + dy[None]
            cz = start[:, 2:3] + dz[None]
            centers = jnp.stack(
                [org[0] + (cx.astype(jnp.float32) + 0.5) * vsf,
                 org[1] + (cy.astype(jnp.float32) + 0.5) * vsf,
                 org[2] + (cz.astype(jnp.float32) + 0.5) * vsf], axis=-1)
            hit = inside & tri_box_overlap(centers, half, v0[:, None],
                                           v1[:, None], v2[:, None])
            lin = jnp.where(hit, cx + nx * (cy + ny * cz), 0)
            total = total + hit.sum(dtype=jnp.int32) + (
                lin.sum(dtype=jnp.int32) & 1)
        return total

    t, _ = time_fn(lambda: vox_sat_only(tri), iters=3, warmup=1)
    log(f"voxelize_sat_only  {t*1e3:9.1f} ms   (scatter = full - this)")

    # ---- accel ------------------------------------------------------------
    occ_host = np.asarray(occ)
    n_occ = int(occ_host.sum())
    log(f"occupied={n_occ}")
    t, accel = time_fn(lambda: build_accel(occ, bb_min, vs), iters=2,
                       warmup=1)
    log(f"build_accel        {t*1e3:9.1f} ms  coarse={accel.coarse.shape} "
        f"fine={accel.fine.shape}")
    nb_occ = int(np.asarray(
        (accel.fine.sum(axis=0) > 0).sum()))
    log(f"occupied bricks    {nb_occ} / {accel.fine.shape[1]}")

    # ---- rays -------------------------------------------------------------
    center = (bb_min + bb_max) * 0.5
    cam = Camera(eye=tuple(center + np.asarray([0.9, 0.55, -0.9]) * extent),
                 center=tuple(center))
    _, _, vi, pi = cam.matrices(width, height)
    origins, dirs = jax.jit(
        lambda vi, pi: make_camera_rays(width, height, vi, pi))(
            jnp.asarray(vi), jnp.asarray(pi))
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    n = o.shape[0]
    tmax = jnp.full((n,), TMAX, jnp.float32)
    log(f"rays n={n}")

    # coarse walk round-1 shape
    from voxelray_tpu.ops.traverse_fast import _init_state
    cx, cy, cz, act = jax.jit(
        lambda o, d, tm: _init_state(o, d, accel, tm))(o, d, tmax)
    rows = accel.coarse.shape[0]
    bq = 64 if rows <= 8 else min(64, max(8, 2048 // rows // 8 * 8))
    log(f"rows={rows} bq={bq}")
    bw = float(accel.voxel_size * BRICK)

    def run_coarse():
        return coarse_walk(o[:, 0], o[:, 1], o[:, 2],
                           d[:, 0], d[:, 1], d[:, 2],
                           cx, cy, cz, act.astype(jnp.int32), tmax,
                           accel.coarse, bdims=accel.bdims,
                           origin_key=accel.origin_key, brick_world=bw,
                           bq=bq, k_hits=4)

    t, res = time_fn(run_coarse, iters=3, warmup=1)
    hits = res[0]
    nhit0 = int(np.asarray((np.asarray(hits[0]) >= 0).sum()))
    nhit3 = int(np.asarray((np.asarray(hits[3]) >= 0).sum()))
    log(f"coarse_walk r1     {t*1e3:9.1f} ms  slot0_hits={nhit0} "
        f"slot3_hits={nhit3} ({nhit0/n:.2%} of rays)")

    # fine gather (one slot)
    bl = jnp.maximum(hits[0], 0)

    @jax.jit
    def gather(bl):
        return jnp.take(accel.fine, bl, axis=1)

    t, words = time_fn(lambda: gather(bl), iters=3, warmup=1)
    log(f"fine_gather x1     {t*1e3:9.1f} ms  (x4 slots x rounds)")

    # fine walk (one slot)
    def run_fine():
        return fine_walk(o[:, 0], o[:, 1], o[:, 2],
                         d[:, 0], d[:, 1], d[:, 2],
                         hits[0], words, jnp.float32(TMIN), tmax,
                         dims=accel.dims, bdims=accel.bdims,
                         origin_key=accel.origin_key,
                         voxel_size=accel.voxel_size, bq=bq)

    t, (tf, linf) = time_fn(run_fine, iters=3, warmup=1)
    nres = int(np.asarray(np.isfinite(np.asarray(tf)).sum()))
    log(f"fine_walk x1       {t*1e3:9.1f} ms  resolved={nres} "
        f"({nres/max(nhit0,1):.2%} of slot0 hits)")

    # ---- end-to-end -------------------------------------------------------
    def primary():
        return trace_grid_fast(origins, dirs, accel)

    t, (tp, linp) = time_fn(primary, iters=3, warmup=1)
    hit_frac = float(np.isfinite(np.asarray(tp)).mean())
    log(f"trace_primary      {t*1e3:9.1f} ms  hit_frac={hit_frac:.3f}")

    # shadow shape: origins at hit points, dirs to light
    grid = GridBool.from_occupancy(occ, bb_min, vs)
    scene = build_scene(models=None, grid=grid)
    wp = origins + dirs * jnp.where(jnp.isfinite(tp), tp, 1.0)[..., None]
    lp = jnp.asarray([10.0, 55.0, 8.0], jnp.float32)
    ldir = lp - wp
    ldist = jnp.linalg.norm(ldir, axis=-1)
    ldir = ldir / jnp.maximum(ldist[..., None], 1e-20)

    from voxelray_tpu.ops.traverse_fast import any_hit_grid_fast

    def shadow():
        return any_hit_grid_fast(wp, ldir, accel, t_min=TMIN, t_max=ldist)

    t, sh = time_fn(shadow, iters=3, warmup=1)
    log(f"shadow_anyhit      {t*1e3:9.1f} ms  "
        f"occl={float(np.asarray(sh).mean()):.3f}")

    def rfull():
        return render_image(scene, vi, pi, width=width, height=height,
                            backend="fast")

    t, img = time_fn(rfull, iters=3, warmup=1)
    log(f"render_full        {t*1e3:9.1f} ms -> "
        f"{width*height/t/1e6:.2f} Mrays/s "
        f"(img mean {float(np.asarray(img).mean()):.3f})")

    def rnoshadow():
        return render_image(scene, vi, pi, width=width, height=height,
                            backend="fast", shadows=False)

    t, _ = time_fn(rnoshadow, iters=3, warmup=1)
    log(f"render_noshadow    {t*1e3:9.1f} ms -> "
        f"{width*height/t/1e6:.2f} Mrays/s")
    log("done")


if __name__ == "__main__":
    main()
