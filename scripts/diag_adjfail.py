"""Print details for rays that FAIL bench.py's adjudication criteria.

Rebuilds the bench full-preset scene and camera exactly, traces with
both backends, recomputes the host f32 (no-FMA) oracle for each
fast-vs-dda differing ray, and prints only rays where the fast result
does not match the oracle under bench.py's acceptance test
(cell equal AND |t_f - t_oracle| <= 2e-6 rel).

Usage (solo TPU process):
  JAX_PLATFORMS= python scripts/diag_adjfail.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax.numpy as jnp

    from voxelray_tpu.io import meshes
    from voxelray_tpu.models.grids import GridBool
    from voxelray_tpu.models.scene import build_scene
    from voxelray_tpu.ops.geometry import grid_dims, mesh_bbox
    from voxelray_tpu.ops.intersect import make_camera_rays
    from voxelray_tpu.ops.traverse import trace_grid_dda
    from voxelray_tpu.ops.traverse_fast import trace_grid_fast
    from voxelray_tpu.ops.voxelize import plan_voxelize, voxelize_planned
    from voxelray_tpu.render.camera import Camera

    v, f = meshes.torus_knot(2, 3, 1024, 512)
    grid_res, width, height = 512, 1920, 1080
    bb_min, bb_max = mesh_bbox(v)
    extent = float(max(bb_max - bb_min))
    vs = extent / grid_res
    dims = grid_dims(bb_min, bb_max, vs)
    plan = plan_voxelize(v, f, vs, bb_min=bb_min, bb_max=bb_max)
    occ, _ = voxelize_planned(plan, jnp.asarray(v))
    grid = GridBool.from_occupancy(occ, bb_min, vs)
    scene = build_scene(models=None, grid=grid)
    center = (bb_min + bb_max) * 0.5
    cam = Camera(eye=tuple(center + np.asarray([0.9, 0.55, -0.9]) * extent),
                 center=tuple(center))
    _, _, vi, pi = cam.matrices(width, height)
    o, d = make_camera_rays(width, height, jnp.asarray(vi), jnp.asarray(pi))
    t_f, lin_f, unresolved = trace_grid_fast(o, d, scene.accel,
                                             return_stats=True)
    t_d, lin_d = trace_grid_dda(
        o, d, scene.occ_flat, scene.grid_origin, dims=scene.grid_dims,
        voxel_size_static=scene.grid_voxel_size)

    t_f = np.asarray(t_f).reshape(-1)
    t_d = np.asarray(t_d).reshape(-1)
    lin_f = np.asarray(lin_f).reshape(-1)
    lin_d = np.asarray(lin_d).reshape(-1)
    hf, hd = np.isfinite(t_f), np.isfinite(t_d)
    diff = (hf != hd) | (hf & hd & (lin_f != lin_d))
    idx = np.flatnonzero(diff)
    print(f"unresolved={int(unresolved)} fast_hits={hf.sum()} "
          f"dda_hits={hd.sum()} differing={len(idx)}", flush=True)

    occ_np = np.asarray(occ).astype(bool)
    o_np = np.asarray(o).reshape(-1, 3)
    d_np = np.asarray(d).reshape(-1, 3)
    TMIN, TMAX = np.float32(0.001), np.float32(10000.0)
    nz, ny_, nx = occ_np.shape
    lin_occ = np.flatnonzero(occ_np.reshape(-1))
    x = lin_occ % nx
    y = (lin_occ // nx) % ny_
    z = lin_occ // (nx * ny_)
    vsf = np.float32(vs)
    half = np.float32(0.5) * vsf
    org = np.asarray(bb_min, np.float32)
    cx = org[0] + (x.astype(np.float32) + 0.5) * vsf
    cy = org[1] + (y.astype(np.float32) + 0.5) * vsf
    cz = org[2] + (z.astype(np.float32) + 0.5) * vsf
    lo = np.stack([cx - half, cy - half, cz - half], axis=1)
    hi = np.stack([cx + half, cy + half, cz + half], axis=1)

    n_fail = 0
    for i in idx:
        oo = o_np[i].astype(np.float32)
        inv = np.float32(1.0) / d_np[i].astype(np.float32)
        tbot = inv * (lo - oo)
        ttop = inv * (hi - oo)
        t0 = np.minimum(tbot, ttop).max(axis=1)
        t1 = np.maximum(tbot, ttop).min(axis=1)
        ok = (t1 > np.maximum(t0, np.float32(0.0))) \
            & (t0 >= TMIN) & (t0 <= TMAX)
        t0m = np.where(ok, t0, np.inf)
        j = int(np.argmin(t0m))
        orc_t = float(t0m[j])
        orc_lin = int(lin_occ[j]) if np.isfinite(orc_t) else -1
        fast_hit = np.isfinite(t_f[i])
        fast_ok = False
        if fast_hit and orc_lin >= 0:
            fast_ok = (int(lin_f[i]) == orc_lin and
                       abs(float(t_f[i]) - orc_t) <= 2e-6 * abs(orc_t))
        elif not fast_hit and orc_lin < 0:
            fast_ok = True
        if fast_ok:
            continue
        n_fail += 1
        print(f"FAIL ray {i}: fast_hit={fast_hit} "
              f"fast=({t_f[i]:.9g},{lin_f[i]}) "
              f"dda=({t_d[i]:.9g},{lin_d[i]}) "
              f"oracle=({orc_t:.9g},{orc_lin})")
        for tag, lin_q in (("fast", int(lin_f[i])), ("dda", int(lin_d[i])),
                           ("oracle", orc_lin)):
            if lin_q < 0 or not (("fast" != tag) or fast_hit):
                continue
            w = np.flatnonzero(lin_occ == lin_q)
            if len(w) == 0:
                print(f"  {tag} cell {lin_q}: NOT OCCUPIED?!")
                continue
            k = w[0]
            gap = float(t1[k]) - max(float(t0[k]), 0.0)
            print(f"  {tag} cell {lin_q}: t0={t0[k]:.9g} t1={t1[k]:.9g} "
                  f"t1-max(t0,0)={gap:.3g} ok={bool(ok[k])} "
                  f"t0>=TMIN={bool(t0[k] >= TMIN)}")
        # ray geometry for offline reproduction
        print(f"  o={o_np[i].tolist()} d={d_np[i].tolist()}")
    print(f"adjudication failures: {n_fail}/{len(idx)}")


if __name__ == "__main__":
    main()
