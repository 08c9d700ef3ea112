"""Diagnose full-scale fast-vs-dda hit mismatches (bench parity gate).

Rebuilds the bench full-preset scene, traces with both backends, and
adjudicates every differing ray against the trusted numpy f32 (no-FMA)
brute slab test over ALL occupied cells — the oracle_render semantics.

Usage (solo TPU process):
  JAX_PLATFORMS= python scripts/diag_hitdiff.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
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
          f"dda_hits={hd.sum()} differing={len(idx)}")

    o_np = np.asarray(o).reshape(-1, 3)
    d_np = np.asarray(d).reshape(-1, 3)
    occ_np = np.asarray(occ).astype(bool)
    nz, ny_, nx = occ_np.shape
    lin_occ = np.flatnonzero(occ_np.transpose(0, 1, 2).reshape(-1))
    # occ is (Z, Y, X); linear cell index convention is x-fastest:
    # lin = x + nx*(y + ny*z) — flatnonzero of (Z,Y,X) gives
    # z*ny*nx + y*nx + x which IS x + nx*(y + ny*z). Same thing.
    x = lin_occ % nx
    y = (lin_occ // nx) % ny_
    z = lin_occ // (nx * ny_)
    vsf = np.float32(vs)
    half = np.float32(0.5) * vsf
    org = np.asarray(bb_min, np.float32)
    cx = org[0] + (x.astype(np.float32) + 0.5) * vsf
    cy = org[1] + (y.astype(np.float32) + 0.5) * vsf
    cz = org[2] + (z.astype(np.float32) + 0.5) * vsf
    aabbs = np.stack([cx - half, cy - half, cz - half,
                      cx + half, cy + half, cz + half], axis=1)

    TMIN, TMAX = np.float32(0.001), np.float32(10000.0)
    for i in idx[:16]:
        oo = o_np[i].astype(np.float32)
        dd = d_np[i].astype(np.float32)
        inv = np.float32(1.0) / dd
        tbot = inv * (aabbs[:, 0:3] - oo)
        ttop = inv * (aabbs[:, 3:6] - oo)
        t0 = np.minimum(tbot, ttop).max(axis=1)
        t1 = np.maximum(tbot, ttop).min(axis=1)
        ok = (t1 > np.maximum(t0, np.float32(0.0))) & (t0 > 0.0) \
            & (t0 >= TMIN) & (t0 <= TMAX)
        t0m = np.where(ok, t0, np.inf)
        j = int(np.argmin(t0m))
        oracle_t = float(t0m[j])
        oracle_lin = int(lin_occ[j]) if np.isfinite(oracle_t) else -1
        print(f"ray {i}: fast=({t_f[i]:.7g},{lin_f[i]}) "
              f"dda=({t_d[i]:.7g},{lin_d[i]}) "
              f"oracle=({oracle_t:.7g},{oracle_lin})")
        # margin analysis on the cells each backend reported + oracle cell
        for tag, lin_q in (("fast", lin_f[i]), ("dda", lin_d[i]),
                           ("oracle", oracle_lin)):
            if lin_q < 0:
                continue
            w = np.flatnonzero(lin_occ == lin_q)
            if len(w) == 0:
                print(f"  {tag} cell {lin_q}: NOT OCCUPIED?!")
                continue
            k = w[0]
            gap = float(t1[k]) - max(float(t0[k]), 0.0)
            print(f"  {tag} cell {lin_q}: t0={t0[k]:.9g} t1={t1[k]:.9g} "
                  f"t1-max(t0,0)={gap:.3g} ok={bool(ok[k])}")


if __name__ == "__main__":
    main()
