"""Dev check: megakernel vs dda on CPU (interpret mode).

Run (serialize with any other jax process!):
  JAX_PLATFORMS=cpu python scripts/dev_mega_cpu.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from voxelray_tpu.io import meshes
from voxelray_tpu.models.grids import GridBool
from voxelray_tpu.ops.geometry import mesh_bbox
from voxelray_tpu.ops.intersect import make_camera_rays
from voxelray_tpu.ops.traverse import trace_grid_dda
from voxelray_tpu.ops.traverse_fast import build_accel, trace_grid_fast
from voxelray_tpu.render.camera import Camera


def check(res, W, H, eye_scale, label, admit_frac=None):
    v, f = meshes.icosphere(3)
    bb_min, bb_max = mesh_bbox(v)
    vs = float(max(bb_max - bb_min)) / res
    grid = GridBool.from_mesh(v, f, vs)
    occ = jnp.asarray(np.asarray(grid.occupancy()).astype(np.uint8))
    accel = build_accel(occ, grid.origin, grid.voxel_size)
    center = (bb_min + bb_max) * 0.5
    cam = Camera(eye=tuple(center + np.asarray([0.9, 0.55, -0.9])
                           * eye_scale * float(max(bb_max - bb_min))),
                 center=tuple(center))
    _, _, vi, pi = cam.matrices(W, H)
    o, d = make_camera_rays(W, H, jnp.asarray(vi), jnp.asarray(pi))

    t_d, lin_d = trace_grid_dda(
        o, d, occ.reshape(-1), jnp.asarray(grid.origin),
        dims=accel.dims, voxel_size_static=grid.voxel_size)
    admit = None
    if admit_frac is not None:
        rng = np.random.default_rng(0)
        admit = jnp.asarray(rng.random((H, W)) < admit_frac)
    t_m, lin_m, alive = trace_grid_fast(o, d, accel, mega=True,
                                        admit=admit, return_stats=True)
    t_d = np.asarray(t_d)
    t_m = np.asarray(t_m)
    lin_d = np.asarray(lin_d)
    lin_m = np.asarray(lin_m)
    if admit is not None:
        am = np.asarray(admit)
        t_d = np.where(am, t_d, np.inf)
        lin_d = np.where(am, lin_d, -1)
    t_d, t_m = t_d.reshape(-1), t_m.reshape(-1)
    lin_d, lin_m = lin_d.reshape(-1), lin_m.reshape(-1)
    hd, hm = np.isfinite(t_d), np.isfinite(t_m)
    hits_eq = np.array_equal(hd, hm)
    cells_eq = np.array_equal(lin_d[hd & hm], lin_m[hd & hm])
    t_ok = np.allclose(t_m[hd & hm], t_d[hd & hm], rtol=2e-6, atol=0.0)
    print(f"{label}: dda_hits={hd.sum()} mega_hits={hm.sum()} "
          f"hits_eq={hits_eq} cells_eq={cells_eq} t_ok={t_ok} "
          f"alive={int(alive)}")
    if not (hits_eq and cells_eq and t_ok and int(alive) == 0):
        diff = np.flatnonzero((hd != hm) | (hd & hm & (lin_d != lin_m)))
        print("  first hit/cell diffs:", diff[:10])
        for i in diff[:5]:
            print(f"   ray {i}: dda t={t_d[i]} lin={lin_d[i]} | mega "
                  f"t={t_m[i]} lin={lin_m[i]}")
        both = hd & hm
        rel = np.abs(t_m[both] - t_d[both]) / np.maximum(
            np.abs(t_d[both]), 1e-30)
        bad = np.flatnonzero(rel > 2e-6)
        print(f"  t rel diffs > 2e-6: {len(bad)} of {both.sum()}, "
              f"max rel {rel.max():.3e}")
        bi = np.flatnonzero(both)[bad[:5]] if len(bad) else []
        for i in bi:
            print(f"   ray {i}: dda t={t_d[i]!r} mega t={t_m[i]!r} "
                  f"lin={lin_d[i]}")
        raise SystemExit(1)


if __name__ == "__main__":
    check(64, 128, 64, 1.0, "res64 outside")      # n_sb = 1
    check(144, 128, 64, 1.0, "res144 outside")    # n_sb = 27, multi-serve
    check(144, 128, 64, 0.2, "res144 inside")     # camera near/inside
    check(144, 128, 64, 1.0, "res144 admit", admit_frac=0.5)
    print("ALL OK")
