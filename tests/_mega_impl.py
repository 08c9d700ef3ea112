"""Megakernel (ops/pallas/mega_trace) exactness tests vs the dda
reference — isolated in a fresh interpreter by tests/test_mega.py (the
shared XLA:CPU long-lived-process crash mitigation, tests/_isolate.py).

The megakernel must reproduce the trace_grid_dda contract exactly on
CPU (interpret mode has no FMA contraction): hits and cells bit-equal,
t to 2e-6 (cross-program float envelope), unresolved == 0.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from voxelray_tpu.io import meshes
from voxelray_tpu.models.grids import GridBool
from voxelray_tpu.ops.geometry import mesh_bbox
from voxelray_tpu.ops.intersect import make_camera_rays
from voxelray_tpu.ops.traverse import trace_grid_dda
from voxelray_tpu.ops.traverse_fast import build_accel, trace_grid_fast
from voxelray_tpu.render.camera import Camera


def _scene(res):
    v, f = meshes.icosphere(3)
    bb_min, bb_max = mesh_bbox(v)
    vs = float(max(bb_max - bb_min)) / res
    grid = GridBool.from_mesh(v, f, vs)
    occ = jnp.asarray(np.asarray(grid.occupancy()).astype(np.uint8))
    accel = build_accel(occ, grid.origin, grid.voxel_size)
    return v, bb_min, bb_max, grid, occ, accel


def _rays(bb_min, bb_max, W, H, eye_scale):
    center = (bb_min + bb_max) * 0.5
    cam = Camera(eye=tuple(center + np.asarray([0.9, 0.55, -0.9])
                           * eye_scale * float(max(bb_max - bb_min))),
                 center=tuple(center))
    _, _, vi, pi = cam.matrices(W, H)
    return make_camera_rays(W, H, jnp.asarray(vi), jnp.asarray(pi))


@pytest.mark.parametrize("res,eye_scale", [
    (64, 1.0),     # n_sb = 1: single superbrick, no re-binning
    (144, 1.0),    # n_sb = 27: multi-superbrick serve loop
    (144, 0.2),    # camera close/inside: dense candidates
])
def test_mega_matches_dda(res, eye_scale):
    _, bb_min, bb_max, grid, occ, accel = _scene(res)
    o, d = _rays(bb_min, bb_max, 128, 64, eye_scale)
    t_d, lin_d = trace_grid_dda(
        o, d, occ.reshape(-1), jnp.asarray(grid.origin),
        dims=accel.dims, voxel_size_static=grid.voxel_size)
    t_f, lin_f = trace_grid_fast(o, d, accel)
    t_m, lin_m, alive = trace_grid_fast(o, d, accel, mega=True,
                                        return_stats=True)
    t_d, t_m, t_f = np.asarray(t_d), np.asarray(t_m), np.asarray(t_f)
    lin_d, lin_m = np.asarray(lin_d), np.asarray(lin_m)
    hd, hm = np.isfinite(t_d), np.isfinite(t_m)
    assert int(alive) == 0
    # hits and cells are the dda contract exactly
    assert np.array_equal(hd, hm)
    assert np.array_equal(lin_d[hd], lin_m[hd])
    # t: mega reuses the fast backend's expression shapes — compare to
    # the FAST t (measured bit-equal on CPU); dda's t sits in the wider
    # cross-program envelope (a close-camera cell measured 5.4e-5 rel
    # off BOTH compiled backends, PARITY.md class)
    assert np.allclose(t_m[hd], t_f[hd], rtol=2e-6, atol=0.0)
    assert hd.sum() > 50  # the scene actually renders


def test_mega_admit_mask():
    """Non-admitted rays return miss; admitted match dda."""
    _, bb_min, bb_max, grid, occ, accel = _scene(144)
    o, d = _rays(bb_min, bb_max, 128, 64, 1.0)
    rng = np.random.default_rng(0)
    admit = jnp.asarray(rng.random((64, 128)) < 0.5)
    t_d, lin_d = trace_grid_dda(
        o, d, occ.reshape(-1), jnp.asarray(grid.origin),
        dims=accel.dims, voxel_size_static=grid.voxel_size)
    t_m, lin_m = trace_grid_fast(o, d, accel, mega=True, admit=admit)
    am = np.asarray(admit)
    t_d = np.where(am, np.asarray(t_d), np.inf)
    lin_d = np.where(am, np.asarray(lin_d), -1)
    t_m, lin_m = np.asarray(t_m), np.asarray(lin_m)
    hd = np.isfinite(t_d)
    assert np.array_equal(hd, np.isfinite(t_m))
    assert np.array_equal(lin_d[hd], lin_m[hd])
    assert np.allclose(t_m[hd], t_d[hd], rtol=2e-6, atol=0.0)


def test_mega_per_ray_tmax():
    """Per-ray t_max truncates hits exactly like the production fast
    backend (the same-expression-class reference; a t_max equal to the
    MEDIAN dda t collides with real hit t values, where dda's <= accept
    and the compiled backends' 1-ulp-different t0 legitimately flip —
    measured: 2 of 1500 rays with t bit-equal to the cut)."""
    _, bb_min, bb_max, grid, occ, accel = _scene(144)
    o, d = _rays(bb_min, bb_max, 128, 64, 1.0)
    t_d, _ = trace_grid_dda(
        o, d, occ.reshape(-1), jnp.asarray(grid.origin),
        dims=accel.dims, voxel_size_static=grid.voxel_size)
    t_full = np.asarray(t_d)
    med = float(np.median(t_full[np.isfinite(t_full)]))
    t_max = jnp.full(t_full.shape, med, jnp.float32)
    t_m, lin_m = trace_grid_fast(o, d, accel, mega=True, t_max=t_max)
    t_f, lin_f = trace_grid_fast(o, d, accel, t_max=t_max)
    t_m, t_f = np.asarray(t_m), np.asarray(t_f)
    hf = np.isfinite(t_f)
    assert np.array_equal(hf, np.isfinite(t_m))
    assert np.array_equal(np.asarray(lin_f)[hf], np.asarray(lin_m)[hf])
    assert np.allclose(t_m[hf], t_f[hf], rtol=2e-6, atol=0.0)
    assert 0 < hf.sum() < np.isfinite(t_full).sum()  # t_max actually cut
