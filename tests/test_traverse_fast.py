"""Brick-accelerated traversal vs the plain DDA (CPU interpret mode)."""
import jax.numpy as jnp
import numpy as np
import pytest

from voxelray_tpu.io import meshes
from voxelray_tpu.models.grids import GridBool
from voxelray_tpu.ops.intersect import make_camera_rays
from voxelray_tpu.ops.traverse import trace_grid_dda
from voxelray_tpu.ops.traverse_fast import (BRICK, build_accel,
                                            trace_grid_fast)
from voxelray_tpu.render.camera import Camera


@pytest.fixture(scope="module")
def setup():
    v, f = meshes.bunny_like(2)
    grid = GridBool.from_mesh(v, f, 0.11)
    occ = grid.occupancy()
    accel = build_accel(occ, grid.origin, grid.voxel_size)
    return grid, occ, accel


def test_accel_structure(setup):
    grid, occ, accel = setup
    nx, ny, nz = grid.dims
    assert accel.bdims == (-(-nx // BRICK), -(-ny // BRICK),
                           -(-nz // BRICK))
    # brick bits reproduce a max-pool of the occupancy
    occ_np = np.asarray(occ).astype(bool)
    bx, by, bz = accel.bdims
    pad = np.zeros((bz * BRICK, by * BRICK, bx * BRICK), bool)
    pad[:occ_np.shape[0], :occ_np.shape[1], :occ_np.shape[2]] = occ_np
    pooled = pad.reshape(bz, BRICK, by, BRICK, bx, BRICK) \
        .any(axis=(1, 3, 5))
    words = np.asarray(accel.coarse).reshape(-1)
    n_bricks = bx * by * bz
    bits = (words[np.arange(n_bricks) >> 5] >> (np.arange(n_bricks) & 31)) & 1
    assert np.array_equal(bits.astype(bool), pooled.reshape(-1))
    # fine words reproduce per-brick cell bits (stored word-major)
    assert accel.fine.shape == (16, n_bricks)


def test_fast_matches_dda_camera_rays(setup):
    grid, occ, accel = setup
    W, H = 96, 54
    _, _, vi, pi = Camera().matrices(W, H)
    o, d = make_camera_rays(W, H, vi, pi)
    t_d, lin_d = trace_grid_dda(
        o, d, jnp.asarray(np.asarray(occ).reshape(-1)), grid.origin,
        dims=grid.dims, voxel_size_static=grid.voxel_size)
    t_f, lin_f = trace_grid_fast(o, d, accel, chunk=8)
    hd = np.isfinite(np.asarray(t_d))
    hf = np.isfinite(np.asarray(t_f))
    assert np.array_equal(hd, hf)
    assert np.array_equal(np.asarray(lin_d)[hd], np.asarray(lin_f)[hf])
    assert np.allclose(np.asarray(t_d)[hd], np.asarray(t_f)[hf],
                       rtol=2e-6, atol=0)


def test_fast_random_rays_and_tmax(setup):
    grid, occ, accel = setup
    rng = np.random.default_rng(5)
    n = 512
    o = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.asarray(rng.uniform(0.5, 20.0, n).astype(np.float32))
    t_d, lin_d = trace_grid_dda(
        o, d, jnp.asarray(np.asarray(occ).reshape(-1)), grid.origin,
        dims=grid.dims, voxel_size_static=grid.voxel_size, t_max=tmax)
    t_f, lin_f = trace_grid_fast(o, d, accel, t_max=tmax, chunk=8)
    hd = np.isfinite(np.asarray(t_d))
    hf = np.isfinite(np.asarray(t_f))
    assert np.array_equal(hd, hf)
    assert np.array_equal(np.asarray(lin_d)[hd], np.asarray(lin_f)[hf])


def test_fast_rays_starting_inside(setup):
    grid, occ, accel = setup
    # rays starting inside the grid bounds
    center = np.asarray(grid.origin) + 0.5 * grid.voxel_size * np.asarray(
        grid.dims)
    o = jnp.asarray(np.tile(center.astype(np.float32), (64, 1)))
    rng = np.random.default_rng(7)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t_d, lin_d = trace_grid_dda(
        o, d, jnp.asarray(np.asarray(occ).reshape(-1)), grid.origin,
        dims=grid.dims, voxel_size_static=grid.voxel_size)
    t_f, lin_f = trace_grid_fast(o, d, accel, chunk=8)
    assert np.array_equal(np.isfinite(np.asarray(t_d)),
                          np.isfinite(np.asarray(t_f)))
