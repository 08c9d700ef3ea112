"""Octree traversal vs the grid DDA: identical hits on identical geometry."""
import jax.numpy as jnp
import numpy as np
import pytest

from voxelray_tpu.io import meshes
from voxelray_tpu.models.grids import GridBool
from voxelray_tpu.models.octree import Octree
from voxelray_tpu.ops.intersect import make_camera_rays
from voxelray_tpu.ops.octree_traverse import trace_octree
from voxelray_tpu.ops.traverse import trace_grid_dda
from voxelray_tpu.render.camera import Camera

VS = 0.11


@pytest.fixture(scope="module")
def setup():
    v, f = meshes.bunny_like(2)
    tree = Octree.from_mesh(v, f, VS)
    grid = GridBool.from_mesh(v, f, VS)
    return tree, grid


def test_octree_camera_rays_match_dda(setup):
    tree, grid = setup
    W, H = 64, 36
    _, _, vi, pi = Camera().matrices(W, H)
    o, d = make_camera_rays(W, H, vi, pi)
    # DDA over the octree's conceptual pow2 grid (same origin/voxel size)
    occ = np.asarray(grid.occupancy())
    t_d, lin_d = trace_grid_dda(
        o, d, jnp.asarray(occ.reshape(-1)), grid.origin,
        dims=grid.dims, voxel_size_static=grid.voxel_size)
    t_o, lin_o = trace_octree(o, d, tree)
    hd = np.isfinite(np.asarray(t_d))
    ho = np.isfinite(np.asarray(t_o))
    assert np.array_equal(hd, ho), f"{int((hd ^ ho).sum())} masks differ"
    # same cells: octree lin uses tree dims == grid dims
    assert tree.dims == grid.dims
    assert np.array_equal(np.asarray(lin_d)[hd], np.asarray(lin_o)[ho])
    assert np.allclose(np.asarray(t_d)[hd], np.asarray(t_o)[ho],
                       rtol=2e-6, atol=0)


def test_octree_random_rays(setup):
    tree, grid = setup
    rng = np.random.default_rng(11)
    n = 256
    o = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    occ = np.asarray(grid.occupancy())
    t_d, lin_d = trace_grid_dda(
        o, d, jnp.asarray(occ.reshape(-1)), grid.origin,
        dims=grid.dims, voxel_size_static=grid.voxel_size)
    t_o, lin_o = trace_octree(o, d, tree)
    hd = np.isfinite(np.asarray(t_d))
    ho = np.isfinite(np.asarray(t_o))
    assert np.array_equal(hd, ho)
    assert np.array_equal(np.asarray(lin_d)[hd], np.asarray(lin_o)[ho])


def test_octree_tmax_clipping(setup):
    tree, _ = setup
    # a ray that would hit, clipped short by t_max
    o = jnp.asarray([[5.0, 1.0, 0.0]])
    d = jnp.asarray([[-1.0, 0.0, 0.0]])
    t_full, _ = trace_octree(o, d, tree)
    assert np.isfinite(np.asarray(t_full))[0]
    t_clip, _ = trace_octree(o, d, tree, t_max=float(
        np.asarray(t_full)[0]) - 0.5)
    assert not np.isfinite(np.asarray(t_clip))[0]
