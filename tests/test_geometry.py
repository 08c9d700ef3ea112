"""Index maps, bbox, grid dims — pure-function property tests."""
import numpy as np

from voxelray_tpu.ops import geometry as G


def test_index_roundtrip():
    dims = (7, 5, 3)
    n = dims[0] * dims[1] * dims[2]
    i = np.arange(n)
    x, y, z = G.map1d_to_3d(i, dims)
    assert np.array_equal(G.map3d_to_1d(x, y, z, dims), i)
    assert x.max() == 6 and y.max() == 4 and z.max() == 2


def test_x_fastest():
    dims = (4, 4, 4)
    assert G.map3d_to_1d(1, 0, 0, dims) == 1
    assert G.map3d_to_1d(0, 1, 0, dims) == 4
    assert G.map3d_to_1d(0, 0, 1, dims) == 16


def test_bbox_all_vertices():
    v = np.array([[0, 0, 0], [1, 2, 3], [-5, 0.5, 0]], dtype=np.float32)
    mn, mx = G.mesh_bbox(v)
    assert np.array_equal(mn, [-5, 0, 0])
    assert np.array_equal(mx, [1, 2, 3])


def test_grid_dims_exact_division():
    # extent 2.0 / 0.25 = 8.0 exactly -> 8 cells, not 9
    assert G.grid_dims([-1, -1, -1], [1, 1, 1], 0.25) == (8, 8, 8)


def test_grid_dims_ceil():
    assert G.grid_dims([0, 0, 0], [1, 1, 1], 0.3) == (4, 4, 4)


def test_grid_dims_degenerate_axis_is_zero():
    # a flat plane has zero Y extent -> zero cells, like the reference
    assert G.grid_dims([0, 1, 0], [4, 1, 4], 0.5)[1] == 0


def test_voxel_center():
    c = G.voxel_center(0, 0, 0, origin=[1.0, 2.0, 3.0], voxel_size=0.5)
    assert np.allclose(c, [1.25, 2.25, 3.25])
    c = G.voxel_center(3, 0, 1, origin=[0.0, 0.0, 0.0], voxel_size=1.0)
    assert np.allclose(c, [3.5, 0.5, 1.5])


def test_voxel_diameter():
    assert np.isclose(G.voxel_diameter(1.0), np.sqrt(3.0))
