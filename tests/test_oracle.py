"""Oracle voxelizer sanity: brute-force geometric truths it must satisfy."""
import numpy as np

from voxelray_tpu.io import meshes
from voxelray_tpu.oracle import oracle_tri_box_overlap, oracle_voxelize


def test_single_triangle_hits_containing_cell():
    # tiny triangle strictly inside cell (0,0,0) of a unit grid
    v = np.array([[0.1, 0.1, 0.1], [0.3, 0.1, 0.1], [0.1, 0.3, 0.1]],
                 dtype=np.float32)
    f = np.array([[0, 1, 2]])
    res = oracle_voxelize(v, f, 1.0, bb_min=[0, 0, 0], bb_max=[1, 1, 1])
    assert res.occupancy.sum() == 1
    assert res.occupancy[0, 0, 0]


def test_overlap_matches_separating_axis_bruteforce():
    # randomized triangles vs the unit box at origin, checked against a
    # dense-point containment proxy: any sampled triangle point inside the
    # box implies overlap must be True.
    rng = np.random.default_rng(0)
    half = 0.5
    for _ in range(200):
        tri = rng.uniform(-1.5, 1.5, size=(3, 3)).astype(np.float32)
        hit = oracle_tri_box_overlap(
            np.zeros((1, 3), np.float32), half, tri[0], tri[1], tri[2]
        )[0]
        # sample barycentric points on the triangle
        w = rng.random((256, 3)).astype(np.float32)
        w /= w.sum(axis=1, keepdims=True)
        pts = w @ tri
        inside = (np.abs(pts) <= half).all(axis=1).any()
        if inside:
            assert hit, f"triangle with interior point inside box missed: {tri}"


def test_overlap_rejects_far_triangle():
    tri = np.array([[5, 5, 5], [6, 5, 5], [5, 6, 5]], dtype=np.float32)
    assert not oracle_tri_box_overlap(
        np.zeros((1, 3), np.float32), 0.5, tri[0], tri[1], tri[2]
    )[0]


def test_cube_voxelization_exact_division_drops_max_faces():
    # Reference quirk (VoxelBuilder.hpp:175-184): when the mesh extent
    # divides the voxel size exactly, a face lying on the grid MAX boundary
    # has window start == dims, so its window is empty and it contributes
    # nothing.  Min-boundary faces are kept (start clamps to 0).
    v, f = meshes.cube(size=2.0)
    res = oracle_voxelize(v, f, 0.25)
    occ = res.occupancy  # (Z=8, Y=8, X=8)
    assert occ.shape == (8, 8, 8)
    # min faces present
    assert occ[0].all() and occ[:, 0].all() and occ[:, :, 0].all()
    # max faces dropped: the z=7 slab only has cells covered by side faces
    assert occ[-1, 0].all() and occ[-1, :, 0].all()
    assert not occ[-1, 1:, 1:].any()
    # deep interior empty
    assert not occ[2:-2, 2:-2, 2:-2].any()


def test_cube_voxelization_nonexact_division_full_shell():
    # with a voxel size that does not divide the extent, the +2 slack makes
    # every face land inside its window -> full hollow shell
    v, f = meshes.cube(size=2.0)
    res = oracle_voxelize(v, f, 0.3)
    occ = res.occupancy  # ceil(2/0.3) = 7 cells/axis
    assert occ.shape == (7, 7, 7)
    assert occ[0].all() and occ[-1].all()
    assert occ[:, 0].all() and occ[:, -1].all()
    assert occ[:, :, 0].all() and occ[:, :, -1].all()
    assert not occ[2:-2, 2:-2, 2:-2].any()


def test_duplicate_hits_counted():
    # two coplanar triangles sharing cells: set_calls counts both, occupancy
    # does not double-count (m_voxelSet quirk, voxelgridBool.cpp:67)
    v = np.array(
        [[0.1, 0.1, 0.1], [0.3, 0.1, 0.1], [0.1, 0.3, 0.1],
         [0.12, 0.12, 0.1], [0.28, 0.12, 0.1], [0.12, 0.28, 0.1]],
        dtype=np.float32,
    )
    f = np.array([[0, 1, 2], [3, 4, 5]])
    res = oracle_voxelize(v, f, 1.0, bb_min=[0, 0, 0], bb_max=[1, 1, 1])
    assert res.occupancy.sum() == 1
    assert res.set_calls == 2
    assert len(res.hits) == 2


def test_flat_plane_empty_grid():
    v, f = meshes.plane(size=4.0, y=0.0)
    res = oracle_voxelize(v, f, 0.5)
    assert res.dims[1] == 0
    assert res.occupancy.size == 0 or not res.occupancy.any()


def test_max_boundary_triangle_dropped_near_boundary_kept():
    # exactly on the max boundary: window start == dims -> dropped
    v = np.array([[1.0, 0.5, 0.5], [1.0, 0.9, 0.5], [1.0, 0.5, 0.9]],
                 dtype=np.float32)
    f = np.array([[0, 1, 2]])
    res = oracle_voxelize(v, f, 0.5, bb_min=[0, 0, 0], bb_max=[1, 1, 1])
    assert not res.occupancy.any()
    # epsilon inside: covered
    v2 = v.copy()
    v2[:, 0] = 0.999
    res2 = oracle_voxelize(v2, f, 0.5, bb_min=[0, 0, 0], bb_max=[1, 1, 1])
    assert res2.occupancy.any()
