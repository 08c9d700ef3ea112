"""JAX voxelizer vs the NumPy oracle: bit-exact occupancy gating.

This is the fidelity gate demanded by BASELINE.md: occupancy must be
bit-exact against the reference CPU voxelization semantics for every
encoding and both execution paths.
"""
import numpy as np
import pytest

from voxelray_tpu.io import meshes
from voxelray_tpu.oracle import oracle_voxelize
from voxelray_tpu.ops.voxelize import (plan_buckets, required_window_shape,
                                       voxelize_dense, voxelize_mesh)

CASES = [
    ("cube16", lambda: meshes.cube(2.0), 2.0 / 16),
    ("cube0.3", lambda: meshes.cube(2.0), 0.3),
    ("sphere", lambda: meshes.icosphere(2), 0.12),
    ("bunny", lambda: meshes.bunny_like(2), 0.11),
]


@pytest.mark.parametrize("name,mesh,vs", CASES, ids=[c[0] for c in CASES])
def test_bit_exact_occupancy(name, mesh, vs):
    v, f = mesh()
    ref = oracle_voxelize(v, f, vs)
    out = voxelize_mesh(v, f, vs)
    occ = np.asarray(out["occ"]).astype(bool)
    assert out["dims"] == ref.dims
    assert np.array_equal(occ, ref.occupancy), (
        f"{name}: {np.count_nonzero(occ ^ ref.occupancy)} mismatched cells"
    )
    assert out["set_calls"] == ref.set_calls


def test_fixed_window_path_matches_bucketed():
    # the single-window jit path (used for deforming meshes) == bucketed
    v, f = meshes.icosphere(2)
    vs = 0.12
    a = voxelize_mesh(v, f, vs)
    win = required_window_shape(v, f, a["origin"], vs, a["dims"])
    b = voxelize_mesh(v, f, vs, window=win)
    assert np.array_equal(np.asarray(a["occ"]), np.asarray(b["occ"]))
    assert a["set_calls"] == b["set_calls"]


def test_empty_mesh():
    out = voxelize_mesh(np.zeros((0, 3)), np.zeros((0, 3), np.int32), 0.5)
    assert out["set_calls"] == 0


def test_degenerate_flat_mesh_empty_grid():
    v, f = meshes.plane(4.0)
    out = voxelize_mesh(v, f, 0.5)
    assert out["dims"][1] == 0
    assert np.asarray(out["occ"]).size == 0


def test_bucket_plan_covers_all_triangles():
    v, f = meshes.cube(2.0)
    from voxelray_tpu.ops.geometry import grid_dims, mesh_bbox
    bb_min, bb_max = mesh_bbox(v)
    dims = grid_dims(bb_min, bb_max, 0.125)
    buckets = plan_buckets(v, f, bb_min, 0.125, dims, max_buckets=3)
    assert len(buckets) <= 3
    covered = np.sort(np.concatenate([i for _, i in buckets]))
    assert np.array_equal(covered, np.arange(len(f)))


def test_window_shape_truncation_guard():
    # a window smaller than required silently truncates — documented
    # behavior; correctness requires required_window_shape
    v, f = meshes.icosphere(1)
    vs = 0.3
    ref = oracle_voxelize(v, f, vs)
    import jax.numpy as jnp
    occ, _ = voxelize_dense(
        jnp.asarray(v[f]), jnp.asarray(ref.origin),
        dims=ref.dims, voxel_size_static=vs, window=(1, 1, 1), chunk=64,
    )
    assert np.asarray(occ).sum() <= ref.occupancy.sum()


def test_window_scatter_matches_flat():
    """scatter="window" (one lax.scatter_max block per triangle) must
    produce the identical occupancy + set_calls as the flat scheme."""
    import jax.numpy as jnp
    from voxelray_tpu.io import meshes
    from voxelray_tpu.ops.geometry import grid_dims, mesh_bbox
    from voxelray_tpu.ops.voxelize import (required_window_shape,
                                           voxelize_dense)

    v, f = meshes.icosphere(2)
    vs = 0.13
    bb_min, bb_max = mesh_bbox(v)
    dims = grid_dims(bb_min, bb_max, vs)
    win = required_window_shape(v, f, bb_min, vs, dims)
    tri = jnp.asarray(v[f])
    org = jnp.asarray(bb_min)
    occ_f, calls_f = voxelize_dense(
        tri, org, dims=dims, voxel_size_static=vs, window=win, chunk=64,
        scatter="flat")
    occ_w, calls_w = voxelize_dense(
        tri, org, dims=dims, voxel_size_static=vs, window=win, chunk=64,
        scatter="window")
    assert np.array_equal(np.asarray(occ_f), np.asarray(occ_w))
    assert int(calls_f) == int(calls_w)


def test_voxelize_planned_matches_mesh():
    """The bucketed plan path reproduces voxelize_mesh exactly and reuses
    across deformations."""
    from voxelray_tpu.io import meshes
    from voxelray_tpu.ops.voxelize import plan_voxelize, voxelize_mesh

    v, f = meshes.bunny_like(1)
    vs = 0.17
    ref = voxelize_mesh(v, f, vs)
    plan = plan_voxelize(v, f, vs, max_buckets=5)
    occ, calls = plan(v)  # fused single-program path (scatter="auto")
    assert np.array_equal(np.asarray(occ), np.asarray(ref["occ"]))
    assert int(calls) == ref["set_calls"]

    from voxelray_tpu.ops.voxelize import voxelize_planned
    occ_w, calls_w = voxelize_planned(plan, v, scatter="window")
    assert np.array_equal(np.asarray(occ_w), np.asarray(occ))
    assert int(calls_w) == int(calls)
    # count_only skips the occupancy scatter but counts the same hits
    _, calls_c = voxelize_planned(plan, v, count_only=True)
    assert int(calls_c) == int(calls)


def test_deform_safe_plan_bit_exact_under_deformation():
    """Review r3: the default plan's dead-slab cut is proven only for
    the plan-time vertices; a deform_safe plan buckets by the full
    reference windows and must stay bit-exact against the oracle for
    any deformation whose windows fit the plan shapes."""
    from voxelray_tpu.io import meshes
    from voxelray_tpu.oracle import oracle_voxelize
    from voxelray_tpu.ops.voxelize import plan_voxelize

    v, f = meshes.bunny_like(1)
    vs = 0.17
    # small deformation: same topology, windows stay within the rest
    # pose's reference shapes (bucket merge slack absorbs the rest)
    rng = np.random.default_rng(11)
    v_def = (v + 0.02 * np.sin(v[:, [1, 2, 0]] * 5.0)).astype(np.float32)
    from voxelray_tpu.ops.geometry import mesh_bbox
    bb_min, bb_max = mesh_bbox(v)
    plan = plan_voxelize(v, f, vs, deform_safe=True, max_buckets=5)
    occ, calls = plan(np.asarray(v_def))
    ref = oracle_voxelize(v_def, f, vs, bb_min=bb_min, bb_max=bb_max)
    assert ref.dims == plan.dims
    assert np.array_equal(np.asarray(occ, bool),
                          np.asarray(ref.occupancy, bool))
    assert int(calls) == int(ref.set_calls)
