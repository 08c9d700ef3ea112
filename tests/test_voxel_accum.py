"""Slab-accumulation voxelizer (ops/pallas/voxel_accum) parity tests.

The kernel must reproduce the scatter path's occupancy BIT-exactly and
its set_calls exactly (integer hit counts, no float envelope): both
paths evaluate the same reference SAT on the same effective-window
cells, so any difference is a lane-enumeration or accumulation bug.
(Degenerate lattice-aligned geometry — e.g. a plane exactly on cell
boundaries — is excluded here the same way it is everywhere else in the
suite: borderline SAT outcomes flip under FMA contraction between
program shapes, the documented PARITY.md class.)
"""
import numpy as np
import pytest

from voxelray_tpu.io import meshes
from voxelray_tpu.ops.pallas.voxel_accum import (build_accum_plan,
                                                 voxelize_accum)
from voxelray_tpu.ops.voxelize import voxelize_mesh


def _check(v, f, vs):
    ref = voxelize_mesh(v, f, vs)
    plan = build_accum_plan(v, f, vs)
    occ, calls = voxelize_accum(plan)
    occ = np.asarray(occ)
    r = np.asarray(ref["occ"])
    assert occ.shape == r.shape
    assert np.array_equal(occ, r)
    assert int(calls) == ref["set_calls"]
    return plan


def test_icosphere_exact():
    v, f = meshes.icosphere(2)
    plan = _check(v, f, 0.08)
    assert plan.n_groups > 1          # multiple slabs/buckets exercised


def test_bunny_exact():
    v, f = meshes.bunny_like(3)
    _check(v, f, 0.05)


def test_knot_exact():
    v, f = meshes.torus_knot(segments=96, tube_segments=24)
    _check(v, f, 0.07)


def test_fallback_tall_windows_exact():
    """Triangles with wy > 16 route through the scatter fallback and
    OR-merge; the combined result stays exact."""
    rng = np.random.default_rng(7)
    v = (rng.uniform(-1, 1, (300, 3)) * np.array([1, 3, 1])) \
        .astype(np.float32)
    f = rng.integers(0, 300, (200, 3))
    plan = _check(v, f, 0.05)
    assert len(plan.fallback_faces) > 0


def test_deformed_geometry_exact():
    v, f = meshes.icosphere(2)
    vd = meshes.deformed(v, 1.3)
    _check(vd, f, 0.07)


def test_degenerate_empty_grid():
    v, f = meshes.plane()           # flat: ny == 0
    ref = voxelize_mesh(v, f, 0.11)
    plan = build_accum_plan(v, f, 0.11)
    occ, calls = voxelize_accum(plan)
    assert np.asarray(occ).size == np.asarray(ref["occ"]).size == 0
    assert int(calls) == 0


def test_empty_slab_zeroing():
    """Two well-separated blobs leave middle slabs with zero lanes; the
    kernel must still zero those output blocks (not return garbage)."""
    v1, f1 = meshes.icosphere(1, radius=0.5, center=(0, 0, 0))
    v2, f2 = meshes.icosphere(1, radius=0.5, center=(0, 0, 6.0))
    v = np.concatenate([v1, v2]).astype(np.float32)
    f = np.concatenate([f1, f2 + len(v1)])
    _check(v, f, 0.1)
