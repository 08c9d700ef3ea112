"""The five BASELINE gate configs at CI scale (shrunken, CPU)."""
import numpy as np
import pytest

from voxelray_tpu.utils.gates import run_gate


def test_gate1_cube_occupancy():
    out = run_gate("cube64", scale=0.25)  # 16^3
    assert out["bit_exact"] and out["set_calls_match"]
    assert out["occupied"] > 0


def test_gate2_bunny_render():
    out = run_gate("bunny128", scale=0.1)
    assert out["hit_fraction"] > 0.01
    assert np.isfinite(out["image_mean"])


def test_gate3_vec_octree_aov():
    out = run_gate("vec256", scale=0.08)
    assert out["backend"] == "octree"  # the walk must not be bypassed
    assert out["vec_aabbs"] > 0
    assert out["octree_nodes"] >= 1
    assert out["hit_pixels"] > 0
    assert out["depth_min"] is None or out["depth_min"] > 0
    assert out["normals_unit"] in (True, None)


def test_gate4_flythrough():
    out = run_gate("knot512", scale=0.02, frames=2)
    assert out["frames"] == 2
    assert all(np.isfinite(m) for m in out["frame_means"])


def test_gate5_deforming_sharded():
    out = run_gate("deform8", scale=0.25, frames=2, n_devices=8)
    assert out["devices"] == 8
    assert len(out["occupied_per_frame"]) == 2
    assert all(c > 0 for c in out["occupied_per_frame"])
    # deformation actually changes the occupancy
    assert out["occupied_per_frame"][0] != out["occupied_per_frame"][1]
