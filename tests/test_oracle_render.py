"""Pixel-gating the jitted pipeline against the NumPy reference renderer."""
import numpy as np
import pytest

from voxelray_tpu.io import meshes
from voxelray_tpu.io.objload import Material, ObjLoader, write_obj
from voxelray_tpu.models.grids import GridBool
from voxelray_tpu.models.scene import Light, build_scene
from voxelray_tpu.oracle_render import oracle_render
from voxelray_tpu.render.camera import Camera
from voxelray_tpu.render.pipeline import render_scene

W, H = 48, 27


@pytest.mark.parametrize("backend", ["brute", "dda", "fast"])
def test_pipeline_matches_oracle_voxels_only(backend):
    v, f = meshes.icosphere(1)
    grid = GridBool.from_mesh(v, f, 0.3)
    scene = build_scene(models=None, grid=grid)
    cam = Camera(eye=(3.0, 2.0, -3.0), center=(0.0, 0.0, 0.0))
    _, _, vi, pi = cam.matrices(W, H)
    img = np.asarray(render_scene(scene, cam, width=W, height=H,
                                  backend=backend))
    want = oracle_render(W, H, vi, pi, np.asarray(grid.get_aabbs()),
                         Material().as_row())
    assert img.shape == want.shape
    # per-pixel agreement; a handful of edge pixels may flip at
    # voxel-silhouette boundaries due to fma differences
    close = np.isclose(img, want, rtol=1e-4, atol=1e-4).all(axis=-1)
    assert close.mean() > 0.995, f"only {close.mean():.3%} pixels match"


def test_pipeline_matches_oracle_with_plane(tmp_path):
    v, f = meshes.icosphere(1)
    grid = GridBool.from_mesh(v, f, 0.3)
    p = tmp_path / "plane.obj"
    pv, pf = meshes.plane(10.0, y=-1.2)
    write_obj(str(p), pv, pf)
    model = ObjLoader().load_model(str(p))
    scene = build_scene(models=[model], grid=grid)
    cam = Camera(eye=(3.0, 2.0, -3.0), center=(0.0, 0.0, 0.0))
    _, _, vi, pi = cam.matrices(W, H)
    img = np.asarray(render_scene(scene, cam, width=W, height=H,
                                  backend="dda"))

    # oracle triangle streams (sRGB->linear like the scene builder)
    tri = np.stack([np.asarray(scene.tri_v0), np.asarray(scene.tri_v1),
                    np.asarray(scene.tri_v2)], axis=1)
    tn = np.stack([np.asarray(scene.tri_n0), np.asarray(scene.tri_n1),
                   np.asarray(scene.tri_n2)], axis=1)
    tmat = np.asarray(scene.materials)[np.asarray(scene.tri_mat)]
    want = oracle_render(W, H, vi, pi, np.asarray(grid.get_aabbs()),
                         Material().as_row(), tri=tri, tri_normals=tn,
                         tri_materials=tmat)
    close = np.isclose(img, want, rtol=1e-4, atol=1e-4).all(axis=-1)
    assert close.mean() > 0.995, f"only {close.mean():.3%} pixels match"


def test_oracle_directional_light():
    v, f = meshes.icosphere(1)
    grid = GridBool.from_mesh(v, f, 0.3)
    scene = build_scene(models=None, grid=grid)
    cam = Camera(eye=(3.0, 2.0, -3.0), center=(0.0, 0.0, 0.0))
    _, _, vi, pi = cam.matrices(W, H)
    light = Light(position=(0.3, 1.0, -0.2), intensity=0.9, type=1)
    img = np.asarray(render_scene(scene, cam, width=W, height=H,
                                  backend="dda", light=light))
    want = oracle_render(W, H, vi, pi, np.asarray(grid.get_aabbs()),
                         Material().as_row(),
                         light_position=light.position,
                         light_intensity=light.intensity, light_type=1)
    close = np.isclose(img, want, rtol=1e-4, atol=1e-4).all(axis=-1)
    assert close.mean() > 0.995
