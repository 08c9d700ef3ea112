"""Camera ray gen, slab test, and triangle intersection semantics."""
import jax.numpy as jnp
import numpy as np

from voxelray_tpu.ops.intersect import (hit_aabb, hit_triangles,
                                        make_camera_rays)
from voxelray_tpu.render.camera import Camera, look_at, perspective_rh_zo


def test_look_at_properties():
    m = look_at((0, 0, 5), (0, 0, 0), (0, 1, 0))
    # eye maps to origin
    p = m @ np.array([0, 0, 5, 1], np.float32)
    assert np.allclose(p[:3], 0, atol=1e-6)
    # center maps onto -Z (RH convention)
    c = m @ np.array([0, 0, 0, 1], np.float32)
    assert c[2] < 0 and np.allclose(c[:2], 0, atol=1e-6)


def test_perspective_y_flip():
    p = perspective_rh_zo(np.radians(60.0), 16 / 9, 0.1, 1000.0)
    assert p[1, 1] < 0  # Vulkan flip applied
    p2 = perspective_rh_zo(np.radians(60.0), 16 / 9, 0.1, 1000.0,
                           flip_y=False)
    assert p2[1, 1] > 0
    # depth maps near->0, far->1 (ZO)
    v = p2 @ np.array([0, 0, -0.1, 1], np.float32)
    assert np.isclose(v[2] / v[3], 0.0, atol=1e-6)
    v = p2 @ np.array([0, 0, -1000.0, 1], np.float32)
    assert np.isclose(v[2] / v[3], 1.0, atol=1e-4)


def test_center_ray_points_at_target():
    cam = Camera(eye=(0, 0, 5), center=(0, 0, 0))
    _, _, vi, pi = cam.matrices(101, 101)
    o, d = make_camera_rays(101, 101, vi, pi)
    o, d = np.asarray(o), np.asarray(d)
    assert np.allclose(o[50, 50], [0, 0, 5], atol=1e-5)
    assert np.allclose(d[50, 50], [0, 0, -1], atol=1e-2)
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_image_orientation():
    # +Y world should appear in the TOP half of the image (lower row index)
    cam = Camera(eye=(0, 0, 5), center=(0, 0, 0))
    _, _, vi, pi = cam.matrices(64, 64)
    _, d = make_camera_rays(64, 64, vi, pi)
    d = np.asarray(d)
    assert d[0, 32, 1] > 0      # top row looks up
    assert d[63, 32, 1] < 0     # bottom row looks down


def test_hit_aabb_semantics():
    mn = jnp.asarray([-1.0, -1.0, -1.0])
    mx = jnp.asarray([1.0, 1.0, 1.0])
    o = jnp.asarray([[-5.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    t = np.asarray(hit_aabb(mn, mx, o, d))
    assert np.isclose(t[0], 4.0)
    # miss
    t = np.asarray(hit_aabb(mn, mx, jnp.asarray([[-5.0, 3.0, 0.0]]), d))
    assert t[0] == -1.0
    # origin inside: t1 > max(t0,0) holds but t0 < 0 -> reported negative
    t = np.asarray(hit_aabb(mn, mx, jnp.asarray([[0.0, 0.0, 0.0]]), d))
    assert t[0] < 0
    # axis-parallel ray outside slab: inf arithmetic must not poison it
    t = np.asarray(hit_aabb(mn, mx, jnp.asarray([[-5.0, 0.0, 0.5]]),
                            jnp.asarray([[1.0, 0.0, 0.0]])))
    assert np.isclose(t[0], 4.0)


def test_hit_triangles():
    v0 = jnp.asarray([[-1.0, -1.0, 0.0]])
    v1 = jnp.asarray([[1.0, -1.0, 0.0]])
    v2 = jnp.asarray([[0.0, 1.0, 0.0]])
    o = jnp.asarray([[0.0, 0.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, u, v = hit_triangles(o, d, v0, v1, v2)
    assert np.isclose(np.asarray(t)[0], 5.0)
    # behind the origin -> miss
    t, _, _ = hit_triangles(o, jnp.asarray([[0.0, 0.0, 1.0]]), v0, v1, v2)
    assert np.isinf(np.asarray(t)[0])
    # backface still hits (no culling)
    t, _, _ = hit_triangles(jnp.asarray([[0.0, 0.0, -5.0]]),
                            jnp.asarray([[0.0, 0.0, 1.0]]), v0, v1, v2)
    assert np.isclose(np.asarray(t)[0], 5.0)
