"""Wavefront shading model unit tests (wavefront.glsl semantics)."""
import jax.numpy as jnp
import numpy as np

from voxelray_tpu.io.objload import Material
from voxelray_tpu.render import shading


def _mat(**kw):
    return jnp.asarray(Material(**kw).as_row())


def test_diffuse_lambert():
    mat = _mat(diffuse=(0.5, 0.5, 0.5), illum=0)
    n = jnp.asarray([0.0, 1.0, 0.0])
    l = jnp.asarray([0.0, 1.0, 0.0])
    out = np.asarray(shading.compute_diffuse(mat, l, n))
    assert np.allclose(out, 0.5)
    # facing away -> 0 (no ambient when illum 0)
    out = np.asarray(shading.compute_diffuse(mat, -l, n))
    assert np.allclose(out, 0.0)


def test_diffuse_ambient_when_illum_ge_1():
    mat = _mat(diffuse=(0.0, 0.0, 0.0), ambient=(0.2, 0.3, 0.4), illum=1)
    n = jnp.asarray([0.0, 1.0, 0.0])
    out = np.asarray(shading.compute_diffuse(mat, -n, n))
    assert np.allclose(out, [0.2, 0.3, 0.4])


def test_specular_energy_conserving_phong():
    mat = _mat(specular=(1.0, 1.0, 1.0), shininess=32.0, illum=2)
    n = jnp.asarray([0.0, 1.0, 0.0])
    l = jnp.asarray([0.0, 1.0, 0.0])
    view = jnp.asarray([0.0, -1.0, 0.0])  # incoming ray straight down
    out = np.asarray(shading.compute_specular(mat, view, l, n))
    # V == R: specular = (2+s)/(2pi) * 1^s
    want = (2.0 + 32.0) / (2.0 * np.pi)
    assert np.allclose(out, want, rtol=1e-5)


def test_specular_zero_when_illum_lt_2():
    mat = _mat(specular=(1.0, 1.0, 1.0), shininess=32.0, illum=1)
    n = jnp.asarray([0.0, 1.0, 0.0])
    out = np.asarray(shading.compute_specular(mat, -n, n, n))
    assert np.allclose(out, 0.0)


def test_specular_shininess_floor_4():
    mat0 = _mat(specular=(1.0, 1.0, 1.0), shininess=0.0, illum=2)
    mat4 = _mat(specular=(1.0, 1.0, 1.0), shininess=4.0, illum=2)
    n = jnp.asarray([0.0, 1.0, 0.0])
    l = jnp.asarray([0.0, 1.0, 0.0])
    v = jnp.asarray([0.0, -1.0, 0.0])
    a = np.asarray(shading.compute_specular(mat0, v, l, n))
    b = np.asarray(shading.compute_specular(mat4, v, l, n))
    assert np.allclose(a, b)


def test_cube_normal_dominant_axis():
    center = jnp.asarray([0.0, 0.0, 0.0])
    hit = jnp.asarray([0.5, 0.2, -0.1])
    n = np.asarray(shading.cube_normal(hit, center))
    assert np.allclose(n, [1, 0, 0])
    hit = jnp.asarray([0.1, -0.5, 0.2])
    assert np.allclose(np.asarray(shading.cube_normal(hit, center)),
                       [0, -1, 0])
    hit = jnp.asarray([0.1, 0.2, 0.5])
    assert np.allclose(np.asarray(shading.cube_normal(hit, center)),
                       [0, 0, 1])


def test_light_terms_point_falloff():
    pos = jnp.asarray([[0.0, 0.0, 0.0]])
    l, inten, dist = shading.light_terms(pos, (0.0, 10.0, 0.0), 1000.0, 0)
    assert np.allclose(np.asarray(l), [[0, 1, 0]])
    assert np.allclose(np.asarray(inten), 10.0)  # 1000/100
    assert np.allclose(np.asarray(dist), 10.0)


def test_light_terms_directional():
    pos = jnp.asarray([[5.0, 5.0, 5.0]])
    l, inten, dist = shading.light_terms(pos, (0.0, 2.0, 0.0), 7.0, 1)
    assert np.allclose(np.asarray(l), [[0, 1, 0]])
    assert np.allclose(np.asarray(inten), 7.0)
    assert np.allclose(np.asarray(dist), 100000.0)


def test_miss_and_gamma():
    assert np.allclose(np.asarray(shading.miss_color((1.0, 0.5, 0.0, 1.0))),
                       [0.8, 0.4, 0.0])
    g = np.asarray(shading.gamma_post(jnp.asarray([0.5, 1.0, 0.0, 1.0])))
    assert np.allclose(g, [0.5 ** (1 / 2.2), 1.0, 0.0, 1.0])
