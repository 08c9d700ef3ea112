"""Shading: the wavefront material model + the two closest-hit programs.

Transcribed behaviors (all float32, vectorized over pixels):

  compute_diffuse    — Lambert + ambient when illum >= 1
                       (wavefront.glsl:22-30)
  compute_specular   — energy-conserving Phong ((2+s)/2pi) * max(V.R,0)^s,
                       shininess floor 4, zero when illum < 2
                       (wavefront.glsl:32-48)
  cube_normal        — voxel-hit normal: direction from cell center to hit
                       point snapped to the dominant axis
                       (raytrace2.rchit:60-73)
  light_terms        — point light with 1/d^2 falloff or directional
                       (raytrace.rchit:77-91)
  miss_color         — clearColor.rgb * 0.8 (raytrace.rmiss:37)
  gamma_post         — pow(rgba, 1/2.2) (post.frag:32-37)

Shadow/attenuation rules live in render.pipeline because they differ
between the triangle and voxel closest-hit programs (attenuation defaults
1 vs 0.3 — raytrace.rchit:109 vs raytrace2.rchit:100).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..io.objload import (MAT_AMBIENT, MAT_DIFFUSE, MAT_ILLUM, MAT_SHININESS,
                          MAT_SPECULAR, MAT_TEXTURE_ID)

__all__ = ["compute_diffuse", "compute_specular", "cube_normal",
           "light_terms", "miss_color", "gamma_post", "LIGHT_POINT",
           "LIGHT_DIRECTIONAL"]

LIGHT_POINT = 0
LIGHT_DIRECTIONAL = 1


def _normalize(v, axis=-1):
    return v / jnp.linalg.norm(v, axis=axis, keepdims=True)


def compute_diffuse(mat_rows, light_dir, normal):
    """mat_rows: (..., 20) packed materials; light_dir/normal: (..., 3)."""
    dot_nl = jnp.maximum((normal * light_dir).sum(-1, keepdims=True), 0.0)
    c = mat_rows[..., MAT_DIFFUSE] * dot_nl
    ambient = jnp.where(mat_rows[..., MAT_ILLUM:MAT_ILLUM + 1] >= 1.0,
                        mat_rows[..., MAT_AMBIENT], 0.0)
    return c + ambient


def compute_specular(mat_rows, view_dir, light_dir, normal):
    """view_dir is the incoming ray direction (gl_WorldRayDirectionEXT)."""
    shininess = jnp.maximum(mat_rows[..., MAT_SHININESS:MAT_SHININESS + 1],
                            4.0)
    energy = (2.0 + shininess) / (2.0 * np.float32(np.pi))
    v = _normalize(-view_dir)
    # reflect(-L, N) = -L - 2*dot(N, -L)*N
    neg_l = -light_dir
    r = neg_l - 2.0 * (normal * neg_l).sum(-1, keepdims=True) * normal
    spec = energy * jnp.maximum((v * r).sum(-1, keepdims=True), 0.0) \
        ** shininess
    out = mat_rows[..., MAT_SPECULAR] * spec
    return jnp.where(mat_rows[..., MAT_ILLUM:MAT_ILLUM + 1] < 2.0, 0.0, out)


def cube_normal(hit_pos, cell_center):
    """Unit outward face normal of the hit voxel (dominant-axis snap).

    Ties resolve x over y over z, matching the GLSL chained ternary
    (raytrace2.rchit:66-73).
    """
    d = _normalize(hit_pos - cell_center)
    ad = jnp.abs(d)
    max_c = jnp.maximum(jnp.maximum(ad[..., 0:1], ad[..., 1:2]), ad[..., 2:3])
    sx = jnp.sign(d[..., 0])
    sy = jnp.sign(d[..., 1])
    sz = jnp.sign(d[..., 2])
    is_x = max_c[..., 0] == ad[..., 0]
    is_y = (~is_x) & (max_c[..., 0] == ad[..., 1])
    nx = jnp.where(is_x, sx, 0.0)
    ny = jnp.where(is_y, sy, 0.0)
    nz = jnp.where(is_x | is_y, 0.0, sz)
    return jnp.stack([nx, ny, nz], axis=-1)


def light_terms(hit_pos, light_position, light_intensity, light_type):
    """Returns (L, intensity, light_distance).

    Point: L toward the light, intensity / d^2, distance d.
    Directional: L = normalize(light_position), distance 100000
    (raytrace.rchit:79-91).
    """
    light_position = jnp.asarray(light_position, jnp.float32)
    ldir = light_position - hit_pos
    dist = jnp.linalg.norm(ldir, axis=-1, keepdims=True)
    point_l = ldir / dist
    point_i = light_intensity / (dist[..., 0] * dist[..., 0])
    dir_l = jnp.broadcast_to(_normalize(light_position), hit_pos.shape)
    is_point = jnp.asarray(light_type) == LIGHT_POINT
    l_vec = jnp.where(is_point, point_l, dir_l)
    intensity = jnp.where(is_point, point_i,
                          jnp.asarray(light_intensity, jnp.float32))
    distance = jnp.where(is_point, dist[..., 0],
                         jnp.float32(100000.0))
    return l_vec, intensity, distance


def miss_color(clear_color):
    return jnp.asarray(clear_color, jnp.float32)[:3] * 0.8


def gamma_post(rgba):
    """pow(color, 1/2.2) on all four channels (post.frag:35-36)."""
    return jnp.power(jnp.maximum(rgba, 0.0), jnp.float32(1.0 / 2.2))
