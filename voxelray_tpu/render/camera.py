"""Camera math: lookAt / perspective with the reference's conventions.

The reference drives its ray generation entirely from two inverse matrices
uploaded per frame (hello_vulkan.cpp:66-106):

  view = lookAtRH(eye, center, up)            (nvh::CameraManipulator)
  proj = perspectiveRH_ZO(radians(fov), aspect, 0.1, 1000); proj[1][1] *= -1

and the raygen shader reconstructs rays as (raytrace.rgen:41-47):

  d      = ((pixel + 0.5) / size) * 2 - 1
  origin = viewInverse * (0,0,0,1)
  target = projInverse * (d.x, d.y, 1, 1)
  dir    = viewInverse * (normalize(target.xyz), 0)

Matrices here are numpy float32 in *row-vector-on-the-right* math layout
(apply as M @ v), producing the same numbers as the column-major glm code.
Defaults mirror main.cpp:92 (camera pose) and the manipulator's 60-degree
FOV.
"""
from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np

__all__ = ["look_at", "perspective_rh_zo", "Camera", "orbit_path"]


def look_at(eye, center, up) -> np.ndarray:
    """glm::lookAtRH as a row-major 4x4 float32 (apply via M @ v)."""
    eye = np.asarray(eye, np.float32)
    center = np.asarray(center, np.float32)
    up = np.asarray(up, np.float32)
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)
    return m


def perspective_rh_zo(fov_y_rad: float, aspect: float, z_near: float,
                      z_far: float, flip_y: bool = True) -> np.ndarray:
    """glm::perspectiveRH_ZO, with the Vulkan Y flip applied by default
    (proj[1][1] *= -1, hello_vulkan.cpp:73)."""
    t = np.float32(np.tan(fov_y_rad * 0.5))
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = 1.0 / (aspect * t)
    m[1, 1] = 1.0 / t
    m[2, 2] = z_far / (z_near - z_far)
    m[2, 3] = -(z_far * z_near) / (z_far - z_near)
    m[3, 2] = -1.0
    if flip_y:
        m[1, 1] = -m[1, 1]
    return m


@dataclass(frozen=True)
class Camera:
    """Pinhole camera; defaults are the app's startup pose (main.cpp:92)."""

    eye: tuple = (6.16636, 2.42256, -3.15471)
    center: tuple = (0.0, 1.0, 0.0)
    up: tuple = (0.0, 1.0, 0.0)
    fov_deg: float = 60.0           # CameraManipulator default FOV
    z_near: float = 0.1
    z_far: float = 1000.0

    def matrices(self, width: int, height: int):
        """(view, proj, view_inverse, proj_inverse) float32, GlobalUniforms
        equivalents (host_device.h:68-73)."""
        aspect = np.float32(width) / np.float32(height)
        view = look_at(self.eye, self.center, self.up)
        proj = perspective_rh_zo(
            np.radians(np.float32(self.fov_deg)), aspect,
            np.float32(self.z_near), np.float32(self.z_far),
        )
        return (view, proj,
                np.linalg.inv(view).astype(np.float32),
                np.linalg.inv(proj).astype(np.float32))

    def with_eye(self, eye) -> "Camera":
        return replace(self, eye=tuple(float(x) for x in eye))


def orbit_path(n_frames: int, center=(0.0, 1.0, 0.0), radius: float = 7.0,
               height: float = 2.4, base: Camera | None = None):
    """Camera fly-through: n_frames cameras orbiting the scene center —
    the batch-render replacement for the interactive GLFW loop."""
    base = base or Camera(center=center)
    cams = []
    for i in range(n_frames):
        a = 2.0 * np.pi * i / max(1, n_frames)
        eye = (center[0] + radius * np.cos(a), height,
               center[2] + radius * np.sin(a))
        cams.append(base.with_eye(eye))
    return cams
