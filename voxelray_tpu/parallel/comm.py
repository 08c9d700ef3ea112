"""Device mesh, shardings, and collectives — the distributed layer.

The reference is strictly single-GPU (SURVEY.md section 2.4); its only
parallelism is a std::thread fan-out over triangles with a serial merge
(VoxelBuilder.hpp:462-537).  The TPU-native equivalents:

  voxelize: shard triangles across devices ("data" axis); each device
            scatters into its own occupancy copy; merge with a bitwise-OR
            all-reduce (jnp.max psum-style over uint8) riding ICI —
            the deterministic analog of the thread-bucket merge.
  render:   shard the pixel rows ("rays" axis) — each device traces its
            rows against the replicated scene; the framebuffer is formed
            by construction (no gather needed under jit output sharding).
  frames:   batch-of-frames data parallelism for animation / deforming
            meshes (BASELINE config 5).

Everything uses jax.sharding.Mesh + shard_map with explicit collectives;
no NCCL/MPI analog exists or is needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_triangles", "voxelize_sharded",
           "render_sharded", "or_reduce_occupancy"]


def make_mesh(n_devices: int | None = None, axis: str = "rays") -> Mesh:
    """1-D device mesh over all (or the first n) local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_triangles(tri_verts: np.ndarray, n_shards: int) -> np.ndarray:
    """Pad triangle array to a multiple of n_shards with +inf sentinels
    (empty windows) so every shard gets equal static shape."""
    f = tri_verts.shape[0]
    per = -(-f // n_shards)
    pad = per * n_shards - f
    return np.pad(tri_verts, ((0, pad), (0, 0), (0, 0)),
                  constant_values=np.inf)


def or_reduce_occupancy(occ, axis_name: str):
    """Bitwise-OR all-reduce of {0,1} uint8 occupancy over the mesh axis.

    OR == max == (psum > 0); psum maps onto the ICI all-reduce fast path.
    """
    return (jax.lax.psum(occ.astype(jnp.int32), axis_name) > 0) \
        .astype(jnp.uint8)


def voxelize_sharded(tri_verts, origin, mesh: Mesh, *, dims,
                     voxel_size, window, chunk=4096):
    """Triangle-sharded voxelization with an OR all-reduce merge.

    tri_verts: (F, 3, 3) float32 (host or device).  Returns occ (Z, Y, X)
    uint8 replicated, set_calls int32 (total across shards).
    """
    from ..ops.voxelize import voxelize_dense

    axis = mesh.axis_names[0]
    n = mesh.devices.size
    tri = shard_triangles(np.asarray(tri_verts, np.float32), n)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P()), out_specs=(P(), P()),
        check_vma=False,
    )
    def _vox(tri_shard, org):
        occ, calls = voxelize_dense(
            tri_shard, org, dims=dims,
            voxel_size_static=float(voxel_size), window=window,
            chunk=chunk)
        occ = or_reduce_occupancy(occ, axis)
        calls = jax.lax.psum(calls, axis)
        return occ, calls

    return _vox(jnp.asarray(tri), jnp.asarray(origin, jnp.float32))


def render_sharded(scene, view_inv, proj_inv, mesh: Mesh, *, width, height,
                   light=None, clear_color=(1.0, 1.0, 1.0, 1.0),
                   backend="fast", shadows=True, fast_opts=None):
    """Row-sharded render: each device traces ceil(height/n) rows.

    This is the multi-chip form of the production render (SURVEY §2.4
    row 3 — the SIMT-ray axis is what shards): backend defaults to the
    same Pallas "fast" path render_image ships, with the same per-shard
    ray-coherence tiling when the shard's row block tiles evenly, and
    falls back to the dda/brute paths exactly like render_image.
    shadows/fast_opts mirror render_image's knobs.

    Any (height, n_devices) combination works: the row axis is padded to
    a multiple of n (padding rows trace duplicate last-row rays — their
    output is trimmed before returning) and the result is the exact
    (H, W, 4) framebuffer (sharded over rows on the mesh; convert with
    np.asarray to gather to host).
    """
    from ..models.scene import Light
    from ..ops.intersect import make_camera_rays
    from ..render import shading
    from ..render.pipeline import (_can_tile, _tile_rays, _untile_rays,
                                   render_rays)

    light = light or Light()
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    rows_per = -(-height // n)
    pad_rows = rows_per * n - height
    if backend == "fast" and scene.accel is None:
        backend = "dda"  # render_image's own fallback chain
    opts = tuple(sorted(
        (k, tuple(v) if isinstance(v, list) else v)
        for k, v in fast_opts.items())) if fast_opts else ()

    lp = jnp.asarray(light.position, jnp.float32)
    li = jnp.float32(light.intensity)
    lt = jnp.int32(light.type)
    cc = jnp.asarray(clear_color, jnp.float32)

    # ray generation is cheap: compute per-shard rows inside the shard
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    def _render(scene_rep, vi, pi):
        row0 = jax.lax.axis_index(axis) * rows_per
        origins, dirs = make_camera_rays(width, height, vi, pi)
        if pad_rows:
            # duplicate the last row so every shard slices a full block
            origins = jnp.concatenate(
                [origins, jnp.broadcast_to(origins[-1:],
                                           (pad_rows,) + origins.shape[1:])])
            dirs = jnp.concatenate(
                [dirs, jnp.broadcast_to(dirs[-1:],
                                        (pad_rows,) + dirs.shape[1:])])
        o = jax.lax.dynamic_slice_in_dim(origins, row0, rows_per, axis=0)
        d = jax.lax.dynamic_slice_in_dim(dirs, row0, rows_per, axis=0)
        tiled = backend == "fast" and _can_tile(rows_per, width)
        if tiled:
            o = _tile_rays(o, rows_per, width)
            d = _tile_rays(d, rows_per, width)
        rgb = render_rays(scene_rep, o, d, lp, li, lt, cc, backend=backend,
                          shadows=shadows, fast_opts=opts)
        if tiled:
            rgb = _untile_rays(rgb, rows_per, width)
        rgba = jnp.concatenate(
            [rgb, jnp.ones(rgb.shape[:-1] + (1,), jnp.float32)], axis=-1)
        return shading.gamma_post(rgba)

    img = _render(scene, jnp.asarray(view_inv), jnp.asarray(proj_inv))
    return img[:height] if pad_rows else img
