"""Component-level on-chip timings for the fast traversal pipeline.

Times each stage of trace_grid_fast in isolation on the full-preset
scene (2M camera rays, 512^3 grid) so regressions can be attributed:

  coarse      one coarse_walk call, all rays (k_hits=4), bq sweep
  gather      the (16, K*fcap) fine-word gather alone
  fine        one fused fine_walk_multi call at fcap, bq sweep
  glue        the cumsum-compaction select/scatter glue alone
  single      round-1 style per-slot fine_walk over ALL rays

Run as the ONLY TPU process:  JAX_PLATFORMS= python scripts/microprof_tpu.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def time_call(fn, runs=3):
    import jax
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / runs


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from voxelray_tpu.io import meshes
    from voxelray_tpu.ops.geometry import grid_dims, mesh_bbox
    from voxelray_tpu.ops.intersect import make_camera_rays
    from voxelray_tpu.ops.traverse_fast import (BRICK, _init_state,
                                                build_accel)
    from voxelray_tpu.ops.pallas.brick_fine import fine_walk_multi
    from voxelray_tpu.ops.pallas.grid_walk import LANES, coarse_walk
    from voxelray_tpu.ops.voxelize import plan_voxelize, voxelize_planned
    from voxelray_tpu.render.camera import Camera

    log(f"backend={jax.default_backend()}")
    v, f = meshes.torus_knot(2, 3, 1024, 512)
    grid_res, width, height = 512, 1920, 1080
    bb_min, bb_max = mesh_bbox(v)
    extent = float(max(bb_max - bb_min))
    vs = extent / grid_res
    plan = plan_voxelize(v, f, vs, bb_min=bb_min, bb_max=bb_max)
    occ, _ = voxelize_planned(plan, jnp.asarray(v), scatter="flat")
    accel = build_accel(occ, bb_min, vs)
    center = (bb_min + bb_max) * 0.5
    cam = Camera(eye=tuple(center + np.asarray([0.9, 0.55, -0.9]) * extent),
                 center=tuple(center))
    _, _, vi, pi = cam.matrices(width, height)
    origins, dirs = make_camera_rays(width, height, jnp.asarray(vi),
                                     jnp.asarray(pi))
    o = origins.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    n = o.shape[0]
    t_max = jnp.full((n,), jnp.float32(1e30))
    bw = float(accel.voxel_size * BRICK)
    log(f"n={n} bdims={accel.bdims} rows={accel.coarse.shape[0]}")

    init = jax.jit(lambda o, d, tm: _init_state(o, d, accel, tm))
    cx, cy, cz, act = init(o, d, t_max)
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]

    # ---- coarse walk, bq sweep ---------------------------------------
    for bq in (16, 32, 64):
        def fn(bq=bq):
            return coarse_walk(ox, oy, oz, dx, dy, dz, cx, cy, cz,
                               act.astype(jnp.int32), t_max, accel.coarse,
                               None, bdims=accel.bdims,
                               origin_key=accel.origin_key, brick_world=bw,
                               bq=bq, k_hits=4)[0]
        try:
            dt = time_call(fn)
        except Exception as e:
            emit(stage="coarse", bq=bq, error=str(e)[:160])
            continue
        hits = fn()
        emit(stage="coarse", bq=bq, ms=round(dt * 1e3, 1),
             cands=int((np.asarray(hits[0]) >= 0).sum()))

    # state after one coarse call (for realistic fine inputs)
    hits = coarse_walk(ox, oy, oz, dx, dy, dz, cx, cy, cz,
                       act.astype(jnp.int32), t_max, accel.coarse, None,
                       bdims=accel.bdims, origin_key=accel.origin_key,
                       brick_world=bw, bq=64, k_hits=4)[0]
    has = np.asarray(hits[0]) >= 0
    fcap = 524288
    # compact host-side (deterministic inputs for the kernels below)
    idx = np.flatnonzero(has)[:fcap]
    pad = fcap - len(idx)
    idx = np.pad(idx, (0, pad))
    sel = jnp.asarray(idx)
    bricks_c = jnp.stack([hits[s][sel] for s in range(4)])
    oxc, oyc, ozc = ox[sel], oy[sel], oz[sel]
    dxc, dyc, dzc = dx[sel], dy[sel], dz[sel]
    tmx_c = t_max[sel]

    # ---- the fine-word gather alone ----------------------------------
    @jax.jit
    def gather_words(bricks_c):
        bl = jnp.maximum(bricks_c, 0).reshape(-1)
        w = jnp.take(accel.fine, bl, axis=1)
        return w.reshape(16, 4, fcap).transpose(1, 0, 2)

    dt = time_call(lambda: gather_words(bricks_c))
    emit(stage="gather", shape=[16, 4 * fcap], ms=round(dt * 1e3, 1))
    words_c = gather_words(bricks_c)

    # ---- fused fine kernel, bq sweep ----------------------------------
    for bq in (32, 64, 128, 256):
        def fn(bq=bq):
            return fine_walk_multi(
                oxc, oyc, ozc, dxc, dyc, dzc, bricks_c, words_c,
                jnp.float32(1e-4), tmx_c, dims=accel.dims,
                bdims=accel.bdims, origin_key=accel.origin_key,
                voxel_size=accel.voxel_size, bq=bq)[0]
        try:
            dt = time_call(fn)
        except Exception as e:
            emit(stage="fine", bq=bq, error=str(e)[:160])
            continue
        t = fn()
        emit(stage="fine", bq=bq, ms=round(dt * 1e3, 1),
             resolved=int(np.isfinite(np.asarray(t)).sum()))

    # ---- compaction glue alone ----------------------------------------
    @jax.jit
    def glue(active, o, d, cx, cy, cz, t_max):
        cap = fcap
        pos = jnp.cumsum(active.astype(jnp.int32)) - 1
        slot = jnp.where(active & (pos < cap), pos, cap)
        sel = jnp.full((cap,), n, jnp.int32).at[slot].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        live = sel < n
        sel_c = jnp.minimum(sel, n - 1)
        outs = (o[sel_c, 0], o[sel_c, 1], o[sel_c, 2],
                d[sel_c, 0], d[sel_c, 1], d[sel_c, 2],
                cx[sel_c], cy[sel_c], cz[sel_c], t_max[sel_c], live)
        # scatter-back of t/lin/state (the other half of the glue)
        tt = jnp.zeros((cap,), jnp.float32)
        best = jnp.full((n,), jnp.inf, jnp.float32).at[sel].set(
            tt, mode="drop")
        return outs[0], best

    dt = time_call(lambda: glue(act, o, d, cx, cy, cz, t_max))
    emit(stage="glue", ms=round(dt * 1e3, 1))

    # ---- round-1 style: per-slot fine over ALL rays --------------------
    @jax.jit
    def single_slot_all():
        t = jnp.full((n,), jnp.inf, jnp.float32)
        for s in range(4):
            hit_s = jnp.where(jnp.isfinite(t), -1, hits[s])
            bl = jnp.maximum(hit_s, 0)
            words = jnp.take(accel.fine, bl, axis=1)
            t_s, _ = fine_walk_multi(
                ox, oy, oz, dx, dy, dz, hit_s[None], words[None],
                jnp.float32(1e-4), t_max, dims=accel.dims,
                bdims=accel.bdims, origin_key=accel.origin_key,
                voxel_size=accel.voxel_size, bq=64)
            t = jnp.where(jnp.isfinite(t_s) & ~jnp.isfinite(t), t_s, t)
        return t

    dt = time_call(single_slot_all)
    emit(stage="single_slot_all", ms=round(dt * 1e3, 1))


if __name__ == "__main__":
    main()
