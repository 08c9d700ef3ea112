"""Round-5: jax.profiler capture of the production frame + xplane parse.

Captures a device trace of K pipelined shadowed/primary frames and
aggregates device-op durations by name — the first REAL in-frame
attribution (all prior rounds inferred stage costs from prefix-program
marginals, which XLA fuses differently than the full frame).

Run solo on TPU:
  JAX_PLATFORMS= PYTHONPATH=/root/repo:/root/.axon_site \
      python scripts/prof_r6_trace.py
"""
import glob
import gzip
import os
import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp


def log(**kw):
    print(json.dumps(kw), flush=True)


def parse_xplane(path):
    """Aggregate device-plane event durations (us) by event name
    (raw wire-format decode — this image has no xplane_pb2; see
    scripts/parse_xplane.py)."""
    import parse_xplane as px
    out = []
    buf = open(path, "rb").read()
    for fnum, val in px.fields(buf):
        if fnum != 1:
            continue
        name = ""
        meta = {}
        lines = []
        for f2, v2 in px.fields(val):
            if f2 == 2:
                name = v2.decode(errors="replace")
            elif f2 == 4:
                k = None
                mname = ""
                for f3, v3 in px.fields(v2):
                    if f3 == 1:
                        k = v3
                    elif f3 == 2:
                        for f4, v4 in px.fields(v3):
                            if f4 == 2:
                                mname = v4.decode(errors="replace")
                meta[k] = mname
            elif f2 == 3:
                lines.append(v2)
        if "TPU" not in name and "device" not in name.lower():
            continue
        agg = defaultdict(lambda: [0.0, 0])
        for ln in lines:
            for f3, v3 in px.fields(ln):
                if f3 == 4:
                    mid = dur = 0
                    for f4, v4 in px.fields(v3):
                        if f4 == 1:
                            mid = v4
                        elif f4 == 3:
                            dur = v4
                    a = agg[meta.get(mid, str(mid))]
                    a[0] += dur / 1e6
                    a[1] += 1
        out.append((name, agg))
    return out


def main():
    from voxelray_tpu.io import meshes
    from voxelray_tpu.models.grids import GridBool
    from voxelray_tpu.models.scene import build_scene
    from voxelray_tpu.ops.geometry import mesh_bbox
    from voxelray_tpu.render.camera import Camera, orbit_path
    from voxelray_tpu.render.pipeline import render_image

    log(backend=jax.default_backend())
    W, H = 1920, 1080
    v, f = meshes.torus_knot(2, 3, 1024, 512)
    bb_min, bb_max = mesh_bbox(v)
    vs = float(max(bb_max - bb_min)) / 512
    cache = "/tmp/bench_occ512.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        grid = GridBool.from_occupancy(jnp.asarray(z["occ"]), z["origin"],
                                       float(z["vs"]))
    else:
        grid = GridBool.from_mesh(v, f, vs)
    scene = build_scene(models=None, grid=grid)
    log(stage="scene", dims=list(grid.dims))

    center = tuple(((bb_min + bb_max) * 0.5).tolist())
    radius = float(np.max(bb_max - bb_min)) * 1.2
    cams = list(orbit_path(8, center=center, radius=radius,
                           height=center[1] + radius * 0.3))
    mats = [c.matrices(W, H)[2:] for c in cams]
    mats = [(jnp.asarray(vi), jnp.asarray(pi)) for vi, pi in mats]

    # isolated pipelined trace (r4 comparable: trace_ff8 was 48.3 ms)
    from voxelray_tpu.ops.intersect import make_camera_rays
    from voxelray_tpu.ops.traverse_fast import trace_grid_fast
    from voxelray_tpu.render.pipeline import _tile_rays
    rays = []
    for vi, pi in mats:
        o, d = make_camera_rays(W, H, vi, pi)
        rays.append((_tile_rays(o, H, W), _tile_rays(d, H, W)))
    jax.block_until_ready(rays)

    def tr(o, d):
        return trace_grid_fast(o, d, scene.accel)
    jax.block_until_ready(tr(*rays[0]))
    t0 = time.time()
    outs = [tr(*r) for r in rays]
    jax.block_until_ready(outs)
    log(stage="timing", tag="trace_fusedinit",
        ms=round((time.time() - t0) / len(rays) * 1e3, 1),
        hits=int(np.isfinite(np.asarray(outs[0][0])).sum()))

    for shadows, tag in ((False, "primary"), (True, "shadowed")):
        def frame(vi, pi):
            return render_image(scene, vi, pi, width=W, height=H,
                                backend="fast", shadows=shadows)
        # warm
        jax.block_until_ready(frame(*mats[0]))
        t0 = time.time()
        outs = [frame(*m) for m in mats]
        jax.block_until_ready(outs)
        ms = (time.time() - t0) / len(mats) * 1e3
        log(stage="timing", tag=tag, ms=round(ms, 1))

        tdir = f"/tmp/xprof_{tag}"
        os.system(f"rm -rf {tdir}")
        jax.profiler.start_trace(tdir)
        outs = [frame(*m) for m in mats]
        jax.block_until_ready(outs)
        jax.profiler.stop_trace()

        pbs = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
        log(stage="capture", tag=tag, files=pbs)
        for pb in pbs:
            try:
                planes = parse_xplane(pb)
            except Exception as e:  # noqa
                log(stage="parse_error", err=str(e))
                continue
            for pname, agg in planes:
                rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]
                log(stage="plane", tag=tag, plane=pname,
                    total_ms=round(sum(a[0] for a in agg.values()) / 1e3
                                   / len(mats), 2))
                for name, (us, n) in rows:
                    log(op=name[:120], ms_per_frame=round(us / 1e3 /
                                                          len(mats), 3),
                        calls=n)


if __name__ == "__main__":
    main()
