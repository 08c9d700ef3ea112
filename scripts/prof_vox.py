"""Profile the bucketed voxelizer: where do the ~500 ms go?

Run as the ONLY TPU process:  JAX_PLATFORMS= python scripts/prof_vox.py
"""
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from voxelray_tpu.io import meshes
    from voxelray_tpu.ops.geometry import mesh_bbox
    from voxelray_tpu.ops.voxelize import plan_voxelize, voxelize_planned

    v, f = meshes.torus_knot(2, 3, 1024, 512)
    bb_min, bb_max = mesh_bbox(v)
    extent = float(max(bb_max - bb_min))
    vs = extent / 512
    plan = plan_voxelize(v, f, vs, bb_min=bb_min, bb_max=bb_max)
    v_dev = jnp.asarray(v)

    def fn():
        occ, _ = voxelize_planned(plan, v_dev)
        return occ
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn()
    jax.block_until_ready(out)
    emit(stage="vox", ms=round((time.perf_counter() - t0) / 3 * 1e3, 1))

    with jax.profiler.trace("/tmp/jxtv"):
        jax.block_until_ready(fn())
    path = sorted(glob.glob("/tmp/jxtv/**/*.trace.json.gz",
                            recursive=True))[-1]
    with gzip.open(path) as fh:
        data = json.load(fh)
    pids = {e["pid"]: e["args"].get("name", "")
            for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    rows = collections.Counter()
    total = 0
    for e in data["traceEvents"]:
        if (e.get("ph") == "X" and "dur" in e
                and pids.get(e.get("pid"), "").startswith("/device")
                and not e.get("name", "").startswith("jit_")):
            src = (e.get("args") or {}).get("source", "?")
            op = (e.get("args") or {}).get("tf_op", e.get("name"))
            rows[(src.split("/")[-1], op.split("/")[-1].split(":")[0])] \
                += e["dur"]
            total += e["dur"]
    emit(stage="profile_total", ms=round(total / 1e3, 1))
    for (src, op), d in rows.most_common(16):
        emit(stage="profile", src=src, op=op, ms=round(d / 1e3, 2))


if __name__ == "__main__":
    main()
