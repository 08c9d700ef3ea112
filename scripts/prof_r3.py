"""Round-3 profiling: targeted measurements driving this round's design.

Questions (one JSON line each):
  A. trace cost vs rounds at the full preset (k=8, ff=8, last-round ff=1)
  B. glue primitive rates at n=2.07M: cumsum, stacks, row gathers, scatters
  C. ray-coherence tiling A/B: raster-order vs 32x128-pixel-tile order
  D. k_hits x rounds x ff sweep (with the forced last-round ff=1)
  E. chunk (bq) sweep for the 64-row L1 table
  F. lax.sort throughput (voxelize sort-based dedup feasibility)
  G. scatter modes (set/add/max) at the voxelize update count
  H. aabb extraction: word_capacity sizing + phase attribution
  I. shadow pass config check

Run as the ONLY TPU process:  JAX_PLATFORMS= python scripts/prof_r3.py
Select stages:  PROF_STAGES=A,B,C  PROF_RUNS=3
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
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / runs * 1e3, compile_s


def _stage_t3(stages):
    import jax
    import jax.numpy as jnp

    from voxelray_tpu.io import meshes
    from voxelray_tpu.ops.intersect import make_camera_rays
    from voxelray_tpu.render.camera import Camera
    runs = int(os.environ.get("PROF_RUNS", "3"))
    if "T3" in stages:
        # tri-march lap anatomy: what actually costs 2.8 s?  rounds
        # (static laps) vs drain laps vs list width (res) vs inner knobs.
        # Hypothesis under test: a COARSER tri grid (fewer, wider cell
        # lists) collapses the march to 1-2 laps — per-cell marching at
        # res 96 pays an inner grid trace per lap and silhouette rays
        # cross dozens of nonempty cells.
        import numpy as np
        from voxelray_tpu.ops.tri_accel import (build_tri_accel,
                                                trace_triangles_grid)
        tv, tf = meshes.icosphere(6)
        tri = tv[tf]
        tw, th = 1280, 720
        tcam = Camera(eye=(2.2, 1.4, -2.2), center=(0.0, 0.0, 0.0))
        _, _, tvi, tpi = tcam.matrices(tw, th)
        to, td = make_camera_rays(tw, th, tvi, tpi)
        to = to.reshape(-1, 3)
        td = td.reshape(-1, 3)
        plan = [(16, ("r3",)), (24, ("r3", "r6")), (32, ("r3", "r6")),
                (48, ("r3",)), (96, ("r3", "r6"))]
        knob = {"r3": dict(rounds=3), "r6": {}}
        for res, names in plan:
            # coarse res can hit the max_l_width=512 clamp — give those
            # rows a larger cap so hit counts stay comparable across res
            # (ADVICE r3: timing a lossy accel skews the lap anatomy)
            ta = build_tri_accel(jnp.asarray(tri[:, 0]),
                                 jnp.asarray(tri[:, 1]),
                                 jnp.asarray(tri[:, 2]), res=res,
                                 max_l_width=4096 if res <= 48 else 512)
            jax.block_until_ready(ta.cell_tris)
            emit(stage="T3", res=res, l_width=ta.l_width,
                 rows=int(ta.cell_tris.shape[0]),
                 overflow=ta.overflow_cells)
            if ta.overflow_cells > 0:
                emit(stage="T3", res=res,
                     skipped="overflow_cells > 0: accel is lossy, timing "
                             "it would skew the comparison")
                continue
            for name in names:
                kw = knob[name]
                fn = jax.jit(lambda kw=kw, ta=ta: trace_triangles_grid(
                    to, td, ta, return_stats="full", **kw))
                dt, cs = time_call(fn, runs)
                t, _, _, _, unres, laps = fn()
                emit(stage="T3", what=f"res{res}_{name}",
                     ms=round(dt, 2),
                     hits=int(np.isfinite(np.asarray(t)).sum()),
                     unresolved=int(unres), drain_laps=int(laps),
                     compile_s=round(cs, 1))
        # voxel-path yardstick for the <10x bar: same mesh voxelized at
        # 192^3, same rays through trace_grid_fast
        from voxelray_tpu.models.grids import GridBool
        from voxelray_tpu.ops.traverse_fast import (build_accel,
                                                    trace_grid_fast)
        tgrid = GridBool.from_mesh(tv, tf, 2.0 / 192)
        yacc = build_accel(jnp.asarray(tgrid.occupancy()), tgrid.origin,
                           tgrid.voxel_size)
        dt2, cs2 = time_call(
            lambda: trace_grid_fast(to, td, yacc)[0], runs)
        emit(stage="T3", what="voxel_trace_same_rays", ms=round(dt2, 2),
             compile_s=round(cs2, 1))



def main():
    stages = os.environ.get("PROF_STAGES", "A,B,C,D,E,F,G,H,I,J").split(",")
    runs = int(os.environ.get("PROF_RUNS", "3"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from voxelray_tpu.io import meshes
    from voxelray_tpu.models.grids import GridBool
    from voxelray_tpu.ops.geometry import grid_dims, mesh_bbox
    from voxelray_tpu.ops.intersect import make_camera_rays
    from voxelray_tpu.ops.traverse_fast import (build_accel,
                                                trace_grid_fast,
                                                any_hit_grid_fast)
    from voxelray_tpu.render.camera import Camera

    log(f"backend={jax.default_backend()}")
    if not (set(stages) - {"T3"}):
        # T3 builds its own tri-accel scenes; skip the ~10-min
        # full-preset voxelize
        _stage_t3(stages)
        return
    v, f = meshes.torus_knot(2, 3, 1024, 512)
    grid_res, W, H = 512, 1920, 1080
    bb_min, bb_max = mesh_bbox(v)
    vs = float(max(bb_max - bb_min)) / grid_res
    grid = GridBool.from_mesh(v, f, vs)
    occ = grid.occupancy()
    accel = build_accel(occ, grid.origin, grid.voxel_size)
    center = (bb_min + bb_max) * 0.5
    cam = Camera(eye=tuple(center + np.asarray([0.9, 0.55, -0.9])
                           * float(max(bb_max - bb_min))),
                 center=tuple(center))
    _, _, vi, pi = cam.matrices(W, H)
    o, d = make_camera_rays(W, H, vi, pi)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    n = o.shape[0]
    log(f"dims={grid.dims} occupied={int(np.asarray(occ).sum())} n={n}")

    def trace(oo, dd, **kw):
        t, lin = trace_grid_fast(oo, dd, accel, **kw)
        return t

    def nhits(oo, dd, **kw):
        t, _ = trace_grid_fast(oo, dd, accel, **kw)
        return int(np.isfinite(np.asarray(t)).sum())

    if "A" in stages:
        for r in (1, 2, 3):
            dt, cs = time_call(lambda r=r: trace(o, d, rounds=r), runs)
            emit(stage="A", rounds=r, ms=round(dt, 2),
                 hits=nhits(o, d, rounds=r), compile_s=round(cs, 1))
        # drain off = the round-2 behavior (coverage-bounded)
        dt, cs = time_call(lambda: trace(o, d, rounds=3, drain=False),
                           runs)
        emit(stage="A", rounds=3, drain=False, ms=round(dt, 2),
             hits=nhits(o, d, rounds=3, drain=False),
             compile_s=round(cs, 1))

    if "B" in stages:
        x = jnp.arange(n, dtype=jnp.int32) % 7
        r8 = jnp.stack([o[:, 0]] * 8, axis=1)
        cap = -(-n // 4) // 8192 * 8192 + 8192
        idx = jnp.arange(cap, dtype=jnp.int32) * 3 % n
        vals = jnp.ones((cap,), jnp.float32)

        prims = {
            "cumsum_i32_n": jax.jit(lambda a: jnp.cumsum(a)),
            "stack8_n": jax.jit(lambda a: jnp.stack([a + i for i in
                                                     range(8)], axis=1)),
            "rowgather8_cap": None,
            "scatter_set_cap": None,
            "colgather1_cap": None,
        }
        dt, _ = time_call(lambda: prims["cumsum_i32_n"](x), runs)
        emit(stage="B", prim="cumsum_i32_n", ms=round(dt, 2))
        dt, _ = time_call(lambda: prims["stack8_n"](o[:, 0]), runs)
        emit(stage="B", prim="stack8_f32_n", ms=round(dt, 2))
        g8 = jax.jit(lambda r, i: r[i])
        dt, _ = time_call(lambda: g8(r8, idx), runs)
        emit(stage="B", prim="rowgather8_cap", ms=round(dt, 2), cap=cap)
        g1 = jax.jit(lambda r, i: r[i])
        dt, _ = time_call(lambda: g1(o[:, 0], idx), runs)
        emit(stage="B", prim="colgather1_cap", ms=round(dt, 2), cap=cap)
        sc = jax.jit(lambda i, vv: jnp.zeros((n + 1,), jnp.float32)
                     .at[i].set(vv, mode="drop"))
        dt, _ = time_call(lambda: sc(idx, vals), runs)
        emit(stage="B", prim="scatter_set_cap_f32", ms=round(dt, 2),
             cap=cap)
        # B2: transposed layout — (8, n) column gather vs (n, 8) rows
        r8t = jnp.stack([o[:, 0]] * 8, axis=0)      # (8, n)
        gt = jax.jit(lambda r, i: jnp.take(r, i, axis=1))
        dt, _ = time_call(lambda: gt(r8t, idx), runs)
        emit(stage="B", prim="colgather_8xn_T", ms=round(dt, 2), cap=cap)
        idx_s = idx[: cap // 4]
        dt, _ = time_call(lambda: gt(r8t, idx_s), runs)
        emit(stage="B", prim="colgather_8xn_T", ms=round(dt, 2),
             cap=cap // 4)
        dt, _ = time_call(lambda: g8(r8, idx_s), runs)
        emit(stage="B", prim="rowgather8_cap", ms=round(dt, 2),
             cap=cap // 4)

    if "C" in stages:
        # tile permutation: (H, W) -> (W//128, H//8, 8, 128) blocks so one
        # (32,128) kernel block = a 32x128-PIXEL rectangle
        assert H % 8 == 0 and W % 128 == 0
        perm = np.arange(H * W, dtype=np.int32).reshape(H, W)
        perm = perm.reshape(H // 8, 8, W // 128, 128) \
            .transpose(2, 0, 1, 3).reshape(-1)
        ot = o[perm]
        dt_ = d[perm]
        t_ms, _ = time_call(lambda: trace(o, d, rounds=3), runs)
        emit(stage="C", order="raster", ms=round(t_ms, 2))
        t_ms, _ = time_call(lambda: trace(ot, dt_, rounds=3), runs)
        emit(stage="C", order="tile32x128", ms=round(t_ms, 2),
             hits_equal=nhits(ot, dt_, rounds=3) == nhits(o, d, rounds=3))
        # 64x64-ish alt: (H//64, 64, W//64... W=1920 not /128-aligned per
        # 64) -> use 16 rows x 128 cols tiles grouped 2x
        perm2 = np.arange(H * W, dtype=np.int32).reshape(H, W) \
            .reshape(H // 24, 24, W // 128, 128).transpose(2, 0, 1, 3) \
            .reshape(-1)
        ot2, dt2 = o[perm2], d[perm2]
        t_ms, _ = time_call(lambda: trace(ot2, dt2, rounds=3), runs)
        emit(stage="C", order="tile24x128", ms=round(t_ms, 2))

    if "D" in stages:
        # rounds=1 + drain won stage A (106.6 vs 154 ms, same 210157
        # hits); sweep around it.  k_hits=16 at full width is excluded:
        # the compiler's buffer estimate blows HBM (17.96G).
        cfgs = [
            dict(rounds=1, k_hits=8, fine_frac=8),       # new baseline
            dict(rounds=1, k_hits=8, fine_frac=4),
            dict(rounds=1, k_hits=8, fine_frac=16),
            dict(rounds=1, k_hits=12, fine_frac=8),
            dict(rounds=1, k_hits=6, fine_frac=8),
            dict(rounds=1, k_hits=8, fine_frac=8, drain_frac=16),
            dict(rounds=1, k_hits=8, fine_frac=8, drain_k=16),
            dict(rounds=1, k_hits=8, fine_frac=8, drain_frac=16,
                 drain_k=16),
            dict(rounds=2, k_hits=(8, 4), fine_frac=8),
        ]
        for cfg in cfgs:
            dt, cs = time_call(lambda cfg=cfg: trace(o, d, **cfg), runs)
            emit(stage="D", ms=round(dt, 2), hits=nhits(o, d, **cfg),
                 compile_s=round(cs, 1), **{k: str(v) for k, v in
                                            cfg.items()})
        # tiled-ray variants of the winner (the pipeline order)
        perm = np.arange(H * W, dtype=np.int32).reshape(H, W) \
            .reshape(H // 8, 8, W // 128, 128).transpose(2, 0, 1, 3) \
            .reshape(-1)
        ot, dt_ = o[perm], d[perm]
        for cfg in (dict(rounds=1, k_hits=8, fine_frac=8),
                    dict(rounds=1, k_hits=8, fine_frac=8,
                         drain_frac=16)):
            dtm, cs = time_call(lambda cfg=cfg: trace(ot, dt_, **cfg),
                                runs)
            emit(stage="D", tiled=True, ms=round(dtm, 2),
                 compile_s=round(cs, 1),
                 **{k: str(v) for k, v in cfg.items()})

    if "K" in stages:
        # TRUE in-jit primitive rates: 20 dependency-chained copies of
        # each primitive inside ONE jit, so per-call dispatch (~30 ms
        # round trip) amortizes to 1.5 ms and XLA cannot elide the work.
        # Stage B's standalone numbers were dispatch-dominated (every op
        # "cost" 10-15 ms).
        reps = 20
        cap8 = -(-n // 8) // 8192 * 8192 + 8192
        r8 = jnp.stack([o[:, 0] + i for i in range(8)], axis=1)
        idx0 = jnp.arange(cap8, dtype=jnp.int32) * 7 % n
        idxf = jnp.arange(n, dtype=jnp.int32) * 7 % n
        xs0 = jnp.arange(n, dtype=jnp.int32) % 5

        @jax.jit
        def chain_cumsum(x):
            for _ in range(reps):
                x = jnp.cumsum(x) & 1023
            return x

        @jax.jit
        def chain_rowgather(idx):
            acc = jnp.float32(0)
            for _ in range(reps):
                g = r8[idx]                      # (cap8, 8) row gather
                idx = (idx + g[:, 0].astype(jnp.int32)) % n
                acc = acc + g[0, 0]
            return idx, acc

        @jax.jit
        def chain_rowgather_full(idx):
            acc = jnp.float32(0)
            for _ in range(reps):
                g = r8[idx]                      # (n, 8) row gather
                idx = (idx + g[:, 0].astype(jnp.int32)) % n
                acc = acc + g[0, 0]
            return idx, acc

        @jax.jit
        def chain_scatter(idx):
            out = jnp.zeros((n + 1,), jnp.int32)
            for _ in range(reps):
                out = out.at[idx].set(1, mode="drop")
                idx = (idx + out[0] + 1) % n
            return out

        @jax.jit
        def chain_wordsgather(idx):
            acc = jnp.uint32(0)
            for _ in range(reps):
                w = jnp.take(accel.fine, idx % accel.fine.shape[1],
                             axis=1)             # (16, n) column take
                idx = idx + (w[0] & 1).astype(jnp.int32)
                acc = acc + w[0, 0]
            return idx, acc

        @jax.jit
        def chain_stack8(x):
            acc = x
            for _ in range(reps):
                s = jnp.stack([acc + i for i in range(8)], axis=1)
                acc = s[:, 0] + s[:, 7] * 0.0
            return acc

        for name, fn, arg in (
                ("cumsum_i32_n", chain_cumsum, xs0),
                ("rowgather8_cap8", chain_rowgather, idx0),
                ("rowgather8_n", chain_rowgather_full, idxf),
                ("scatter_set_cap8", chain_scatter, idx0),
                ("words16_take_n", chain_wordsgather, idxf),
                ("stack8_n", chain_stack8, o[:, 0]),
        ):
            dt, cs = time_call(lambda fn=fn, arg=arg: fn(arg), runs)
            emit(stage="K", prim=name, ms_per_op=round(dt / reps, 3),
                 total_ms=round(dt, 2), compile_s=round(cs, 1))

    if "E" in stages:
        for bq in (16, 32, 64):
            dt, _ = time_call(
                lambda bq=bq: trace(o, d, rounds=3, chunk=bq), runs)
            emit(stage="E", bq=bq, ms=round(dt, 2))

    if "F" in stages:
        for sz in (4 << 20, 44 << 20):
            keys = jnp.asarray(
                np.random.default_rng(1).integers(
                    0, 1 << 31, sz, dtype=np.int32))
            srt = jax.jit(lambda k: jax.lax.sort(k))
            dt, _ = time_call(lambda: srt(keys), runs)
            emit(stage="F", prim="sort_i32", n=sz, ms=round(dt, 2),
                 mkeys_per_s=round(sz / dt / 1e3, 1))
            del keys

    if "G" in stages:
        nu = 44 << 20
        tgt = 16 << 20
        idx = jnp.asarray(np.random.default_rng(2).integers(
            0, tgt, nu, dtype=np.int32))
        ones8 = jnp.ones((nu,), jnp.uint8)
        st = jax.jit(lambda i: jnp.zeros((tgt + 1,), jnp.uint8)
                     .at[i].set(1, mode="drop"))
        dt, _ = time_call(lambda: st(idx), runs)
        emit(stage="G", prim="scatter_set_u8", updates=nu, ms=round(dt, 2),
             mupd_per_s=round(nu / dt / 1e3, 1))
        sm = jax.jit(lambda i: jnp.zeros((tgt + 1,), jnp.uint8)
                     .at[i].max(1, mode="drop"))
        dt, _ = time_call(lambda: sm(idx), runs)
        emit(stage="G", prim="scatter_max_u8", updates=nu, ms=round(dt, 2),
             mupd_per_s=round(nu / dt / 1e3, 1))
        sa = jax.jit(lambda i: jnp.zeros((tgt + 1,), jnp.int32)
                     .at[i].add(1, mode="drop"))
        dt, _ = time_call(lambda: sa(idx), runs)
        emit(stage="G", prim="scatter_add_i32", updates=nu,
             ms=round(dt, 2), mupd_per_s=round(nu / dt / 1e3, 1))
        # fewer, word-packed updates (the x-run packing hypothesis)
        nu2 = 13 << 20
        idx2 = idx[:nu2]
        dt, _ = time_call(lambda: jax.jit(
            lambda i: jnp.zeros((tgt + 1,), jnp.uint8)
            .at[i].set(1, mode="drop"))(idx2), runs)
        emit(stage="G", prim="scatter_set_u8", updates=nu2,
             ms=round(dt, 2), mupd_per_s=round(nu2 / dt / 1e3, 1))

    if "H" in stages:
        from voxelray_tpu.ops.aabbs import (count_nonzero_bytes,
                                            count_nonzero_words,
                                            extract_aabbs_fixed)
        occ_d = jnp.asarray(occ)
        cnt = int(np.asarray(occ).astype(bool).sum())
        nzw = count_nonzero_words(occ)
        nzb = count_nonzero_bytes(occ)
        cap = -(-cnt // 4096) * 4096 + 4096
        log(f"aabb: count={cnt} nzw={nzw} nzb={nzb} cap={cap}")
        for wc, bc in ((nzw + 64, None), (nzw + 64, nzb + 64),
                       (nzw + 64, int(1.2 * nzb)), (None, None)):
            fn = lambda wc=wc, bc=bc: extract_aabbs_fixed(
                occ_d, jnp.asarray(grid.origin),
                capacity=cap, dims=grid.dims,
                voxel_size_static=grid.voxel_size, word_capacity=wc,
                byte_capacity=bc)[0]
            dt, cs = time_call(fn, runs)
            emit(stage="H", word_capacity=str(wc), byte_capacity=str(bc),
                 ms=round(dt, 2), compile_s=round(cs, 1))

    if "H2" in stages:
        # phase attribution for the three-phase extraction: pack / p1
        # (word compaction) / p2a (byte compaction) / full, tight caps
        from voxelray_tpu.ops.aabbs import (count_nonzero_bytes,
                                            count_nonzero_words,
                                            extract_aabbs_fixed)
        occ_d = jnp.asarray(occ)
        cnt = int(np.asarray(occ).astype(bool).sum())
        nzw = count_nonzero_words(occ)
        nzb = count_nonzero_bytes(occ)
        cap = -(-cnt // 4096) * 4096 + 4096
        wc = -(-int(nzw * 1.1) // 8192) * 8192
        bc = -(-int(nzb * 1.1) // 8192) * 8192
        log(f"aabb: count={cnt} nzw={nzw} nzb={nzb} cap={cap} "
            f"wc={wc} bc={bc}")
        for phase in ("pack", "p1", "p2a", None):
            fn = lambda phase=phase: extract_aabbs_fixed(
                occ_d, jnp.asarray(grid.origin), capacity=cap,
                dims=grid.dims, voxel_size_static=grid.voxel_size,
                word_capacity=wc, byte_capacity=bc, stop_after=phase)[0]
            dt, cs = time_call(fn, runs)
            emit(stage="H2", stop_after=str(phase), ms=round(dt, 2),
                 compile_s=round(cs, 1))
        # words-direct (GridBool native storage): same phases minus the
        # dense-volume pack
        from voxelray_tpu.ops.aabbs import extract_aabbs_words
        words_d = grid.words
        for phase in ("p1", "p2a", None):
            fn = lambda phase=phase: extract_aabbs_words(
                words_d, jnp.asarray(grid.origin), capacity=cap,
                dims=grid.dims, voxel_size_static=grid.voxel_size,
                word_capacity=wc, byte_capacity=bc, stop_after=phase)[0]
            dt, cs = time_call(fn, runs)
            emit(stage="H2", stop_after=f"words_{phase}",
                 ms=round(dt, 2), compile_s=round(cs, 1))

    if "H3" in stages:
        # sorted-scatter primitive A/B at the phase-2b lane count: the
        # extraction's placement ranks ASCEND (compaction preserves
        # linear order), so indices_are_sorted / unique_indices hints —
        # or a sorted scatter-max with drop-lanes writing a losing
        # payload — may unlock a faster TPU scatter lowering than the
        # unsorted trash-slot set the phases use today.
        from voxelray_tpu.ops.aabbs import count_nonzero_bytes
        nzb = count_nonzero_bytes(occ)
        bcap = -(-int(nzb * 1.1) // 8192) * 8192
        lanes = 8 * bcap
        cnt = int(np.asarray(occ).astype(bool).sum())
        cap = -(-cnt // 4096) * 4096 + 4096
        rng = np.random.default_rng(0)
        # synthetic ascending ranks: ~cnt of the lanes keep (rank<cap),
        # the rest drop — mirrors the real keep density
        keep_np = np.zeros(lanes, bool)
        keep_np[rng.choice(lanes, size=cnt, replace=False)] = True
        rank_np = np.cumsum(keep_np) - 1
        vals = jnp.asarray(rng.integers(0, 1 << 20, lanes, dtype=np.int32))
        keep = jnp.asarray(keep_np)
        rank = jnp.asarray(rank_np.astype(np.int32))

        reps = 10   # in-jit dependency-chained copies (stage-K pattern:
        #             standalone dispatches are dispatch-dominated)

        def chained(scatter_one):
            @jax.jit
            def run(vals):
                acc = jnp.int32(0)
                for _ in range(reps):
                    out = scatter_one(vals)
                    vals = vals ^ out[0]       # dependency, ~free
                    acc = acc + out[-1]
                return acc
            return run

        def u_unsorted(vals):
            slot = jnp.where(keep, rank, cap)
            return jnp.zeros((cap,), jnp.int32).at[slot].set(
                jnp.where(keep, vals, 0), mode="drop")

        def u_sorted_hint(vals):
            # drop lanes redirected to the trash slot break monotonicity
            # (the promise is technically false for interior drops);
            # measures whether the hint alone changes the lowering
            slot = jnp.where(keep, rank, cap)
            return jnp.zeros((cap,), jnp.int32).at[slot].set(
                jnp.where(keep, vals, 0), mode="drop",
                indices_are_sorted=True, unique_indices=True)

        def u_sorted_max(vals):
            # truly sorted: every lane scatters to clip(rank, 0) (non-
            # decreasing), drop lanes lose the max against the kept
            # writer / the -1 init
            slot = jnp.clip(rank, 0, cap - 1)
            return jnp.full((cap,), -1, jnp.int32).at[slot].max(
                jnp.where(keep, vals, -1), mode="promise_in_bounds",
                indices_are_sorted=True)

        for name, u in (("unsorted_set", u_unsorted),
                        ("sorted_hint_set", u_sorted_hint),
                        ("sorted_max", u_sorted_max)):
            fn = chained(u)
            dt, cs = time_call(lambda fn=fn: fn(vals), runs)
            emit(stage="H3", prim=name, lanes=lanes,
                 ms_per_op=round(dt / reps, 3), compile_s=round(cs, 1))

    if "J" in stages:
        from voxelray_tpu.models.scene import build_scene
        from voxelray_tpu.render.pipeline import render_image
        scene = build_scene(models=None, grid=grid)
        _, _, vi2, pi2 = cam.matrices(W, H)

        def rend(shadows, fo=None):
            return render_image(scene, vi2, pi2, width=W, height=H,
                                backend="fast", shadows=shadows,
                                fast_opts=fo)

        for label, fo in (("default", None),
                          ("r1", {"rounds": 1}),
                          ("r1df16", {"rounds": 1, "drain_frac": 16})):
            dt, cs = time_call(lambda fo=fo: rend(True, fo), runs)
            emit(stage="J", what=f"render_shadows_{label}",
                 ms=round(dt, 2), mrays=round(W * H / dt / 1e3, 2),
                 compile_s=round(cs, 1))
            dt, cs = time_call(lambda fo=fo: rend(False, fo), runs)
            emit(stage="J", what=f"render_primary_{label}",
                 ms=round(dt, 2), mrays=round(W * H / dt / 1e3, 2),
                 compile_s=round(cs, 1))

    if "D3" in stages:
        # follow-up: the fine-words take prices per candidate index
        # (k x fcap), so shallower k + tighter compaction shrink it
        perm = np.arange(H * W, dtype=np.int32).reshape(H, W) \
            .reshape(H // 8, 8, W // 128, 128).transpose(2, 0, 1, 3) \
            .reshape(-1)
        ot, dt_ = o[perm], d[perm]
        for cfg in (dict(rounds=1, k_hits=6, fine_frac=8),
                    dict(rounds=1, k_hits=4, fine_frac=8),
                    dict(rounds=1, k_hits=5, fine_frac=8),
                    dict(rounds=1, k_hits=4, fine_frac=8, drain_k=16),
                    dict(rounds=1, k_hits=3, fine_frac=8)):
            dtm, cs = time_call(lambda cfg=cfg: trace(ot, dt_, **cfg),
                                runs)
            emit(stage="D3", tiled=True, ms=round(dtm, 2),
                 hits=nhits(ot, dt_, **cfg), compile_s=round(cs, 1),
                 **{k: str(v) for k, v in cfg.items()})

    if "I2" in stages:
        hit_t = trace(o, d)
        hit = jnp.isfinite(hit_t)
        p = o + d * jnp.where(hit, hit_t, 1.0)[:, None]
        ldir = jnp.asarray([0.45, 0.8, 0.4], jnp.float32)
        ldir = ldir / jnp.linalg.norm(ldir)
        ld = jnp.broadcast_to(ldir, p.shape)
        adm = hit
        occl_ref = None
        for label, kw in (
                ("r1_k4_af4", dict(rounds=1, k_hits=4)),
                ("r1_k4_af4_ff1", dict(rounds=1, k_hits=4, fine_frac=1)),
                ("r1_k5_af4", dict(rounds=1, k_hits=5)),
                ("r1_k3_af4", dict(rounds=1, k_hits=3)),
        ):
            fn = lambda kw=kw: any_hit_grid_fast(p, ld, accel, admit=adm,
                                                 **kw)
            dt, cs = time_call(fn, runs)
            occl = int(np.asarray(fn()).sum())
            if occl_ref is None:
                occl_ref = occl
            emit(stage="I2", what=label, ms=round(dt, 2), occluded=occl,
                 match=occl == occl_ref, compile_s=round(cs, 1))

    if "J2" in stages:
        from voxelray_tpu.models.scene import build_scene
        from voxelray_tpu.render.pipeline import render_image
        scene = build_scene(models=None, grid=grid)
        _, _, vi2, pi2 = cam.matrices(W, H)

        def rend(shadows, fo=None):
            return render_image(scene, vi2, pi2, width=W, height=H,
                                backend="fast", shadows=shadows,
                                fast_opts=fo)

        for label, fo in (("defaults", None),
                          ("k4", {"k_hits": 4}),
                          ("k5", {"k_hits": 5})):
            dt, cs = time_call(lambda fo=fo: rend(False, fo), runs)
            emit(stage="J2", what=f"primary_{label}", ms=round(dt, 2),
                 mrays=round(W * H / dt / 1e3, 2), compile_s=round(cs, 1))
            dt, cs = time_call(lambda fo=fo: rend(True, fo), runs)
            emit(stage="J2", what=f"shadows_{label}", ms=round(dt, 2),
                 mrays=round(W * H / dt / 1e3, 2), compile_s=round(cs, 1))

    if "T" in stages:
        # triangle-path acceleration at mesh scale (VERDICT r2 item 5's
        # "done" bar: ~100k-tri mesh rendered as TRIANGLE geometry in
        # < 10x the voxel-path time).  81,920-tri icosphere, 1280x720.
        from voxelray_tpu.ops.tri_accel import (build_tri_accel,
                                                trace_triangles_grid)
        tv, tf = meshes.icosphere(6)
        tri = tv[tf]
        t0s = time.perf_counter()
        ta = build_tri_accel(jnp.asarray(tri[:, 0]), jnp.asarray(tri[:, 1]),
                             jnp.asarray(tri[:, 2]), res=96)
        jax.block_until_ready(ta.cell_tris)
        build_s = time.perf_counter() - t0s
        tw, th = 1280, 720
        tcam = Camera(eye=(2.2, 1.4, -2.2), center=(0.0, 0.0, 0.0))
        _, _, tvi, tpi = tcam.matrices(tw, th)
        to, td = make_camera_rays(tw, th, tvi, tpi)
        to = to.reshape(-1, 3)
        td = td.reshape(-1, 3)

        def tri_trace():
            return trace_triangles_grid(to, td, ta)[0]

        dt, cs = time_call(tri_trace, runs)
        hits = int(np.isfinite(np.asarray(tri_trace())).sum())
        emit(stage="T", what="tri_grid_trace_81920", ms=round(dt, 2),
             n_rays=tw * th, hits=hits, build_s=round(build_s, 2),
             mrays=round(tw * th / dt / 1e3, 2), compile_s=round(cs, 1))
        # voxel-path yardstick: same mesh voxelized at 192^3, same rays
        tgrid = GridBool.from_mesh(tv, tf, 2.0 / 192)
        tscene_accel = build_accel(
            jnp.asarray(tgrid.occupancy()), tgrid.origin,
            tgrid.voxel_size)

        def vox_trace():
            return trace_grid_fast(to, td, tscene_accel)[0]

        dt2, cs2 = time_call(vox_trace, runs)
        emit(stage="T", what="voxel_trace_same_rays", ms=round(dt2, 2),
             ratio_tri_over_vox=round(dt / max(dt2, 1e-9), 2),
             compile_s=round(cs2, 1))

    _stage_t3(stages)

    if "V" in stages:
        # voxelize with the effective-window bucketing (dead +2-slack
        # slabs cut host-side): slot count and wall-clock vs round 2's
        # 38.3M slots / ~495 ms
        from voxelray_tpu.ops.voxelize import (VoxelizePlan,
                                               _np_effective_extents)
        st_, w_eff = _np_effective_extents(
            v, f, grid.origin, grid.voxel_size, grid.dims)
        slots = int(w_eff.prod(axis=1).sum())
        for mb in (12, 24, 48):
            plan = VoxelizePlan(v, f, grid.voxel_size, max_buckets=mb)
            padded = sum(int(win[0] * win[1] * win[2]) * len(fi)
                         for win, fi in plan.buckets)
            fn = lambda plan=plan: plan(v)[0]
            dt, cs = time_call(fn, runs)
            occ_new, calls_new = plan(v)
            ok = bool(np.array_equal(np.asarray(occ_new, bool),
                                     np.asarray(occ, bool)))
            emit(stage="V", max_buckets=mb, ms=round(dt, 2),
                 slots_exact=slots, slots_padded=padded,
                 occupancy_match=ok, set_calls=int(calls_new),
                 set_calls_match=int(calls_new) == int(grid.set_calls),
                 compile_s=round(cs, 1))

    if "V2" in stages:
        # fused single-program voxelizer: attribution (scatter vs SAT)
        # and bucket-count sweep.  count_only skips the occupancy
        # scatter, so fused - count_only ~= the scatter cost.
        from voxelray_tpu.ops.voxelize import (VoxelizePlan,
                                               voxelize_planned)
        # 48 buckets regressed in the per-bucket-dispatch era (677 ms:
        # too many program variants); under the fused single program
        # extra buckets are just more unrolled segments — re-test
        for mb in (16, 24, 32, 48):
            plan = VoxelizePlan(v, f, grid.voxel_size, max_buckets=mb)
            padded = sum(c_ * w_[0] * w_[1] * w_[2]
                         for _, c_, w_, _ in plan.layout)
            dt, cs = time_call(lambda plan=plan: plan(v)[0], runs)
            occ_new, calls_new = voxelize_planned(plan, v)
            ok = bool(np.array_equal(np.asarray(occ_new, bool),
                                     np.asarray(occ, bool)))
            dt_cnt, cs2 = time_call(
                lambda plan=plan: voxelize_planned(plan, v,
                                                   count_only=True)[1],
                runs)
            emit(stage="V2", max_buckets=mb, ms=round(dt, 2),
                 count_only_ms=round(dt_cnt, 2), slots_padded=padded,
                 occupancy_match=ok,
                 set_calls_match=int(calls_new) == int(grid.set_calls),
                 compile_s=round(cs, 1), compile_cnt_s=round(cs2, 1))

    if "I" in stages:
        hit_t = trace(o, d, rounds=3)
        hit = jnp.isfinite(hit_t)
        p = o + d * jnp.where(hit, hit_t, 1.0)[:, None]
        ldir = jnp.asarray([0.45, 0.8, 0.4], jnp.float32)
        ldir = ldir / jnp.linalg.norm(ldir)
        ld = jnp.broadcast_to(ldir, p.shape)
        adm = hit
        occl_ref = None
        for label, kw in (
                ("default_r2_k84", dict()),
                ("r1_k8", dict(rounds=1, k_hits=8)),
                ("r1_k12", dict(rounds=1, k_hits=12)),
                ("r1_k4", dict(rounds=1, k_hits=4)),
                ("r2_k44", dict(rounds=2, k_hits=(4, 4))),
        ):
            fn = lambda kw=kw: any_hit_grid_fast(p, ld, accel, admit=adm,
                                                 **kw)
            dt, cs = time_call(fn, runs)
            occl = int(np.asarray(fn()).sum())
            if occl_ref is None:
                occl_ref = occl
            emit(stage="I", what=label, ms=round(dt, 2), occluded=occl,
                 match=occl == occl_ref, compile_s=round(cs, 1))

    log("done")


if __name__ == "__main__":
    main()
