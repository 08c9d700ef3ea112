"""Isolate the fine kernel's cost: infrastructure vs body.

Builds synthetic fine_walk_multi inputs at the headline candidate scale
(m=417792, k=5) and times:
  A. fine_walk_multi with default knobs (the real kernel)
  B. a NO-OP pallas kernel with the identical grid/BlockSpecs/DMA
     (reads one input block, writes both outputs) — pure per-block
     pipeline + DMA cost
  C. fine_walk_multi with ilp=5 (one while loop for all slots)

If B ~ A, the walk body is free and the cost is per-block
infrastructure; if B << A, the body dominates and op-count cuts matter.

Usage (solo TPU process):
  JAX_PLATFORMS= python scripts/prof_fine_micro.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def time_call(fn, runs=5):
    import jax
    jax.block_until_ready(fn())
    best = np.inf
    for _ in range(runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from voxelray_tpu.ops.pallas.brick_fine import fine_walk_multi
    from voxelray_tpu.ops.pallas.grid_walk import LANES

    m, k = 417792, 5
    dims = (490, 228, 512)
    bdims = (62, 29, 64)
    nb = bdims[0] * bdims[1] * bdims[2]
    rng = np.random.default_rng(0)
    # rays through the unit-ish grid
    o = rng.uniform(0.5, 4.0, (m, 3)).astype(np.float32)
    d = rng.normal(size=(m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    bricks = rng.integers(0, nb, (k, m), dtype=np.int32)
    words = rng.integers(0, 2**32, (k, 16, m), dtype=np.uint64) \
        .astype(np.uint32)
    # ~70% sparse words like real bricks
    words = np.where(rng.random((k, 16, m)) < 0.7, 0, words).astype(
        np.uint32)
    tmin = np.float32(0.001)
    tmax = np.full((m,), 1e4, np.float32)

    args = [jnp.asarray(x) for x in
            (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])]
    bk = jnp.asarray(bricks)
    w = jnp.asarray(words)
    tmx = jnp.asarray(tmax)

    kw = dict(dims=dims, bdims=bdims, origin_key=(0.0, 0.0, 0.0),
              voxel_size=0.00965, bq=32)

    def emit(**kvs):
        print(json.dumps(kvs), flush=True)

    for name, kv in [("real_defaults", {}), ("ilp5", dict(ilp=5)),
                     ("static25", dict(static_steps=True)),
                     ("unroll5", dict(unroll=5))]:
        fn = jax.jit(lambda kv=kv: fine_walk_multi(
            *args, bk, w, tmin, tmx, **kw, **kv))
        emit(what=name, ms=round(time_call(fn), 2))

    # B: no-op kernel, identical grid/specs/DMA
    bq = 32
    per_block = bq * LANES
    n_blocks = -(-m // per_block)
    pad = n_blocks * per_block - m

    def prep(x, fill=0):
        x = jnp.pad(x, (0, pad), constant_values=fill)
        return x.reshape(n_blocks * bq, LANES)

    bk2 = jnp.pad(bk, ((0, 0), (0, pad)), constant_values=-1) \
        .reshape(k, n_blocks * bq, LANES)
    w2 = jnp.pad(w, ((0, 0), (0, 0), (0, pad))) \
        .reshape(k, 16, n_blocks * bq, LANES)

    def noop_kernel(ox, oy, oz, dx, dy, dz, bkr, tmn, tmxr, wr, t_ref,
                    lin_ref):
        # touch the big words block so its DMA cannot be elided
        t_ref[:] = tmn[:] + wr[0, 0].astype(jnp.int32).astype(jnp.float32)
        lin_ref[:] = bkr[0]

    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((bq, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec((k, bq, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((bq, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((k, 16, bq, LANES), lambda i: (0, 0, i, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((bq, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
    )

    def noop():
        return pl.pallas_call(
            noop_kernel, grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_blocks * bq, LANES), jnp.float32),
                jax.ShapeDtypeStruct((n_blocks * bq, LANES), jnp.int32),
            ])(prep(args[0]), prep(args[1]), prep(args[2]),
               prep(args[3], 1.0), prep(args[4], 1.0), prep(args[5], 1.0),
               bk2, prep(jnp.broadcast_to(jnp.float32(tmin), (m,))),
               prep(tmx), w2)

    fn = jax.jit(noop)
    emit(what="noop_strided_specs", ms=round(time_call(fn), 2))

    # block-major no-op: one contiguous DMA per block
    bk3 = bk2.reshape(k, n_blocks, bq, LANES).transpose(1, 0, 2, 3)
    w3 = w2.reshape(k, 16, n_blocks, bq, LANES).transpose(2, 0, 1, 3, 4)

    def noop_kernel_bm(ox, oy, oz, dx, dy, dz, bkr, tmn, tmxr, wr, t_ref,
                       lin_ref):
        t_ref[:] = tmn[:] + wr[0, 0, 0].astype(jnp.int32).astype(jnp.float32)
        lin_ref[:] = bkr[0, 0]

    grid_spec_bm = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((bq, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec((1, k, bq, LANES), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((bq, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((1, k, 16, bq, LANES),
                        lambda i: (i, 0, 0, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((bq, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
    )

    def noop_bm():
        return pl.pallas_call(
            noop_kernel_bm, grid_spec=grid_spec_bm,
            out_shape=[
                jax.ShapeDtypeStruct((n_blocks * bq, LANES), jnp.float32),
                jax.ShapeDtypeStruct((n_blocks * bq, LANES), jnp.int32),
            ])(prep(args[0]), prep(args[1]), prep(args[2]),
               prep(args[3], 1.0), prep(args[4], 1.0), prep(args[5], 1.0),
               bk3, prep(jnp.broadcast_to(jnp.float32(tmin), (m,))),
               prep(tmx), w3)

    fn = jax.jit(noop_bm)
    emit(what="noop_blockmajor_specs", ms=round(time_call(fn), 2))


if __name__ == "__main__":
    main()
