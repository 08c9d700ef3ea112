"""Debug test_rays_starting_inside_grid lane 472: brute hit t=0.334,
tri-grid march misses.  Never green on CPU since the test landed —
latent march bug, not a regression."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from voxelray_tpu.io import meshes
from voxelray_tpu.ops.traverse import trace_triangles_brute
from voxelray_tpu.ops.tri_accel import (build_tri_accel,
                                        trace_triangles_grid, _cell_span)
from voxelray_tpu.ops.traverse_fast import trace_grid_fast

v, f = meshes.icosphere(3)
tri = v[f]
ta = build_tri_accel(tri[:, 0], tri[:, 1], tri[:, 2], res=24)

rng = np.random.default_rng(3)
o = jnp.asarray(rng.uniform(-0.9, 0.9, (500, 3)).astype(np.float32))
d = rng.normal(size=(500, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
d = jnp.asarray(d)

lane = 472
t_b, id_b, _, _ = trace_triangles_brute(
    o, d, jnp.asarray(tri[:, 0]), jnp.asarray(tri[:, 1]),
    jnp.asarray(tri[:, 2]))
tb = float(t_b[lane]); ib = int(id_b[lane])
print(f"brute: t={tb:.6f} tri={ib}")

ol = np.asarray(o[lane]); dl = np.asarray(d[lane])
p = ol + tb * dl
org = np.asarray(ta.origin); vs = ta.voxel_size
nx, ny, nz = ta.dims
cell = np.floor((p - org) / vs).astype(int)
lin_hit = cell[0] + nx * (cell[1] + ny * cell[2])
print(f"hit point {p}, cell {cell}, lin {lin_hit}")
slot = int(ta.cell_slot[lin_hit])
print(f"cell_slot={slot}; tris in cell:",
      np.asarray(ta.cell_tris[slot]) if slot >= 0 else None)
# is the hit tri binned into the hit cell?
if slot >= 0:
    print("hit tri in cell list:", ib in set(np.asarray(ta.cell_tris[slot])))

# cell span of the hit cell for this ray
t0, t1 = _cell_span(jnp.int32(lin_hit), jnp.asarray(ol), jnp.asarray(dl),
                    jnp.asarray(org), ta.dims, jnp.float32(vs))
print(f"hit-cell span: t0={float(t0):.6f} t1={float(t1):.6f} (hit t={tb:.6f})")

# manual march for this lane: replicate _trace_tri_impl's sequence
print("\nmanual march (single lane):")
olj = jnp.asarray(ol)[None]; dlj = jnp.asarray(dl)[None]
t_cur = 1e-3
for step in range(12):
    tmn = jnp.asarray([t_cur], jnp.float32)
    tmx = jnp.asarray([1e30], jnp.float32)
    t_cell, lin = trace_grid_fast(olj, dlj, ta.brick, t_min=tmn,
                                  t_max=tmx, rounds=2, chunk=32, k_hits=8)
    tc = float(t_cell[0]); lc = int(lin[0])
    if not np.isfinite(tc):
        print(f"step {step}: t_cur={t_cur:.6f} -> NO CELL (miss)")
        break
    t0c, t1c = _cell_span(jnp.int32(lc), jnp.asarray(ol), jnp.asarray(dl),
                          jnp.asarray(org), ta.dims, jnp.float32(vs))
    t0c, t1c = float(t0c), float(t1c)
    cz_, cy_, cx_ = lc // (nx * ny), (lc // nx) % ny, lc % nx
    sl = int(ta.cell_slot[lc])
    tris = (set(int(x) for x in np.asarray(ta.cell_tris[sl])
                if int(x) >= 0) if sl >= 0 else set())
    print(f"step {step}: t_cur={t_cur:.6f} cell=({cx_},{cy_},{cz_}) "
          f"lin={lc} t_cell={tc:.6f} span=({t0c:.6f},{t1c:.6f}) "
          f"hit_tri_here={ib in tris} is_hit_cell={lc == lin_hit}")
    adv = max(t1c - max(1e-6 * abs(t1c), 1e-7), 0.5 * (t0c + t1c))
    t_cur = max(t_cur, adv)
