"""Brick-accelerated traversal vs the plain DDA (CPU interpret mode)."""
import jax.numpy as jnp
import numpy as np
import pytest

from voxelray_tpu.io import meshes
from voxelray_tpu.models.grids import GridBool
from voxelray_tpu.ops.intersect import make_camera_rays
from voxelray_tpu.ops.traverse import trace_grid_dda
from voxelray_tpu.ops.traverse_fast import (BRICK, build_accel,
                                            trace_grid_fast)
from voxelray_tpu.render.camera import Camera


@pytest.fixture(scope="module")
def setup():
    v, f = meshes.bunny_like(2)
    grid = GridBool.from_mesh(v, f, 0.11)
    occ = grid.occupancy()
    accel = build_accel(occ, grid.origin, grid.voxel_size)
    return grid, occ, accel


def test_accel_structure(setup):
    grid, occ, accel = setup
    nx, ny, nz = grid.dims
    assert accel.bdims == (-(-nx // BRICK), -(-ny // BRICK),
                           -(-nz // BRICK))
    # brick bits reproduce a max-pool of the occupancy
    occ_np = np.asarray(occ).astype(bool)
    bx, by, bz = accel.bdims
    pad = np.zeros((bz * BRICK, by * BRICK, bx * BRICK), bool)
    pad[:occ_np.shape[0], :occ_np.shape[1], :occ_np.shape[2]] = occ_np
    pooled = pad.reshape(bz, BRICK, by, BRICK, bx, BRICK) \
        .any(axis=(1, 3, 5))
    words = np.asarray(accel.coarse).reshape(-1)
    n_bricks = bx * by * bz
    bits = (words[np.arange(n_bricks) >> 5] >> (np.arange(n_bricks) & 31)) & 1
    assert np.array_equal(bits.astype(bool), pooled.reshape(-1))
    # fine words reproduce per-brick cell bits (stored word-major)
    assert accel.fine.shape == (16, n_bricks)


def test_fast_matches_dda_camera_rays(setup):
    grid, occ, accel = setup
    W, H = 96, 54
    _, _, vi, pi = Camera().matrices(W, H)
    o, d = make_camera_rays(W, H, vi, pi)
    t_d, lin_d = trace_grid_dda(
        o, d, jnp.asarray(np.asarray(occ).reshape(-1)), grid.origin,
        dims=grid.dims, voxel_size_static=grid.voxel_size)
    t_f, lin_f = trace_grid_fast(o, d, accel, chunk=8)
    hd = np.isfinite(np.asarray(t_d))
    hf = np.isfinite(np.asarray(t_f))
    assert np.array_equal(hd, hf)
    assert np.array_equal(np.asarray(lin_d)[hd], np.asarray(lin_f)[hf])
    assert np.allclose(np.asarray(t_d)[hd], np.asarray(t_f)[hf],
                       rtol=2e-6, atol=0)


def test_fast_random_rays_and_tmax(setup):
    grid, occ, accel = setup
    rng = np.random.default_rng(5)
    n = 512
    o = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.asarray(rng.uniform(0.5, 20.0, n).astype(np.float32))
    t_d, lin_d = trace_grid_dda(
        o, d, jnp.asarray(np.asarray(occ).reshape(-1)), grid.origin,
        dims=grid.dims, voxel_size_static=grid.voxel_size, t_max=tmax)
    t_f, lin_f = trace_grid_fast(o, d, accel, t_max=tmax, chunk=8)
    hd = np.isfinite(np.asarray(t_d))
    hf = np.isfinite(np.asarray(t_f))
    assert np.array_equal(hd, hf)
    assert np.array_equal(np.asarray(lin_d)[hd], np.asarray(lin_f)[hf])


def test_fast_rays_starting_inside(setup):
    grid, occ, accel = setup
    # rays starting inside the grid bounds
    center = np.asarray(grid.origin) + 0.5 * grid.voxel_size * np.asarray(
        grid.dims)
    o = jnp.asarray(np.tile(center.astype(np.float32), (64, 1)))
    rng = np.random.default_rng(7)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    t_d, lin_d = trace_grid_dda(
        o, d, jnp.asarray(np.asarray(occ).reshape(-1)), grid.origin,
        dims=grid.dims, voxel_size_static=grid.voxel_size)
    t_f, lin_f = trace_grid_fast(o, d, accel, chunk=8)
    assert np.array_equal(np.isfinite(np.asarray(t_d)),
                          np.isfinite(np.asarray(t_f)))


def test_fast_dense_scene_overflow_rewind():
    """A solid block makes ~every ray carry candidate bricks, forcing the
    fine-buffer overflow path: overflow rays must rewind and resolve in a
    later round, never drop (round-2 compaction machinery)."""
    occ = np.ones((24, 24, 24), np.uint8)
    accel = build_accel(occ, np.zeros(3, np.float32), 0.1)
    W, H = 64, 48
    # face-on close-up: the block face fills most of the frame
    cam = Camera(eye=(1.2, 1.2, -1.6), center=(1.2, 1.2, 1.2))
    _, _, vi, pi = cam.matrices(W, H)
    o, d = make_camera_rays(W, H, vi, pi)
    t_d, lin_d = trace_grid_dda(
        o, d, jnp.asarray(occ.reshape(-1)), jnp.zeros(3, jnp.float32),
        dims=(24, 24, 24), voxel_size_static=0.1)
    t_f, lin_f = trace_grid_fast(o, d, accel, chunk=8)
    hd = np.isfinite(np.asarray(t_d))
    hf = np.isfinite(np.asarray(t_f))
    assert hd.mean() > 0.5  # the block really covers most of the frame
    assert np.array_equal(hd, hf)
    assert np.array_equal(np.asarray(lin_d)[hd], np.asarray(lin_f)[hf])
    assert np.allclose(np.asarray(t_d)[hd], np.asarray(t_f)[hd],
                       rtol=2e-6, atol=0)


def test_fast_admit_mask(setup):
    """admit=False rays must return miss; admitted rays must match the
    unmasked trace exactly (the shadow-compaction entry point)."""
    grid, occ, accel = setup
    W, H = 64, 36
    _, _, vi, pi = Camera().matrices(W, H)
    o, d = make_camera_rays(W, H, vi, pi)
    rng = np.random.default_rng(11)
    admit = jnp.asarray(rng.random((H, W)) < 0.3)
    t_all, lin_all = trace_grid_fast(o, d, accel, chunk=8)
    t_m, lin_m = trace_grid_fast(o, d, accel, chunk=8, admit=admit)
    a = np.asarray(admit)
    assert not np.isfinite(np.asarray(t_m)[~a]).any()
    assert np.array_equal(np.asarray(lin_m)[a], np.asarray(lin_all)[a])
    assert np.array_equal(np.isfinite(np.asarray(t_m))[a],
                          np.isfinite(np.asarray(t_all))[a])


def test_any_hit_matches_trace(setup):
    grid, occ, accel = setup
    from voxelray_tpu.ops.traverse_fast import any_hit_grid_fast
    W, H = 64, 36
    _, _, vi, pi = Camera().matrices(W, H)
    o, d = make_camera_rays(W, H, vi, pi)
    t, _ = trace_grid_fast(o, d, accel, chunk=8)
    occl = any_hit_grid_fast(o, d, accel, chunk=8)
    assert np.array_equal(np.asarray(occl),
                          np.isfinite(np.asarray(t)))


def test_two_level_walk_matches_single_level(setup):
    """The superbrick (L2) walk must reproduce the single-level walk's
    results exactly — conservative skips may waste steps but can never
    change which brick accepts first."""
    grid, occ, accel = setup
    W, H = 96, 54
    _, _, vi, pi = Camera().matrices(W, H)
    o, d = make_camera_rays(W, H, vi, pi)
    t_1, lin_1 = trace_grid_fast(o, d, accel, chunk=8, two_level=False)
    t_2, lin_2 = trace_grid_fast(o, d, accel, chunk=8, two_level=True)
    assert np.array_equal(np.asarray(lin_1), np.asarray(lin_2))
    h = np.isfinite(np.asarray(t_1))
    assert np.array_equal(h, np.isfinite(np.asarray(t_2)))
    assert np.array_equal(np.asarray(t_1)[h], np.asarray(t_2)[h])


def test_two_level_walk_random_rays(setup):
    grid, occ, accel = setup
    rng = np.random.default_rng(13)
    n = 512
    o = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.asarray(rng.uniform(0.5, 20.0, n).astype(np.float32))
    t_1, lin_1 = trace_grid_fast(o, d, accel, t_max=tmax, chunk=8,
                                 two_level=False)
    t_2, lin_2 = trace_grid_fast(o, d, accel, t_max=tmax, chunk=8,
                                 two_level=True)
    assert np.array_equal(np.asarray(lin_1), np.asarray(lin_2))


@pytest.mark.parametrize("kv", [
    dict(fine="walk1"),          # round-1 per-slot fine structure
    dict(fine="dense"),
    dict(resident_frac=1),       # no straggler compaction
    dict(fine_frac=1),           # no candidate compaction
    dict(rounds=3),
    dict(k_hits=2),
    dict(drain_k=2),             # deep drain reliance
    dict(drain_frac=8),
    dict(self_admit=True, admit_frac=4, fine_frac=(2,)),
    # admit cap far below the active population: overflow -> drain
    dict(self_admit=True, admit_frac=64, fine_frac=(1,)),
])
def test_structural_knobs_same_result(setup, kv):
    """Every structural/perf knob of trace_grid_fast is result-invariant:
    compaction, slot fusion, round count and queue depth change cost,
    never the (t, cell) contract."""
    grid, occ, accel = setup
    W, H = 96, 54
    _, _, vi, pi = Camera().matrices(W, H)
    o, d = make_camera_rays(W, H, vi, pi)
    t_r, lin_r = trace_grid_fast(o, d, accel, chunk=8)
    t_k, lin_k = trace_grid_fast(o, d, accel, chunk=8, **kv)
    h = np.isfinite(np.asarray(t_r))
    assert np.array_equal(h, np.isfinite(np.asarray(t_k)))
    assert np.array_equal(np.asarray(lin_r)[h], np.asarray(lin_k)[h])
    # t: the dense resolve shares formulas but not XLA fusion shapes with
    # the walk kernel -> ulp-level drift (the documented 2e-6 contract)
    assert np.allclose(np.asarray(t_r)[h], np.asarray(t_k)[h],
                       rtol=2e-6, atol=0)


def test_any_hit_dense_admit_no_overflow_loss():
    """Regression: shadow-style any-hit where ~every admitted ray has an
    immediate candidate brick.  A primary-ray-sized fine buffer
    (fine_frac=8) overflows every round here and silently dropped 15% of
    occlusions on chip; any_hit_grid_fast pins fine_frac=1."""
    from voxelray_tpu.ops.traverse_fast import any_hit_grid_fast
    occ = np.ones((24, 24, 24), np.uint8)
    accel = build_accel(occ, np.zeros(3, np.float32), 0.1)
    W, H = 64, 48
    cam = Camera(eye=(1.2, 1.2, -1.6), center=(1.2, 1.2, 1.2))
    _, _, vi, pi = cam.matrices(W, H)
    o, d = make_camera_rays(W, H, vi, pi)
    rng = np.random.default_rng(3)
    admit = jnp.asarray(rng.random((H, W)) < 0.9)  # ~all rays admitted
    t_ref, _ = trace_grid_fast(o, d, accel, chunk=8)
    occl = any_hit_grid_fast(o, d, accel, chunk=8, admit=admit)
    a = np.asarray(admit)
    assert np.array_equal(np.asarray(occl)[a],
                          np.isfinite(np.asarray(t_ref))[a])
    assert not np.asarray(occl)[~a].any()


def test_last_round_fine_overflow_has_no_silent_miss():
    """Regression (ADVICE r2 item 2): the FINAL round's fine buffer is
    forced full-width regardless of the fine_frac knob — rounds=1 with a
    narrow fine_frac on a dense-candidate scene (camera facing a solid
    block) must still find every hit, because last-round overflow has no
    retry round to rewind into."""
    occ = np.ones((24, 24, 24), np.uint8)
    accel = build_accel(occ, np.zeros(3, np.float32), 0.1)
    W, H = 64, 48
    cam = Camera(eye=(1.2, 1.2, -1.6), center=(1.2, 1.2, 1.2))
    _, _, vi, pi = cam.matrices(W, H)
    o, d = make_camera_rays(W, H, vi, pi)
    t_d, lin_d = trace_grid_dda(
        o, d, jnp.asarray(occ.reshape(-1)), jnp.zeros(3, jnp.float32),
        dims=(24, 24, 24), voxel_size_static=0.1)
    hd = np.isfinite(np.asarray(t_d))
    assert hd.mean() > 0.5
    # drain on (default): overflow rewinds into the drain, stays exact
    t_f, lin_f = trace_grid_fast(o, d, accel, chunk=8, rounds=1,
                                 fine_frac=8)
    assert np.array_equal(hd, np.isfinite(np.asarray(t_f)))
    assert np.array_equal(np.asarray(lin_d)[hd], np.asarray(lin_f)[hd])
    # drain OFF: the ff-forcing branch itself is the safety net — the
    # final round must run full-width regardless of the fine_frac knob
    t_n, lin_n = trace_grid_fast(o, d, accel, chunk=8, rounds=1,
                                 fine_frac=8, drain=False)
    assert np.array_equal(hd, np.isfinite(np.asarray(t_n)))
    assert np.array_equal(np.asarray(lin_d)[hd], np.asarray(lin_n)[hd])


def test_drain_makes_trace_exhaustive():
    """The drain loop (round 3) removes the k_hits x rounds coverage
    bound: with rounds=1, k_hits=2 on a scene where rays cross many
    occupied-but-not-accepting bricks, the fast trace must still match
    the exhaustive dda exactly and report unresolved == 0."""
    rng = np.random.default_rng(7)
    occ = np.zeros((64, 64, 64), np.uint8)
    # one corner voxel per 8^3 brick: every brick is "occupied" but most
    # rays cross it without an accepted cell -> long candidate chains
    occ[::8, ::8, ::8] = 1
    # plus a back wall (far z) so rays hit only AFTER crossing ~7
    # occupied-but-empty bricks -- past the k_hits x rounds coverage
    occ[60, :, :] = (rng.random((64, 64)) < 0.5)
    accel = build_accel(occ, np.zeros(3, np.float32), 0.1)
    W, H = 48, 32
    cam = Camera(eye=(3.2, 3.4, -2.5), center=(3.2, 3.2, 3.2))
    _, _, vi, pi = cam.matrices(W, H)
    o, d = make_camera_rays(W, H, vi, pi)
    t_d, lin_d = trace_grid_dda(
        o, d, jnp.asarray(occ.reshape(-1)),
        jnp.zeros(3, jnp.float32), dims=(64, 64, 64),
        voxel_size_static=0.1)
    t_f, lin_f, unresolved = trace_grid_fast(
        o, d, accel, chunk=8, rounds=1, k_hits=2, return_stats=True)
    hd = np.isfinite(np.asarray(t_d))
    hf = np.isfinite(np.asarray(t_f))
    assert int(unresolved) == 0
    assert np.array_equal(hd, hf)
    assert np.array_equal(np.asarray(lin_d)[hd], np.asarray(lin_f)[hd])
    assert np.allclose(np.asarray(t_d)[hd], np.asarray(t_f)[hd],
                       rtol=2e-6, atol=0)
    # without the drain the same config drops hits (the round-2 bound)
    t_n, _ = trace_grid_fast(o, d, accel, chunk=8, rounds=1, k_hits=2,
                             drain=False)
    assert np.isfinite(np.asarray(t_n)).sum() < hd.sum()
