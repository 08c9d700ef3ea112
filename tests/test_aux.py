"""Auxiliary subsystems: checkpointing, tracing, CLI, camera paths."""
import json
import numpy as np
import pytest

from voxelray_tpu.io import meshes
from voxelray_tpu.models.grids import build_grid
from voxelray_tpu.render.camera import Camera, orbit_path
from voxelray_tpu.utils.checkpoint import load_grid, save_grid
from voxelray_tpu.utils.timing import Benchmarker
from voxelray_tpu.utils.trace import FrameStats, annotate, phase


@pytest.mark.parametrize("enc", ["bool", "aabbstruct", "vec", "octree"])
def test_checkpoint_roundtrip(enc, tmp_path):
    v, f = meshes.icosphere(1)
    g = build_grid(enc, v, f, 0.3)
    p = tmp_path / f"{enc}.npz"
    save_grid(str(p), g)
    g2 = load_grid(str(p))
    assert type(g2) is type(g)
    assert g2.dims == g.dims
    assert g2.set_calls == g.set_calls
    assert np.array_equal(np.asarray(g2.get_aabbs()),
                          np.asarray(g.get_aabbs()))


def test_checkpoint_rejects_garbage(tmp_path):
    p = tmp_path / "bad.npz"
    p.write_bytes(b"not an npz")
    with pytest.raises(Exception):
        load_grid(str(p))


def test_phase_timer_logs(caplog):
    import jax.numpy as jnp
    with phase("unit-test-phase") as h:
        h["x"] = jnp.ones(8) * 2
    assert h["seconds"] >= 0


def test_annotate_context():
    with annotate("region"):
        pass


def test_frame_stats():
    fs = FrameStats()
    fs.tick()
    fs.tick()
    fs.tick()
    assert fs.ms_per_frame >= 0
    assert "ms/frame" in fs.summary()


def test_benchmarker_render_metric():
    import jax.numpy as jnp
    b = Benchmarker(runs=2, warmup=0)
    res = b.measure_render(lambda: jnp.ones((8, 8, 4)), 8, 8)
    assert res.render_ms >= 0
    assert res.mrays_per_s > 0


def test_orbit_path_closes():
    cams = orbit_path(8, center=(0, 1, 0), radius=5.0)
    assert len(cams) == 8
    eyes = np.asarray([c.eye for c in cams])
    # all on the circle of radius 5 around the center (xz-plane)
    r = np.hypot(eyes[:, 0] - 0, eyes[:, 2] - 0)
    assert np.allclose(r, 5.0, atol=1e-5)
    assert all(c.center == (0, 1, 0) for c in cams)


def test_cli_end_to_end(tmp_path, capsys):
    from voxelray_tpu.cli import main
    out = tmp_path / "img.npy"
    rc = main(["sphere", "0.3", "--width", "48", "--height", "27",
               "--no-plane", "--backend", "dda", "--out", str(out)])
    assert rc == 0
    img = np.load(str(out))
    assert img.shape == (27, 48, 4)
    text = capsys.readouterr().out
    assert "Grid dimensions:" in text
    assert "Voxel build took" in text


def test_cli_octree_aov(tmp_path):
    from voxelray_tpu.cli import main
    out = tmp_path / "aov.npy"
    rc = main(["sphere", "0.3", "--width", "48", "--height", "27",
               "--no-plane", "--encoding", "octree", "--backend", "octree",
               "--aov", "--out", str(out)])
    assert rc == 0
    aov = np.load(str(out))
    assert aov.shape == (27, 48, 4)  # depth + normal
    finite = np.isfinite(aov[..., 0])
    assert finite.any()


def test_bench_adjudicate_hit_diffs():
    """bench.adjudicate_hit_diffs accepts fast==oracle, rejects wrong."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import adjudicate_hit_diffs

    # one occupied cell at (x=1, y=0, z=0) in a 4^3 grid, unit voxels
    occ = np.zeros((4, 4, 4), bool)
    occ[0, 0, 1] = True
    bb_min = np.zeros(3, np.float32)
    o = np.array([[1.5, 0.5, -2.0]], np.float32)   # straight at the cell
    d = np.array([[0.0, 0.0, 1.0]], np.float32)
    # oracle: slab entry at z=0 plane -> t = 2.0, cell lin = 1
    t_f = np.array([2.0], np.float32)
    lin_f = np.array([1], np.int32)
    t_d = np.array([np.inf], np.float32)           # dda "missed"
    lin_d = np.array([-1], np.int32)
    out = adjudicate_hit_diffs(o, d, occ, bb_min, 1.0, np.array([0]),
                               t_f, lin_f, t_d, lin_d)
    assert out["adjudication_ok"] and out["fast_matches_oracle"] == 1

    # fast reporting the wrong cell must NOT adjudicate
    out = adjudicate_hit_diffs(o, d, occ, bb_min, 1.0, np.array([0]),
                               t_f, np.array([2], np.int32), t_d, lin_d)
    assert not out["adjudication_ok"]

    # fast missing while the oracle hits must NOT adjudicate
    out = adjudicate_hit_diffs(o, d, occ, bb_min, 1.0, np.array([0]),
                               np.array([np.inf], np.float32),
                               np.array([-1], np.int32), t_d, lin_d)
    assert not out["adjudication_ok"]

    # sub-ulp tangent flip: fast skips a sliver cell the oracle counts
    # and reports the next occupied cell at a t within the 2e-6 envelope
    # — accepted as fast_within_envelope (measured class, 2026-08-18:
    # corner-grazing rays with t1-t0 < 1 ulp flip per FMA contraction).
    # Construction: the ray clips cell A's y=1 corner at z=0 (interval
    # width ~5e-7) then properly enters cell C above it ~2.4e-7 rel
    # later; fast reports C with C's own oracle-slab t.
    occ2 = np.zeros((4, 4, 4), bool)
    occ2[0, 0, 1] = True        # A lin 1: sliver (oracle nearest)
    occ2[0, 1, 1] = True        # C lin 5: the cell fast lands in
    y0 = np.float32(0.5) - np.float32(2.0) ** -23
    o2 = np.array([[1.5, y0, -2.0]], np.float32)
    d2 = (np.array([[0.0, 0.25, 1.0]], np.float32)
          / np.float32(np.sqrt(0.25 ** 2 + 1.0)))
    # oracle slab t's in the adjudicator's own f32 math
    inv = np.float32(1.0) / d2[0]
    tC0 = np.float32((np.float32(1.0) - o2[0, 1]) * inv[1])  # y=1 entry
    tA0 = np.float32((np.float32(0.0) - o2[0, 2]) * inv[2])  # z=0 entry
    assert 0 < (tC0 - tA0) / tA0 < 2e-6          # inside the envelope
    out = adjudicate_hit_diffs(o2, d2, occ2, bb_min, 1.0, np.array([0]),
                               np.array([tC0], np.float32),
                               np.array([5], np.int32),
                               np.array([tA0], np.float32),
                               np.array([1], np.int32))
    assert out["adjudication_ok"], out
    assert out["fast_within_envelope"] == 1 and \
        out["fast_matches_oracle"] == 0

    # ...but a flip to a cell whose t is OUTSIDE the envelope of the
    # oracle's nearest must reject (real geometry skipped)
    occ3 = np.zeros((4, 4, 4), bool)
    occ3[0, 0, 1] = True        # lin 1 at t=2*norm
    occ3[1, 0, 1] = True        # lin 17 one voxel later (t=3*norm)
    o3 = np.array([[1.5, 0.5, -2.0]], np.float32)
    d3 = np.array([[0.0, 0.0, 1.0]], np.float32)
    out = adjudicate_hit_diffs(o3, d3, occ3, bb_min, 1.0, np.array([0]),
                               np.array([3.0], np.float32),
                               np.array([17], np.int32),
                               np.array([2.0], np.float32),
                               np.array([1], np.int32))
    assert not out["adjudication_ok"]
