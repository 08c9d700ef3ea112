"""Morton encode/decode: device limbs vs numpy uint64 ground truth."""
import jax.numpy as jnp
import numpy as np

from voxelray_tpu.ops.morton import (morton_decode3, morton_decode3_np,
                                     morton_encode3, morton_encode3_np)


def _ref_interleave(x, y, z):
    """Bit-by-bit interleave oracle (slow, obviously correct)."""
    out = 0
    for k in range(21):
        out |= ((x >> k) & 1) << (3 * k)
        out |= ((y >> k) & 1) << (3 * k + 1)
        out |= ((z >> k) & 1) << (3 * k + 2)
    return out


def test_np_encode_matches_bitwise_oracle():
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 1 << 21, size=64, dtype=np.uint64)
    ys = rng.integers(0, 1 << 21, size=64, dtype=np.uint64)
    zs = rng.integers(0, 1 << 21, size=64, dtype=np.uint64)
    got = morton_encode3_np(xs, ys, zs)
    want = np.array([_ref_interleave(int(x), int(y), int(z))
                     for x, y, z in zip(xs, ys, zs)], dtype=np.uint64)
    assert np.array_equal(got, want)


def test_np_roundtrip():
    rng = np.random.default_rng(8)
    xs = rng.integers(0, 1 << 21, size=256, dtype=np.uint64)
    ys = rng.integers(0, 1 << 21, size=256, dtype=np.uint64)
    zs = rng.integers(0, 1 << 21, size=256, dtype=np.uint64)
    x2, y2, z2 = morton_decode3_np(morton_encode3_np(xs, ys, zs))
    assert np.array_equal(x2, xs) and np.array_equal(y2, ys) \
        and np.array_equal(z2, zs)


def test_device_limbs_match_np():
    rng = np.random.default_rng(9)
    xs = rng.integers(0, 1 << 21, size=512, dtype=np.uint32)
    ys = rng.integers(0, 1 << 21, size=512, dtype=np.uint32)
    zs = rng.integers(0, 1 << 21, size=512, dtype=np.uint32)
    hi, lo = morton_encode3(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs))
    code = morton_encode3_np(xs.astype(np.uint64), ys.astype(np.uint64),
                             zs.astype(np.uint64))
    assert np.array_equal(np.asarray(hi, np.uint64),
                          code >> np.uint64(32))
    assert np.array_equal(np.asarray(lo, np.uint64),
                          code & np.uint64(0xFFFFFFFF))
    x2, y2, z2 = morton_decode3(hi, lo)
    assert np.array_equal(np.asarray(x2), xs)
    assert np.array_equal(np.asarray(y2), ys)
    assert np.array_equal(np.asarray(z2), zs)


def test_morton_order_is_octant_order():
    # sorting by morton groups cells by octant hierarchy: low 3 bits cycle x
    codes = morton_encode3_np(
        np.array([0, 1, 0, 0], np.uint64), np.array([0, 0, 1, 0], np.uint64),
        np.array([0, 0, 0, 1], np.uint64))
    assert codes.tolist() == [0, 1, 2, 4]
