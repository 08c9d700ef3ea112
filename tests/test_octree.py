"""Octree build vs a direct recursive transcription of the reference."""
import numpy as np
import pytest

from voxelray_tpu.io import meshes
from voxelray_tpu.models.octree import INVALID_INDEX, Octree, build_nodes
from voxelray_tpu.oracle import oracle_voxelize


def ref_build_nodes(codes, max_depth, max_items):
    """Recursive oracle mirroring buildNodeRecursive (octTree.hpp:319-358)."""
    nodes = []

    def rec(begin, end, depth):
        idx = len(nodes)
        nodes.append([int(INVALID_INDEX)] * 8 + [begin, end - begin])
        if depth >= max_depth or (end - begin) <= max_items:
            return idx
        shift = 3 * (max_depth - 1 - depth)
        cur = begin
        for child in range(8):
            if cur >= end:
                break
            child_begin = cur
            while cur < end and ((int(codes[cur]) >> shift) & 7) == child:
                cur += 1
            if child_begin == cur:
                continue
            nodes[idx][child] = rec(child_begin, cur, depth + 1)
        return idx

    if len(codes) or max_depth:
        rec(0, len(codes), 0)
    return np.asarray(nodes, dtype=np.int64).reshape(-1, 10)


@pytest.mark.parametrize("seed,n,depth,max_items", [
    (0, 100, 3, 4), (1, 1000, 5, 16), (2, 37, 2, 1), (3, 5000, 7, 16),
    (4, 16, 4, 16),  # all fits in root
])
def test_build_nodes_matches_recursive_reference(seed, n, depth, max_items):
    rng = np.random.default_rng(seed)
    codes = np.sort(rng.integers(0, 1 << (3 * depth), size=n,
                                 dtype=np.uint64))
    got = build_nodes(codes, depth, max_items)
    want = ref_build_nodes(codes, depth, max_items)
    assert got.shape == want.shape
    assert np.array_equal(got, want)


def test_build_nodes_with_duplicates():
    codes = np.sort(np.array([5, 5, 5, 5, 5, 9, 9, 63, 63, 63],
                             dtype=np.uint64))
    got = build_nodes(codes, 2, 2)
    want = ref_build_nodes(codes, 2, 2)
    assert np.array_equal(got, want)


@pytest.fixture(scope="module")
def sphere_tree():
    v, f = meshes.icosphere(2)
    vs = 0.12
    return v, f, vs, Octree.from_mesh(v, f, vs), oracle_voxelize(v, f, vs)


def test_octree_occupancy_matches_oracle(sphere_tree):
    v, f, vs, tree, ref = sphere_tree
    assert np.array_equal(np.asarray(tree.occupancy()).astype(bool),
                          ref.occupancy)
    assert tree.set_calls == ref.set_calls


def test_octree_items_are_per_hit_with_duplicates(sphere_tree):
    _, _, _, tree, ref = sphere_tree
    # one Morton item per SAT hit (octTree.hpp:769-771), sorted
    assert tree.n_items == ref.set_calls
    codes = tree.codes_u64()
    assert np.all(codes[:-1] <= codes[1:])


def test_octree_aabbs_sorted_order(sphere_tree):
    _, _, vs, tree, ref = sphere_tree
    boxes = np.asarray(tree.get_aabbs())
    assert boxes.shape == (tree.n_items, 6)
    # center back-computation must land in occupied cells
    centers = boxes[:, :3] + vs * 0.5
    mn = np.asarray(tree.root_min)
    idx = ((centers - mn) / vs).astype(np.int64)
    nx, ny, nz = tree.dims
    occ = ref.occupancy
    assert occ[idx[:, 2], idx[:, 1], idx[:, 0]].all()


def test_octree_root_bounds_pow2_cube(sphere_tree):
    _, _, vs, tree, _ = sphere_tree
    mn, mx = tree.root_bounds
    extent = (mx - mn)
    assert np.allclose(extent, vs * (1 << tree.bits_per_axis))
    assert tree.bits_per_axis == int(np.ceil(np.log2(max(tree.dims))))


def test_octree_node_structure(sphere_tree):
    _, _, _, tree, _ = sphere_tree
    children = np.asarray(tree.children)
    start = np.asarray(tree.node_start)
    count = np.asarray(tree.node_count)
    # root covers all items
    assert start[0] == 0 and count[0] == tree.n_items
    # every internal node's children partition its range
    for i in range(min(50, tree.n_nodes)):
        ch = children[i][children[i] >= 0]
        if len(ch):
            assert count[ch].sum() == count[i]
            assert start[ch].min() == start[i]
    # leaves satisfy the leaf criterion
    is_leaf = (children < 0).all(axis=1)
    assert (count[is_leaf] <= tree.max_items).sum() >= 1


def test_octree_21bit_limit():
    v = np.array([[0, 0, 0], [1e7, 1, 1], [0, 1, 1]], dtype=np.float32)
    f = np.array([[0, 1, 2]])
    with pytest.raises(ValueError, match="21 bits"):
        Octree.from_mesh(v, f, 1.0)


def test_octree_memory_accounting(sphere_tree):
    _, _, _, tree, _ = sphere_tree
    assert tree.memory_usage_bytes() == tree.n_items * 8 + tree.n_nodes * 40


def test_device_sort_path_bit_identical():
    """from_mesh(sort_device=True) — the on-device lax.sort limb path —
    must produce exactly the host/native build."""
    v, f = meshes.icosphere(1)
    a = Octree.from_mesh(v, f, 0.25, sort_device=False)
    b = Octree.from_mesh(v, f, 0.25, sort_device=True)
    assert np.array_equal(a.codes_u64(), b.codes_u64())
    assert np.array_equal(np.asarray(a.children), np.asarray(b.children))
    assert np.array_equal(np.asarray(a.node_start),
                          np.asarray(b.node_start))
    assert np.array_equal(np.asarray(a.node_count),
                          np.asarray(b.node_count))
    assert a.set_calls == b.set_calls


def test_sort_codes_device_order_and_sentinel():
    from voxelray_tpu.ops.morton import sort_codes_device

    rng = np.random.default_rng(7)
    hi = rng.integers(0, 1 << 31, size=257, dtype=np.uint32)
    lo = rng.integers(0, 1 << 32, size=257, dtype=np.uint32)
    hi[10] = hi[20] = np.uint32(0xFFFFFFFF)  # sentinels
    lo[10] = lo[20] = np.uint32(0xFFFFFFFF)
    hs, ls = sort_codes_device(hi, lo)
    got = (np.asarray(hs).astype(np.uint64) << np.uint64(32)) \
        | np.asarray(ls).astype(np.uint64)
    want = np.sort((hi.astype(np.uint64) << np.uint64(32))
                   | lo.astype(np.uint64))
    assert np.array_equal(got, want)
    assert got[-1] == np.uint64(0xFFFFFFFFFFFFFFFF)
