"""SvoSpace property tests: interning, refcounts, get/set roundtrip,
structural sharing, serialization (behavioral spec: svo.rs)."""

import numpy as np

from voxtracer.world.svo import EMPTY, SvoSpace, from_dense


def build_random_space(rng, n=16, fill=0.1):
    solid = rng.random((n, n, n)) < fill
    rgb = rng.random((n, n, n, 3)).astype(np.float32)
    rgb[~solid] = 0
    return from_dense(solid, rgb), solid, rgb


def test_get_set_roundtrip(rng):
    space, solid, rgb = build_random_space(rng)
    n = solid.shape[0]
    for _ in range(300):
        p = tuple(rng.integers(0, n, 3))
        got = space.get(p)
        if solid[p]:
            assert got is not None and np.allclose(got, rgb[p])
        else:
            assert got is None


def test_set_then_get(rng):
    space, solid, rgb = build_random_space(rng)
    n = solid.shape[0]
    for _ in range(100):
        p = tuple(int(v) for v in rng.integers(0, n, 3))
        if rng.random() < 0.5:
            c = tuple(np.float32(v) for v in rng.random(3))
            space.set(p, c)
            assert np.allclose(space.get(p), c)
        else:
            space.set(p, None)
            assert space.get(p) is None


def test_set_noop_preserves_root(rng):
    space, solid, rgb = build_random_space(rng)
    n = solid.shape[0]
    root = space.root
    p = tuple(np.argwhere(solid)[0])
    space.set(p, tuple(rgb[p]))  # same value: no-op (svo.rs:116-122)
    assert space.root == root
    q = tuple(np.argwhere(~solid)[0])
    space.set(q, None)  # clearing empty: no-op (svo.rs:123-125)
    assert space.root == root


def test_set_and_revert_restores_interned_root(rng):
    """Path-copy + hash-consing: undoing an edit re-interns the original
    subtree, so the root returns to its old id and no nodes leak."""
    space, solid, rgb = build_random_space(rng)
    p = tuple(np.argwhere(~solid)[0])
    root0 = space.root
    nodes0 = space.num_nodes()
    space.set(p, (1.0, 1.0, 1.0))
    assert space.root != root0
    space.set(p, None)
    assert space.root == root0
    assert space.num_nodes() == nodes0


def test_structural_sharing_solid_cube():
    """A fully solid world must be O(height) nodes (DAG sharing,
    worldgen.rs:67-72 behavior)."""
    n = 16
    solid = np.ones((n, n, n), bool)
    rgb = np.full((n, n, n, 3), 0.5, np.float32)
    space = from_dense(solid, rgb)
    assert space.height() == 4
    assert space.num_nodes() == 5  # 1 leaf + 4 levels of children-of-same


def test_empty_world():
    space = SvoSpace()
    assert space.root is None and space.height() == 0
    dev = space.serialize()
    assert dev.root == EMPTY


def test_serialize_table_structure(rng):
    space, solid, rgb = build_random_space(rng, n=8)
    dev = space.serialize()
    assert dev.table.dtype == np.uint32
    assert dev.table.shape == (space.capacity(), 8)
    assert dev.root != EMPTY
    # root slot row must reference valid slots or EMPTY
    row = dev.table[dev.root]
    for c in row:
        assert c == EMPTY or c < space.capacity()


def test_refcount_gc(rng):
    """Clearing every voxel empties the tree and frees all nodes."""
    space, solid, rgb = build_random_space(rng, n=8, fill=0.05)
    n = 8
    for p in np.argwhere(solid):
        space.set(tuple(p), None)
    assert space.root is None
    assert space.num_nodes() == 0


def test_deep_edit_in_large_world():
    space = SvoSpace()
    # manually grow an empty world of height 5 by setting one voxel
    solid = np.zeros((32, 32, 32), bool)
    solid[1, 2, 3] = True
    rgb = np.zeros((32, 32, 32, 3), np.float32)
    rgb[1, 2, 3] = (0.25, 0.5, 0.75)
    space = from_dense(solid, rgb)
    assert space.height() == 5
    assert np.allclose(space.get((1, 2, 3)), (0.25, 0.5, 0.75))
    space.set((31, 31, 31), (1.0, 1.0, 1.0))
    assert np.allclose(space.get((31, 31, 31)), (1.0, 1.0, 1.0))
    assert np.allclose(space.get((1, 2, 3)), (0.25, 0.5, 0.75))


def test_node_accessors(rng):
    space, solid, rgb = build_random_space(rng, n=8)
    root = space.root_node()
    assert root is not None
    kind, payload = space.get_node(root)
    assert kind == "children"
    assert space.unwrap_children(root) == payload
    kinds = {k for _, (k, _) in space.nodes()}
    assert kinds == {"block", "children"}
    assert sum(1 for _ in space.nodes()) == space.num_nodes()


def test_set_out_of_bounds_rejected(rng):
    """Out-of-range coordinates must raise, not alias onto in-range voxels
    (e.g. y = 2^height descends the all-high path)."""
    import pytest

    n = 16
    solid = np.zeros((n, n, n), bool)
    solid[:, 0, :] = True
    rgb = np.zeros((n, n, n, 3), np.float32)
    rgb[solid] = 0.5
    space = from_dense(solid, rgb)
    for p in [(0, n, 0), (-1, 0, 0), (n, n - 1, n - 1), (0, 0, 2 * n)]:
        with pytest.raises(AssertionError):
            space.set(p, (1.0, 1.0, 1.0))
    # in-range corner still fine
    space.set((n - 1, n - 1, n - 1), (1.0, 1.0, 1.0))
    assert space.get((n - 1, n - 1, n - 1)) == (1.0, 1.0, 1.0)
