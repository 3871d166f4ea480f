"""Traversal parity: svo_raycast vs dense_raycast on identical geometry,
plus semantic edge cases (mirroring, distance caps, t==0 skip)."""

import numpy as np
import jax.numpy as jnp

from voxtracer.kernels.traverse import dense_raycast, leaf_rgb, svo_raycast
from voxtracer.world.svo import from_dense


def device_table(space):
    dev = space.serialize()
    return jnp.asarray(dev.table.view(np.int32)), np.int32(dev.root), dev.height


def random_world(rng, n=16, fill=0.08):
    solid = rng.random((n, n, n)) < fill
    rgb = rng.random((n, n, n, 3)).astype(np.float32)
    rgb[~solid] = 0
    return solid, rgb, from_dense(solid, rgb)


def random_rays(rng, b, n):
    start = rng.random((b, 3)).astype(np.float32) * (n * 3) - n
    d = rng.normal(size=(b, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(start), jnp.asarray(d)


def test_svo_matches_dense(rng):
    n = 16
    solid, rgb, space = random_world(rng, n)
    table, root, height = device_table(space)
    start, d = random_rays(rng, 2048, n)

    rs = svo_raycast(table, root, height, start, d, skip_t0=False)
    rd = dense_raycast(jnp.asarray(solid), start, d, n)

    assert np.array_equal(np.asarray(rs["hit"]), np.asarray(rd["hit"]))
    both = np.asarray(rs["hit"])
    assert np.allclose(
        np.asarray(rs["t"])[both], np.asarray(rd["t"])[both], atol=1e-3
    )
    assert np.array_equal(
        np.asarray(rs["voxel"])[both], np.asarray(rd["voxel"])[both]
    )
    assert np.array_equal(
        np.asarray(rs["normal"])[both], np.asarray(rd["normal"])[both]
    )
    cols = np.asarray(leaf_rgb(table, rs["node"]))[both]
    vox = np.asarray(rd["voxel"])[both]
    assert np.allclose(cols, rgb[tuple(vox.T)], atol=1e-6)


def test_axis_aligned_hit():
    n = 8
    solid = np.zeros((n, n, n), bool)
    solid[2, 2, 2] = True
    rgb = np.zeros((n, n, n, 3), np.float32)
    rgb[2, 2, 2] = (1.0, 0.5, 0.25)
    space = from_dense(solid, rgb)
    table, root, height = device_table(space)

    # from each of the 6 directions
    cases = [
        ([-1.0, 2.5, 2.5], [1, 0, 0], 3.0, [-1, 0, 0]),
        ([9.0, 2.5, 2.5], [-1, 0, 0], 6.0, [1, 0, 0]),
        ([2.5, -1.0, 2.5], [0, 1, 0], 3.0, [0, -1, 0]),
        ([2.5, 9.0, 2.5], [0, -1, 0], 6.0, [0, 1, 0]),
        ([2.5, 2.5, -1.0], [0, 0, 1], 3.0, [0, 0, -1]),
        ([2.5, 2.5, 9.0], [0, 0, -1], 6.0, [0, 0, 1]),
    ]
    start = jnp.asarray([c[0] for c in cases], jnp.float32)
    d = jnp.asarray([c[1] for c in cases], jnp.float32)
    r = svo_raycast(table, root, height, start, d)
    assert np.asarray(r["hit"]).all()
    assert np.allclose(np.asarray(r["t"]), [c[2] for c in cases], atol=1e-5)
    assert np.array_equal(np.asarray(r["normal"]), [c[3] for c in cases])
    assert (np.asarray(r["voxel"]) == [2, 2, 2]).all()


def test_distance_cap():
    n = 8
    solid = np.zeros((n, n, n), bool)
    solid[4, 4, 4] = True
    rgb = np.zeros((n, n, n, 3), np.float32)
    space = from_dense(solid, rgb)
    table, root, height = device_table(space)
    start = jnp.asarray([[-1.0, 4.5, 4.5]] * 2, jnp.float32)
    d = jnp.asarray([[1.0, 0, 0]] * 2, jnp.float32)
    dist = jnp.asarray([3.0, 100.0], jnp.float32)
    r = svo_raycast(table, root, height, start, d, distance=dist)
    assert np.array_equal(np.asarray(r["hit"]), [False, True])


def test_skip_t0_inside_solid():
    n = 8
    solid = np.ones((n, n, n), bool)
    solid[0:4, :, :] = True  # fully solid world
    rgb = np.full((n, n, n, 3), 0.5, np.float32)
    space = from_dense(solid, rgb)
    table, root, height = device_table(space)
    start = jnp.asarray([[2.5, 2.5, 2.5]], jnp.float32)
    d = jnp.asarray([[1.0, 0, 0]], jnp.float32)
    # inside a solid: skip_t0=True must not report the containing voxel at t=0
    r = svo_raycast(table, root, height, start, d, skip_t0=True)
    assert not np.asarray(r["hit"])[0] or np.asarray(r["t"])[0] > 0
    r2 = svo_raycast(table, root, height, start, d, skip_t0=False)
    assert np.asarray(r2["hit"])[0] and np.asarray(r2["t"])[0] == 0.0


def test_miss_outside_world():
    n = 8
    solid = np.zeros((n, n, n), bool)
    solid[0, 0, 0] = True
    rgb = np.zeros((n, n, n, 3), np.float32)
    space = from_dense(solid, rgb)
    table, root, height = device_table(space)
    start = jnp.asarray([[20.0, 20.0, 20.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)  # pointing away
    r = svo_raycast(table, root, height, start, d)
    assert not np.asarray(r["hit"])[0]


def test_negative_direction_mirroring(rng):
    """All-octant coverage: rays with every sign combination."""
    n = 16
    solid, rgb, space = random_world(rng, n, fill=0.15)
    table, root, height = device_table(space)
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                d = np.tile(
                    np.array([[sx, sy, sz]], np.float32) / np.sqrt(3), (64, 1)
                )
                start = (
                    rng.random((64, 3)).astype(np.float32) * n
                )
                rs = svo_raycast(
                    table, root, height, jnp.asarray(start), jnp.asarray(d),
                    skip_t0=False,
                )
                rd = dense_raycast(
                    jnp.asarray(solid), jnp.asarray(start), jnp.asarray(d), n
                )
                assert np.array_equal(
                    np.asarray(rs["hit"]), np.asarray(rd["hit"])
                ), (sx, sy, sz)
                both = np.asarray(rs["hit"])
                assert np.array_equal(
                    np.asarray(rs["voxel"])[both], np.asarray(rd["voxel"])[both]
                )


def test_bucketed_cast_bit_identical(rng):
    """svo_raycast_bucketed shares the cast body, so every output must be
    bit-identical to svo_raycast — including misses, voxel ids, and the
    advisory-distance-cap contour — across random worlds and ray soups."""
    from voxtracer.kernels.traverse import svo_raycast_bucketed

    for trial in range(3):
        n = 16
        _, _, space = random_world(rng, n=n, fill=0.1 + 0.2 * trial)
        table, root, H = device_table(space)
        start, d = random_rays(rng, 8192, n)
        dist = jnp.asarray(
            rng.choice([4.0, 16.0, 1e12], size=8192).astype(np.float32)
        )
        a = svo_raycast(table, root, H, start, d, distance=dist)
        b = svo_raycast_bucketed(table, root, H, start, d, distance=dist,
                                 min_bucket=512)
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )


def test_bucketed_cast_active_mask(rng):
    from voxtracer.kernels.traverse import svo_raycast_bucketed

    n = 16
    _, _, space = random_world(rng, n=n)
    table, root, H = device_table(space)
    start, d = random_rays(rng, 4096, n)
    act = jnp.asarray(rng.random(4096) < 0.5)
    a = svo_raycast(table, root, H, start, d, active=act)
    b = svo_raycast_bucketed(table, root, H, start, d, active=act,
                             min_bucket=256)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)
