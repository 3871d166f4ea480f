"""Integrator semantics: determinism, energy sanity, emissive blocks,
sun-disk miss rule, Russian-roulette unbiasedness proxy."""

import numpy as np
import jax.numpy as jnp

from voxtracer.core import camera as vcam
from voxtracer.core.spectra import build_wl_to_rgb_lut
from voxtracer.kernels.integrator import render_sample, trace_paths
from voxtracer.world.svo import SvoSpace, from_dense

LUT = jnp.asarray(build_wl_to_rgb_lut(256))


def flat_world(n=16, color=(0.5, 0.5, 0.5), floor_h=2):
    solid = np.zeros((n, n, n), bool)
    solid[:, :floor_h, :] = True
    rgb = np.zeros((n, n, n, 3), np.float32)
    rgb[solid] = color
    space = from_dense(solid, rgb)
    dev = space.serialize()
    return (
        jnp.asarray(dev.table.view(np.int32)),
        np.int32(dev.root),
        dev.height,
        space,
    )


def sun_vec():
    s = np.asarray([0.3, 1.0, 0.2])
    return jnp.asarray(s / np.linalg.norm(s), jnp.float32)


def test_render_sample_deterministic():
    table, root, height, _ = flat_world()
    cam = vcam.Camera(pos=(8.0, 6.0, 8.0), yaw=0.3, pitch=0.4)
    seed = jnp.asarray(np.array([11, 22, 33], np.uint32))
    kw = dict(max_bounces=3, fog_steps=8)
    a = render_sample(table, root, height, LUT, np.asarray(cam.pos, np.float32),
                      cam.basis(), sun_vec(), seed, 32, 24, **kw)
    b = render_sample(table, root, height, LUT, np.asarray(cam.pos, np.float32),
                      cam.basis(), sun_vec(), seed, 32, 24, **kw)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()


def test_different_seeds_differ():
    table, root, height, _ = flat_world()
    cam = vcam.Camera(pos=(8.0, 6.0, 8.0), yaw=0.3, pitch=0.4)
    kw = dict(max_bounces=3, fog_steps=8)
    a = render_sample(table, root, height, LUT, np.asarray(cam.pos, np.float32),
                      cam.basis(), sun_vec(),
                      jnp.asarray(np.array([1, 2, 3], np.uint32)), 32, 24, **kw)
    b = render_sample(table, root, height, LUT, np.asarray(cam.pos, np.float32),
                      cam.basis(), sun_vec(),
                      jnp.asarray(np.array([4, 5, 6], np.uint32)), 32, 24, **kw)
    assert not np.array_equal(np.asarray(a), np.asarray(b))


def test_sun_disk_visible_on_primary_miss(rng):
    """Primary rays into the sun cone with no geometry add SUN_COLOR."""
    table, root, height, _ = flat_world(floor_h=1)
    sun = sun_vec()
    B = 64
    start = jnp.broadcast_to(jnp.asarray([8.0, 8.0, 8.0]), (B, 3))
    d = jnp.broadcast_to(sun, (B, 3))
    wl = jnp.full((B,), 0.5, jnp.float32)
    state = jnp.asarray(rng.integers(0, 2**32, (B, 3), dtype=np.uint32))
    # zero fog density would need wavelength hacking; instead just check the
    # looking-at-sun average massively exceeds the away-from-sun average.
    _, into = trace_paths(table, root, height, LUT, start, d, wl, sun, state,
                          max_bounces=2, fog_steps=8)
    d_away = jnp.broadcast_to(
        jnp.asarray([0.0, 0.2, -0.9797958971], jnp.float32), (B, 3)
    )
    _, away = trace_paths(table, root, height, LUT, start, d_away, wl, sun,
                          state, max_bounces=2, fog_steps=8)
    assert float(into.mean()) > 50.0 * max(float(away.mean()), 1e-6)


def test_emissive_white_block(rng):
    """A placed pure-white block is a light: facing it in a dark world
    yields radiance even away from the sun."""
    n = 16
    solid = np.zeros((n, n, n), bool)
    solid[8, 8, 8] = True
    rgb = np.zeros((n, n, n, 3), np.float32)
    rgb[8, 8, 8] = (1.0, 1.0, 1.0)
    dev = from_dense(solid, rgb).serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)

    B = 256
    start = jnp.broadcast_to(jnp.asarray([8.5, 8.5, 4.0]), (B, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (B, 3))
    wl = jnp.linspace(0.05, 0.95, B)
    sun_dn = jnp.asarray([0.0, -1.0, 0.0], jnp.float32)  # sun below horizon
    state = jnp.asarray(rng.integers(0, 2**32, (B, 3), dtype=np.uint32))
    _, col = trace_paths(table, root, dev.height, LUT, start, d, wl, sun_dn,
                         state, max_bounces=2, fog_steps=8)
    assert float(col.mean()) > 0.0
    # gray block of the same layout must NOT emit
    rgb2 = rgb.copy()
    rgb2[8, 8, 8] = (0.5, 0.5, 0.5)
    dev2 = from_dense(solid, rgb2).serialize()
    table2 = jnp.asarray(dev2.table.view(np.int32))
    _, col2 = trace_paths(table2, np.int32(dev2.root), dev2.height, LUT, start,
                          d, wl, sun_dn, state, max_bounces=1, fog_steps=8)
    assert float(col2.mean()) == 0.0


def test_row_band_matches_full_frame():
    """render_sample(row0, rows) must reproduce the band of the full frame
    (the tile-sharded multi-chip path relies on this)."""
    table, root, height, _ = flat_world()
    cam = vcam.Camera(pos=(8.0, 6.0, 8.0), yaw=0.3, pitch=0.4)
    seed = jnp.asarray(np.array([11, 22, 33], np.uint32))
    kw = dict(max_bounces=2, fog_steps=8)
    full = render_sample(table, root, height, LUT,
                         np.asarray(cam.pos, np.float32), cam.basis(),
                         sun_vec(), seed, 32, 24, **kw)
    band = render_sample(table, root, height, LUT,
                         np.asarray(cam.pos, np.float32), cam.basis(),
                         sun_vec(), seed, 32, 24, row0=8, rows=8, **kw)
    assert np.array_equal(np.asarray(full)[8:16], np.asarray(band))


def test_beam_primary_matches_per_ray():
    """render_sample with the beam-cast first bounce reproduces the plain
    path tracer (same RNG stream; differences only at edge-graze pixels)."""
    from voxtracer.kernels.beam import build_aug_table
    from voxtracer.world import worldgen

    space = worldgen.generate(log2_size=6, verbose=False, backend="python")
    dev = space.serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    aug = jnp.asarray(build_aug_table(dev.table, dev.solid_leaf))
    cam = vcam.Camera(pos=(12.123, 25.071, 5.043), yaw=-5.38, pitch=0.22)
    seed = jnp.asarray(np.array([11, 22, 33], np.uint32))
    sun = sun_vec()
    kw = dict(max_bounces=3, fog_steps=8)
    a = render_sample(table, root, dev.height, LUT,
                      np.asarray(cam.pos, np.float32), cam.basis(), sun,
                      seed, 64, 40, **kw)
    b = render_sample(table, root, dev.height, LUT,
                      np.asarray(cam.pos, np.float32), cam.basis(), sun,
                      seed, 64, 40, aug=aug, **kw)
    aa, bb = np.asarray(a), np.asarray(b)
    differ = ~np.isclose(aa, bb, rtol=1e-5, atol=1e-4)
    assert differ.mean() < 0.01, f"{differ.mean():.2%} differ"


def test_render_samples_batch_equals_serial():
    """The batched scan accumulator must equal per-sample accumulation."""
    from voxtracer.kernels.integrator import render_samples

    table, root, height, _ = flat_world()
    cam = vcam.Camera(pos=(8.0, 6.0, 8.0), yaw=0.3, pitch=0.4)
    seeds = np.stack([np.array([i + 1, 2 * i, 3 * i + 5], np.uint32)
                      for i in range(3)])
    kw = dict(max_bounces=2, fog_steps=8)
    total = render_samples(table, root, height, LUT,
                           np.asarray(cam.pos, np.float32), cam.basis(),
                           sun_vec(), jnp.asarray(seeds), 32, 24, **kw)
    serial = np.zeros((24, 32, 3), np.float32)
    for s in seeds:
        serial += np.asarray(render_sample(
            table, root, height, LUT, np.asarray(cam.pos, np.float32),
            cam.basis(), sun_vec(), jnp.asarray(s), 32, 24, **kw))
    assert np.allclose(np.asarray(total), serial, atol=1e-4)


def test_compaction_bit_identical(rng):
    """The shrinking-bucket compaction must not change any pixel (per-lane
    RNG travels with the lane)."""
    from voxtracer.world import worldgen
    from voxtracer.world.dense import from_heightmap as dense_from_h
    from voxtracer.world.svo import from_dense as svo_from_dense

    h = worldgen.heightmap(5)
    dw = dense_from_h(np.asarray(h), 32)
    dev = svo_from_dense(dw.solid, dw.rgb).serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    B = 8192  # above the compaction threshold
    start = jnp.broadcast_to(jnp.asarray([16.1, 25.2, -8.3]), (B, 3))
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    wl = jnp.asarray(rng.random(B, np.float32))
    sun = sun_vec()
    state = jnp.asarray(rng.integers(0, 2**32, (B, 3), dtype=np.uint32))
    kw = dict(max_bounces=6, fog_steps=8)
    st_a, a = trace_paths(table, root, dev.height, LUT, start, d, wl, sun,
                          state, compact=False, **kw)
    st_b, b = trace_paths(table, root, dev.height, LUT, start, d, wl, sun,
                          state, compact=True, **kw)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    # the returned RNG state is per-lane and full-shape under compaction
    # (round-1 regression: it was the final bucket's lanes only), and every
    # lane's state advanced from the seed
    assert st_b.shape == state.shape and st_b.dtype == state.dtype
    assert not np.array_equal(np.asarray(st_b), np.asarray(state))


def test_soup_primary_matches_per_ray():
    """render_sample with the rasterized first bounce reproduces the plain
    path tracer (same RNG stream; jittered primary rays resolved by the
    box rasterizer — kernels/raster.py; differences only at edge-graze
    pixels)."""
    from voxtracer.kernels.raster import pack_box_attr
    from voxtracer.world import worldgen
    from voxtracer.world.boxes import extract_boxes

    space = worldgen.generate(log2_size=6, verbose=False, backend="python")
    dev = space.serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    soup = extract_boxes(dev)
    soup_args = (jnp.asarray(soup.lo), jnp.asarray(soup.size),
                 jnp.asarray(pack_box_attr(soup)))
    cam = vcam.Camera(pos=(12.123, 25.071, 5.043), yaw=-5.38, pitch=0.22)
    seed = jnp.asarray(np.array([11, 22, 33], np.uint32))
    sun = sun_vec()
    kw = dict(max_bounces=3, fog_steps=8)
    a = render_sample(table, root, dev.height, LUT,
                      np.asarray(cam.pos, np.float32), cam.basis(), sun,
                      seed, 64, 40, **kw)
    b = render_sample(table, root, dev.height, LUT,
                      np.asarray(cam.pos, np.float32), cam.basis(), sun,
                      seed, 64, 40, soup=soup_args, **kw)
    aa, bb = np.asarray(a), np.asarray(b)
    differ = ~np.isclose(aa, bb, rtol=1e-5, atol=1e-4)
    assert differ.mean() < 0.01, f"{differ.mean():.2%} differ"


def test_compaction_chained_states():
    """Compacted trace_paths returns the SAME chained RNG state as the
    uncompacted loop for every lane — including lanes dropped dead at a
    bucket boundary, whose states burn the draws the uncompacted loop's
    remaining iterations would have consumed (11 random3 per bounce,
    kernels/integrator.py BOUNCE_DRAWS)."""
    from voxtracer.core import rng as vrng

    table, root, height, _ = flat_world()
    cam = vcam.Camera(pos=(8.0, 6.0, 8.0), yaw=0.3, pitch=0.35)
    W, H = 96, 48  # 4608 lanes >= the 4096 compaction threshold
    py, px = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    seed = jnp.asarray(np.array([7, 77, 777], np.uint32))
    state = vrng.seed_pixels(seed, jnp.asarray(px), jnp.asarray(py))
    state, rnd = vrng.random3(state)
    ld = vcam.pixel_ndc(jnp.asarray(px), jnp.asarray(py), W, H)
    d = vcam.ray_directions(cam.basis(), ld, jitter=rnd[..., :2], height=H)
    pos = jnp.broadcast_to(
        jnp.asarray(cam.pos, jnp.float32), d.shape)
    wl = rnd[..., 2]

    sc, cc = trace_paths(table, root, height, LUT, pos, d, wl, sun_vec(),
                         state, max_bounces=6, fog_steps=8, compact=True)
    su, cu = trace_paths(table, root, height, LUT, pos, d, wl, sun_vec(),
                         state, max_bounces=6, fog_steps=8, compact=False)
    assert np.array_equal(np.asarray(cc), np.asarray(cu))
    assert np.array_equal(np.asarray(sc), np.asarray(su))


def test_row_band_soup_matches_full_frame():
    """Banded rasterized primaries (tile sharding) reproduce the band of
    the full-frame soup render bit-exactly — including a band that is
    NOT tile-aligned (the integrator pads to the containing aligned band
    and slices)."""
    from voxtracer.kernels.raster import pack_box_attr
    from voxtracer.world.boxes import extract_boxes

    table, root, height, space = flat_world()
    soup = extract_boxes(space.serialize())
    soup_dev = (jnp.asarray(soup.lo), jnp.asarray(soup.size),
                jnp.asarray(pack_box_attr(soup)))
    cam = vcam.Camera(pos=(8.0, 6.0, 8.0), yaw=0.3, pitch=0.4)
    seed = jnp.asarray(np.array([11, 22, 33], np.uint32))
    kw = dict(max_bounces=2, fog_steps=8, soup=soup_dev)
    full = render_sample(table, root, height, LUT,
                         np.asarray(cam.pos, np.float32), cam.basis(),
                         sun_vec(), seed, 32, 24, **kw)
    band = render_sample(table, root, height, LUT,
                         np.asarray(cam.pos, np.float32), cam.basis(),
                         sun_vec(), seed, 32, 24, row0=8, rows=8, **kw)
    assert np.array_equal(np.asarray(full)[8:16], np.asarray(band))
    band2 = render_sample(table, root, height, LUT,
                          np.asarray(cam.pos, np.float32), cam.basis(),
                          sun_vec(), seed, 32, 24, row0=6, rows=10, **kw)
    assert np.array_equal(np.asarray(full)[6:16], np.asarray(band2))


def test_render_samples_fused_soup_equals_serial():
    """The fused batch with rasterized primaries (one k-batched resolve,
    kernels/raster.py) must equal per-sample accumulation bit-for-bit:
    identical primaries, identical per-lane paths, identical sum order."""
    from voxtracer.kernels.integrator import render_samples
    from voxtracer.kernels.raster import pack_box_attr
    from voxtracer.world import worldgen
    from voxtracer.world.boxes import extract_boxes

    space = worldgen.generate(log2_size=6, verbose=False)
    dev = space.serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    soup = extract_boxes(dev)
    sargs = (jnp.asarray(soup.lo), jnp.asarray(soup.size),
             jnp.asarray(pack_box_attr(soup)))
    cam = vcam.Camera(pos=(20.0, 50.0, 12.0), yaw=0.7, pitch=-0.5)
    seeds = np.stack([np.array([7 * i + 1, i, 5 * i + 2], np.uint32)
                      for i in range(3)])
    kw = dict(max_bounces=3, fog_steps=8, soup=sargs)
    total = render_samples(table, root, dev.height, LUT,
                           np.asarray(cam.pos, np.float32), cam.basis(),
                           sun_vec(), jnp.asarray(seeds), 48, 32, **kw)
    acc = None
    for s in seeds:
        r = np.asarray(render_sample(
            table, root, dev.height, LUT, np.asarray(cam.pos, np.float32),
            cam.basis(), sun_vec(), jnp.asarray(s), 48, 32, **kw))
        acc = r if acc is None else acc + r
    assert np.array_equal(np.asarray(total), acc)


def test_fused_nee_loop_bit_identical():
    """The round-4 fused-NEE bounce loop (one 2B-lane walk serving
    bounce i's shadow rays and bounce i+1's indirect rays) must return
    BIT-IDENTICAL radiance to the unfused loop: the per-lane draw
    SEQUENCE is unchanged (bounce i+1's planet draw merely happens at
    iteration i's tail) and casts consume no RNG. The returned chained
    state leads the unfused loop's by EXACTLY one planet draw (3 pcg3d
    steps, every lane) — pinned here (kernels/integrator.py
    bounce_fused doc)."""
    from voxtracer.core import rng as vrng
    from voxtracer.kernels.heightfield import build_height_mips
    from voxtracer.world import worldgen

    space = worldgen.generate(log2_size=6, verbose=False)
    dev = space.serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    flat, offs, h = build_height_mips(space.heights)
    rng = np.random.default_rng(17)
    n = 64
    kw = dict(max_bounces=6, fog_steps=8, hf_mips=flat, hf_offsets=offs,
              terrain_rgb=jnp.asarray([0.5, 0.5, 0.5], jnp.float32))
    for B in (768, 9216):  # below / above the compaction threshold
        start = rng.uniform(4, n - 4, (B, 3)).astype(np.float32)
        start[:, 1] = rng.uniform(2, n - 2, B)
        d = rng.normal(size=(B, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        wl = rng.random(B).astype(np.float32)
        state = rng.integers(0, 2**32, (B, 3), dtype=np.uint32)
        sun = sun_vec()
        args = (table, root, h, LUT, jnp.asarray(start), jnp.asarray(d),
                jnp.asarray(wl), sun, jnp.asarray(state))
        st_a, a = trace_paths(*args, fuse_nee=False, **kw)
        st_b, b = trace_paths(*args, fuse_nee=True, **kw)
        assert np.array_equal(np.asarray(a), np.asarray(b)), (
            f"B={B}: {int(np.any(np.asarray(a) != np.asarray(b), -1).sum())}"
            " lanes differ"
        )
        lead = st_a
        for _ in range(3):
            lead = vrng.pcg3d(lead)
        assert np.array_equal(np.asarray(lead), np.asarray(st_b))
