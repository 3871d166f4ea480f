"""BASELINE.json config conformance (scaled-down for CPU CI).

The five driver-assigned configs (BASELINE.md):
  1. dense grid, primary rays only — pixel parity vs the oracle
  2. primary + hard shadow rays + sky/sun shading — pixel parity
  3. SVO traversal at scale — pixel parity (beam vs per-ray)
  4. spectral rendering + fog — statistical parity
  5. dynamic world: per-frame edits + fly-through — functional
Full-resolution throughput is measured by bench.py on hardware.
"""

import numpy as np
import jax.numpy as jnp

from voxtracer.core import camera as vcam
from voxtracer.kernels import shade
from voxtracer.kernels.traverse import dense_raycast, svo_raycast
from voxtracer.world import worldgen
from voxtracer.world.dense import from_heightmap
from voxtracer.world.svo import from_dense


def _terrain(n=32):
    h = worldgen.heightmap(int(np.log2(n)))
    return from_heightmap(np.asarray(h), n)


def test_config1_dense_primary_parity():
    """Dense grid, primary rays: DDA frame equals SVO frame pixel-exactly
    (two independent implementations over identical geometry)."""
    world = _terrain(32)
    space = from_dense(world.solid, world.rgb)
    dev = space.serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    cam = vcam.Camera(pos=(16.123, 28.077, -9.955), yaw=0.05, pitch=0.35)
    sun = jnp.asarray([0.4, 0.8, 0.45], jnp.float32)
    sun = sun / jnp.linalg.norm(sun)
    _, d = vcam.generate_rays(cam, 80, 48)
    o = jnp.asarray(np.asarray(cam.pos, np.float32))
    a = shade.dense_primary_frame(jnp.asarray(world.solid),
                                  jnp.asarray(world.rgb), 32, o, d, sun)
    b = shade.svo_primary_frame(table, root, dev.height, o, d, sun)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_config2_shadow_parity():
    """Primary + hard shadows + sky: dense vs SVO paths agree."""
    world = _terrain(32)
    space = from_dense(world.solid, world.rgb)
    dev = space.serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    cam = vcam.Camera(pos=(16.123, 28.077, -9.955), yaw=0.05, pitch=0.35)
    sun = jnp.asarray([0.4, 0.8, 0.45], jnp.float32)
    sun = sun / jnp.linalg.norm(sun)
    _, d = vcam.generate_rays(cam, 64, 40)
    o = jnp.asarray(np.asarray(cam.pos, np.float32))
    a = shade.dense_shadow_frame(jnp.asarray(world.solid),
                                 jnp.asarray(world.rgb), 32, o, d, sun)
    b = shade.svo_shadow_frame(table, root, dev.height, o, d, sun)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_config3_svo_beam_parity():
    """SVO traversal at (scaled) resolution via the production beam
    engine matches the per-ray oracle — covered in depth by test_beam;
    here with the procedural terrain world."""
    from voxtracer.kernels.beam import beam_primary_frame_cast, build_aug_table

    space = worldgen.generate(log2_size=6, verbose=False, backend="python")
    dev = space.serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    aug = jnp.asarray(build_aug_table(dev.table, dev.solid_leaf))
    cam = vcam.Camera(pos=(6.3717, 12.1311, 5.0921), yaw=-5.38, pitch=0.22)
    _, d = vcam.generate_rays(cam, 96, 56)
    op = np.asarray(cam.pos, np.float32)
    rb = beam_primary_frame_cast(table, aug, root, dev.height, op, d)
    rr = svo_raycast(table, root, dev.height, jnp.asarray(op), d)
    assert np.array_equal(np.asarray(rb["hit"]), np.asarray(rr["hit"]))
    both = np.asarray(rb["hit"])
    assert np.allclose(np.asarray(rb["t"])[both], np.asarray(rr["t"])[both],
                       rtol=1e-4, atol=1e-3)


def test_config4_spectral_statistics(rng):
    """Spectral + fog: averaged radiance of a sky patch is blue-dominant
    (Rayleigh lambda^-4 density) and finite; direct sun is white-hot."""
    from voxtracer.core.spectra import build_wl_to_rgb_lut, fog_density
    from voxtracer.kernels.integrator import trace_paths
    from voxtracer.world.svo import SvoSpace

    # empty world: pure atmosphere
    space = SvoSpace()
    dev = space.serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    lut = jnp.asarray(build_wl_to_rgb_lut(512))
    B = 4096
    start = jnp.broadcast_to(jnp.asarray([0.0, 100.0, 0.0]), (B, 3))
    up = jnp.asarray([0.2, 0.9, 0.2], jnp.float32)
    up = up / jnp.linalg.norm(up)
    d = jnp.broadcast_to(up, (B, 3))
    sun = jnp.asarray([0.8, 0.5, 0.0], jnp.float32)
    sun = sun / jnp.linalg.norm(sun)
    wl = jnp.asarray(rng.random(B, np.float32))
    state = jnp.asarray(rng.integers(0, 2**32, (B, 3), dtype=np.uint32))
    _, col = trace_paths(table, np.int32(-1), 1, lut, start, d, wl, sun,
                         state, max_bounces=4, fog_steps=32)
    mean = np.asarray(col).mean(axis=0)
    assert np.isfinite(mean).all() and (mean >= 0).all()
    assert mean[2] > mean[1]  # blue-dominant sky
    # blue wavelengths scatter more
    dens = np.asarray(fog_density(jnp.asarray([0.05, 0.95])))
    assert dens[0] > 10 * dens[1]


def test_config5_dynamic_world_flythrough():
    """Per-frame edits + camera motion: accumulator resets on change and
    edited geometry shows up in the very next frame."""
    from voxtracer.render.driver import Renderer

    space = worldgen.generate(log2_size=5, verbose=False, backend="python")
    r = Renderer(space.serialize(), 32, 24, max_bounces=2, fog_steps=4,
                 seed=1)
    cam = vcam.Camera(pos=(3.1, 6.2, 2.9), yaw=-5.38, pitch=0.22)
    sun = np.asarray([0.8, 10.2743, 3.7])
    r.sample(cam, sun)
    r.sample(cam, sun)
    assert r.acc.samples == 2
    # camera moves: progressive state resets (fragment.rs:331-354)
    cam2 = vcam.Camera(pos=(4.1, 6.2, 2.9), yaw=-5.3, pitch=0.22)
    r.sample(cam2, sun)
    assert r.acc.samples == 1
    # world edit invalidates and re-uploads (fragment.rs:274-313)
    space.set((1, 30, 1), (1.0, 1.0, 1.0))
    r.update_space(space.serialize())
    r.sample(cam2, sun)
    assert r.acc.samples == 1
    assert np.isfinite(r.acc.mean()).all()
