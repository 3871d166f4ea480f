"""ActiveSoup frustum cull: pixel-exact vs the full soup.

The contract (world/active.py): for any camera within the validity
volume of the last cull (translation < keep_radius/2, rotation <
margin/2), rasterizing the active subset equals rasterizing the full
soup pixel-exactly — culled boxes cannot be first hits.
"""

import numpy as np
import jax.numpy as jnp

from voxtracer.core import camera as vcam
from voxtracer.kernels.raster import pack_box_attr, raster_cast
from voxtracer.world import worldgen
from voxtracer.world.active import ActiveSoup
from voxtracer.world.boxes import extract_boxes


def _frame(args, cam, dev, W, H):
    r = raster_cast(*args, np.asarray(cam.pos, np.float32), cam.basis(),
                    dev.height, W, H)
    return {k: np.asarray(r[k]) for k in ("hit", "t", "node", "normal")}


def test_active_soup_matches_full():
    space = worldgen.generate(log2_size=6, verbose=False, backend="python")
    dev = space.serialize()
    soup = extract_boxes(dev)
    full = (jnp.asarray(soup.lo), jnp.asarray(soup.size),
            jnp.asarray(pack_box_attr(soup)))
    W, H = 96, 56
    cam = vcam.Camera(pos=(6.2, 20.1, 5.4), yaw=-5.38, pitch=0.22)
    act = ActiveSoup(soup, W, H, cap=len(soup), margin_deg=12.0,
                     keep_radius=16.0)

    args = act.active(np.asarray(cam.pos, np.float32), cam.basis())
    assert not act.overflowed
    assert 0 < act.n_active <= len(soup)
    a = _frame(args, cam, dev, W, H)
    b = _frame(full, cam, dev, W, H)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    # a nearby pose (inside the validity volume) must reuse the cull
    # and still match the full soup exactly
    cam2 = vcam.Camera(pos=(7.9, 19.3, 6.0), yaw=-5.30, pitch=0.17)
    pose_before = act._pose
    args2 = act.active(np.asarray(cam2.pos, np.float32), cam2.basis())
    assert act._pose is pose_before, "should not re-cull inside margins"
    a2 = _frame(args2, cam2, dev, W, H)
    b2 = _frame(full, cam2, dev, W, H)
    for k in a2:
        np.testing.assert_array_equal(a2[k], b2[k], err_msg=k)

    # a big move must trigger a re-cull
    cam3 = vcam.Camera(pos=(50.0, 30.0, 52.0), yaw=2.0, pitch=0.4)
    act.active(np.asarray(cam3.pos, np.float32), cam3.basis())
    assert act._pose is not pose_before


def test_active_soup_culls_something():
    """Looking at a corner of the world from outside must cull a
    substantial fraction of the soup (sanity that the cull is real)."""
    space = worldgen.generate(log2_size=6, verbose=False, backend="python")
    dev = space.serialize()
    soup = extract_boxes(dev)
    W, H = 64, 40
    # looking straight up from inside the world: terrain is behind the
    # camera, so only the keep_radius ball should survive
    cam = vcam.Camera(pos=(32.0, 40.0, 32.0), yaw=0.0, pitch=-1.5)
    act = ActiveSoup(soup, W, H, cap=len(soup), margin_deg=8.0,
                     keep_radius=4.0)
    act.active(np.asarray(cam.pos, np.float32), cam.basis())
    assert act.n_active < len(soup)


def test_active_soup_overflow_serves_full():
    """When the visible set exceeds cap, truncation would silently drop
    boxes — the full soup must be served instead (still pixel-exact)."""
    space = worldgen.generate(log2_size=6, verbose=False, backend="python")
    dev = space.serialize()
    soup = extract_boxes(dev)
    W, H = 64, 40
    cam = vcam.Camera(pos=(6.2, 20.1, 5.4), yaw=-5.38, pitch=0.22)
    act = ActiveSoup(soup, W, H, cap=8, keep_radius=16.0)
    args = act.active(np.asarray(cam.pos, np.float32), cam.basis())
    assert act.overflowed
    assert args[0].shape[0] == len(soup)  # full soup served
    full = (jnp.asarray(soup.lo), jnp.asarray(soup.size),
            jnp.asarray(pack_box_attr(soup)))
    a = _frame(args, cam, dev, W, H)
    b = _frame(full, cam, dev, W, H)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_renderer_occlusion_view_parity():
    """The Renderer's per-pose occlusion-culled soup view
    (driver._get_soup, OCCL_THRESHOLD) produces bit-identical samples
    to the full patchable soup, and is dropped on world updates."""
    import numpy as np

    from voxtracer.core import camera as vcam
    from voxtracer.render.driver import Renderer
    from voxtracer.world import worldgen

    space = worldgen.generate(log2_size=6, verbose=False)
    dev = space.serialize()
    r = Renderer(dev, 32, 24, max_bounces=2, fog_steps=4, seed=7)
    r.OCCL_THRESHOLD = 1  # engage the view at this tiny soup
    r2 = Renderer(dev, 32, 24, max_bounces=2, fog_steps=4, seed=7)

    cam = vcam.Camera(pos=(20.0, 40.0, -10.0), yaw=0.3, pitch=-0.5)
    sun = np.array([0.3, 0.8, 0.5])
    r.sample(cam, sun)
    r2.sample(cam, sun)
    assert r._act is not None, "occlusion view never engaged"
    assert r2._act is None
    np.testing.assert_array_equal(np.asarray(r.acc.mean()),
                                  np.asarray(r2.acc.mean()))

    # a world update drops the view (stale heights would be unsound)
    r.update_space(dev)
    assert r._act is None
