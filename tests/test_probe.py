"""Adaptive demand-probe discipline (render/driver.py).

Contract (VERDICT r3 weak #6/#7): the per-pose stage-2 demand probe is
a host sync; once the sticky raster capacities stop growing for
``PROBE_STABLE_N`` consecutive poses the Renderer skips it, deferring
the pose's demand check to a lag-1 readback of the bins' own counters.
The invariant that closes the overflow loop: a pose whose demand
exceeds the sticky capacities can NEVER silently drop boxes — either
the probe grows the slots before the bins build, or the deferred check
detects the overflow, regrows the slots, drops the bins cache, resumes
probing, and invalidates every sample the overflowed bins fed.
"""

import numpy as np
import pytest

from voxtracer.core import camera as vcam
from voxtracer.core import rng as vrng
from voxtracer.render.driver import Renderer
from voxtracer.world import worldgen

W, H = 64, 40


@pytest.fixture(scope="module")
def world():
    return worldgen.generate(log2_size=5, verbose=False)


def _poses(n, jitter=0.35):
    rng = np.random.default_rng(42)
    s = 32 / 8192.0
    out = []
    for _ in range(n):
        p = np.asarray(vcam.DEFAULT_POSE.pos) * s + rng.normal(0, jitter, 3)
        out.append(vcam.Camera(
            pos=tuple(p),
            yaw=vcam.DEFAULT_POSE.yaw + rng.normal(0, 0.01),
            pitch=vcam.DEFAULT_POSE.pitch + rng.normal(0, 0.01)))
    return out


def _renderer(world, **kw):
    return Renderer(world.serialize(), W, H, max_bounces=2, fog_steps=4,
                    seed=7, **kw)


def test_probe_stabilizes_and_defers(world):
    """A fly-through over similar poses stops probing after
    PROBE_STABLE_N stable poses; probe-free poses enqueue deferred
    checks that drain clean (no overflow) and previews stay exact."""
    r = _renderer(world)
    sun = np.array([0.8, 10.2743, 3.7])
    poses = _poses(8)
    for c in poses[:-1]:
        r.preview_frame(c, sun)
    assert r._probe_stable >= Renderer.PROBE_STABLE_N
    assert len(r._pending_checks) > 0  # probe-free poses were deferred
    r._drain_overflow_checks(block=True)
    assert r.overflow_events == 0
    # the probe-free pose's preview is identical to an always-probing
    # fresh Renderer's (the sticky slots cover its demand)
    img = np.asarray(r.preview_frame(poses[-1], sun))
    fresh = _renderer(world)
    img2 = np.asarray(fresh.preview_frame(poses[-1], sun))
    assert np.array_equal(img, img2)


def test_stale_slots_never_silent(world):
    """Deliberately stale (undersized) sticky slots on a probe-free
    pose: the deferred check must detect the overflow, discard the
    tainted accumulation, and the recovered render must equal an
    exact fresh one — never a silent drop."""
    r = _renderer(world)
    sun = np.array([0.8, 10.2743, 3.7])
    pose = _poses(1)[0]
    # simulate the regression the invariant guards against: a new pose
    # reuses sticky capacities far below its demand, with the probe
    # wrongly marked stable
    r._pair_slots = (8,) * len(r._pair_slots)
    r._near_slots = 8
    r._probe_stable = Renderer.PROBE_STABLE_N
    r.sample(pose, sun)  # tainted: bins built unprobed with tiny slots
    tainted = r.acc.samples
    assert tainted == 1
    r._drain_overflow_checks(block=True)
    assert r.overflow_events >= 1
    # tainted accumulation marked for discard (reset on next sample)
    assert r.acc._key is None
    assert r._probe_stable == 0  # probing resumed
    # recovered path: the regrown slots cover the pose; the next sample
    # matches a fresh exact renderer consuming the same seed sequence
    r.sample(pose, sun)
    fresh = _renderer(world)
    vrng.host_frame_seed(fresh.host_rng)  # burn the tainted sample's seed
    fresh.sample(pose, sun)
    assert np.array_equal(np.asarray(r.acc.mean()),
                          np.asarray(fresh.acc.mean()))


def test_probe_asserts_fit_coverage(world):
    """The per-pose probe's post-fit assert holds on real demand."""
    r = _renderer(world)
    pose = _poses(1)[0]
    soup = r._get_soup(pose)
    assert soup is not None
    r._probe_slots(pose, soup)  # raises if fit_* ever under-covers
