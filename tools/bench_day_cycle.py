"""Measured end-to-end flagship day-cycle unit (VERDICT r4 task #6).

Runs the PRODUCTION headless loop (render/driver.headless_run) on the
8192^3 world at the reference's 853x480 config — EXR saves, sun
stepping, per-pose envelope, fused sample batches included — for two
reduced-sample frames and prints one JSON line with the measured
paths/px/sec (the reference's own metric, main.rs:125-130). Per-sample
cost is flat at steady state, so the rate compares directly with the
full 1000-sample frames' derived rate.

Run standalone or as bench.py's subprocess (fresh device state: the
bench process keeps several GB of flagship buffers resident, which
perturbs an in-process measurement).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _warm_device, log  # noqa: E402


def main():
    import jax

    try:
        if jax.default_backend() != "cpu":
            jax.config.update(
                "jax_compilation_cache_dir",
                str(__import__("pathlib").Path(__file__).parents[1]
                    / ".jax_cache"))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from voxtracer.core import camera as vcam
    from voxtracer.render.driver import Renderer, headless_run
    from voxtracer.world import worldgen

    smoke = os.environ.get("BENCH_SMOKE") == "1"
    log2 = 8 if smoke else 13
    PTW, PTH = (160, 96) if smoke else (853, 480)
    spp = 8 if smoke else 60

    t0 = time.monotonic()
    space = worldgen.generate(log2_size=log2, verbose=False)
    fdev = space.serialize()
    log(f"worldgen {time.monotonic() - t0:.1f}s")
    rdr = Renderer(fdev, PTW, PTH, max_bounces=8, fog_steps=64)
    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    pos = np.asarray(vcam.DEFAULT_POSE.pos) * ((1 << log2) / 8192.0) \
        + rng.normal(0, 1.0, 3)
    cam = vcam.Camera(pos=tuple(pos), yaw=vcam.DEFAULT_POSE.yaw,
                      pitch=vcam.DEFAULT_POSE.pitch)

    with tempfile.TemporaryDirectory() as td:
        # warm: one frame compiles every program + clocks the device
        headless_run(rdr, cam, out_dir=td, frame_samples=spp,
                     max_frames=1, batch=4, log=lambda m: log("  ", m))
        _warm_device()
        t0 = time.monotonic()
        headless_run(rdr, cam, out_dir=td, frame_samples=spp,
                     max_frames=2, batch=4, log=lambda m: log("  ", m))
        dt = (time.monotonic() - t0) / 2
    out = dict(day_cycle_measured_paths_px_s=round(spp / dt, 2),
               frame_s=round(dt, 1), spp=spp)
    log("day-cycle measured:", out)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
