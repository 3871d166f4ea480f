"""voxtracer benchmark — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): Mrays/s at 1920x1080 over the SVO
terrain world (config-3 geometry: 1024^3), primary rays. vs_baseline is
measured against the 120 Mrays/s north-star target. Secondary numbers
(path-tracing samples/s, frame ms) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

LOG2_SIZE = 10  # 1024^3 world (BASELINE config 3)
W, H = 1920, 1080
NORTH_STAR_MRAYS = 120.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from voxtracer.core import camera as vcam
    from voxtracer.core.spectra import build_wl_to_rgb_lut
    from voxtracer.kernels import shade
    from voxtracer.kernels.integrator import render_sample
    from voxtracer.world import worldgen

    log("devices:", jax.devices())
    t0 = time.monotonic()
    space = worldgen.generate(log2_size=LOG2_SIZE, verbose=False)
    log(f"worldgen {time.monotonic() - t0:.1f}s, {space.num_nodes()} nodes")
    dev = space.serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)

    s = (1 << LOG2_SIZE) / 8192.0
    cam = vcam.Camera(
        pos=tuple(np.asarray(vcam.DEFAULT_POSE.pos) * s),
        yaw=vcam.DEFAULT_POSE.yaw,
        pitch=vcam.DEFAULT_POSE.pitch,
    )
    sun = np.asarray([0.8, 10.2743, 3.7])
    sun = (sun / np.linalg.norm(sun)).astype(np.float32)
    o, d = vcam.generate_rays(cam, W, H)
    o = jax.device_put(o)
    d = jax.device_put(d)
    sun_j = jnp.asarray(sun)

    # --- headline: primary-ray frame at 1080p ---
    frame = jax.jit(
        lambda o, d: shade.svo_primary_frame(
            table, root, dev.height, o, d, sun_j, tiles=135
        )
    )
    img = frame(o, d)
    img.block_until_ready()  # compile + warm
    reps = 5
    t0 = time.monotonic()
    for _ in range(reps):
        img = frame(o, d)
    img.block_until_ready()
    dt = (time.monotonic() - t0) / reps
    mrays = W * H / dt / 1e6
    log(f"primary frame {dt * 1e3:.1f} ms -> {mrays:.2f} Mrays/s")

    # --- secondary: full path-tracing sample throughput ---
    lut = jnp.asarray(build_wl_to_rgb_lut())
    seed = jnp.asarray(np.array([3, 5, 7], np.uint32))
    pt = jax.jit(
        lambda seed: render_sample(
            table, root, dev.height, lut,
            np.asarray(cam.pos, np.float32), cam.basis(), sun_j, seed,
            W, H, max_bounces=8, fog_steps=64, row_tiles=27,
        )
    )
    try:
        out = pt(seed)
        out.block_until_ready()
        t0 = time.monotonic()
        out = pt(seed)
        out.block_until_ready()
        pt_dt = time.monotonic() - t0
        log(f"path-traced sample {pt_dt:.2f} s -> "
            f"{W * H / pt_dt / 1e6:.3f} Mpaths/s")
    except Exception as e:  # pragma: no cover
        log("path-trace bench failed:", e)

    print(json.dumps({
        "metric": "primary_rays_1080p_svo1024",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 3),
    }))


if __name__ == "__main__":
    main()
