"""voxtracer benchmark — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): Mrays/s at 1920x1080 over the SVO
terrain world (config-3 geometry: 1024^3), primary rays, using the best
available engine. vs_baseline is measured against the 120 Mrays/s
north-star target. Secondary numbers (per-ray engine, path-tracing
throughput, frame ms) go to stderr.
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


def _time(fn, *args, reps=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.monotonic() - t0) / reps, out


def _enable_compile_cache():
    """Persistent XLA compilation cache — first compiles of the big
    render programs take minutes over the axon remote compiler."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          str(__import__("pathlib").Path(__file__).parent
                              / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from voxtracer.core import camera as vcam
    from voxtracer.core.spectra import build_wl_to_rgb_lut
    from voxtracer.kernels import beam as beam_mod
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
    aug = jnp.asarray(beam_mod.build_aug_table(dev.table, dev.solid_leaf))

    s = (1 << LOG2_SIZE) / 8192.0
    cam = vcam.Camera(
        pos=tuple(np.asarray(vcam.DEFAULT_POSE.pos) * s),
        yaw=vcam.DEFAULT_POSE.yaw,
        pitch=vcam.DEFAULT_POSE.pitch,
    )
    sun = np.asarray([0.8, 10.2743, 3.7])
    sun = (sun / np.linalg.norm(sun)).astype(np.float32)
    o, d = vcam.generate_rays(cam, W, H)
    d = jax.device_put(d)
    sun_j = jnp.asarray(sun)
    op = np.asarray(cam.pos, np.float32)

    results = {}

    # --- headline candidate: gather-free box rasterizer ---
    try:
        from voxtracer.kernels import raster as raster_mod
        from voxtracer.world.boxes import extract_boxes

        t0 = time.monotonic()
        soup = extract_boxes(dev)
        log(f"box soup: {len(soup)} boxes in {time.monotonic() - t0:.1f}s")
        box_lo = jnp.asarray(soup.lo)
        box_size = jnp.asarray(soup.size)
        box_attr = jnp.asarray(raster_mod.pack_box_attr(soup))
        basis = cam.basis()

        def f_raster(_):
            r = raster_mod.raster_cast_exact(
                box_lo, box_size, box_attr, op, basis, dev.height,
                W, H, table=table, root=root,
            )
            return r["t"]

        dt, _ = _time(f_raster, 0)
        results["raster"] = W * H / dt / 1e6
        log(f"raster frame {dt * 1e3:.1f} ms -> "
            f"{results['raster']:.2f} Mrays/s")
    except Exception as e:
        log("raster bench failed:", type(e).__name__, str(e)[:200])

    # --- beam engine (tree-walk amortized per tile) ---
    try:
        f_beam = jax.jit(lambda d: beam_mod.beam_primary_frame(
            table, aug, root, dev.height, op, d, sun_j,
            tile=8, K=64, max_steps=512, bands=27, rounds=6,
        ))
        dt, _ = _time(f_beam, d)
        results["beam"] = W * H / dt / 1e6
        log(f"beam primary frame {dt * 1e3:.1f} ms -> "
            f"{results['beam']:.2f} Mrays/s")
    except Exception as e:
        log("beam bench failed:", type(e).__name__, str(e)[:200])

    # --- per-ray engine (reference-style wavefront traversal) ---
    try:
        f_ray = jax.jit(lambda d: shade.svo_primary_frame(
            table, root, dev.height, jax.device_put(o), d, sun_j, tiles=135,
        ))
        dt, _ = _time(f_ray, d)
        results["ray"] = W * H / dt / 1e6
        log(f"per-ray primary frame {dt * 1e3:.1f} ms -> "
            f"{results['ray']:.2f} Mrays/s")
    except Exception as e:
        log("per-ray bench failed:", type(e).__name__, str(e)[:200])

    # --- secondary: full path-tracing sample throughput ---
    try:
        lut = jnp.asarray(build_wl_to_rgb_lut())
        seed = jnp.asarray(np.array([3, 5, 7], np.uint32))
        pt = jax.jit(lambda seed: render_sample(
            table, root, dev.height, lut, op, cam.basis(), sun_j, seed,
            853, 480, max_bounces=8, fog_steps=64, row_tiles=24,
        ))
        dt, out = _time(pt, seed, reps=2)
        log(f"path-traced sample 853x480: {dt * 1e3:.0f} ms -> "
            f"{853 * 480 / dt / 1e6:.3f} Mpaths/s")
    except Exception as e:
        log("path-trace bench failed:", type(e).__name__, str(e)[:200])

    best = max(results.values()) if results else 0.0
    print(json.dumps({
        "metric": "primary_rays_1080p_svo1024",
        "value": round(best, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(best / NORTH_STAR_MRAYS, 3),
    }))


if __name__ == "__main__":
    main()
