"""Flagship (8192^3) bench off the tools/flagship_cache.py artifact.

Reproduces bench.py's flagship section with fast iteration (cache load
instead of ~6 min of worldgen/soup/cull) and FULL tracebacks — the
bench swallows exceptions to keep its JSON line alive; this tool exists
to debug exactly those failures (e.g. the round-3 RESOURCE_EXHAUSTED).

Probe discipline (memory-safe at 6.7M active boxes): slots are fitted
from STAGE-2 probes (counters only — no pair-slot allocation, no sort),
then the one full probe that measures widen/fallback demand already
runs at fitted capacities. Probing with the worst-case defaults at this
scale allocates a ~12M-pair 8-operand sort on top of the resident
soup/cull/heightfield buffers.

Usage:
  python tools/flagship_cache.py            # once, ~5 min
  python tools/bench_flagship.py [--skip-pt] [--skip-raster]
                                 [--free-act] [--cull-npz PATH]
"""

from __future__ import annotations

import sys
import time

import numpy as np

W, H = 1920, 1080
PTW, PTH, FK = 853, 480, 2


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    sys.path.insert(0, "/root/repo")
    from bench import _cams, _time_over
    from tools.flagship_cache import load
    from voxtracer.kernels import raster as raster_mod
    from voxtracer.world.active import ActiveSoup

    t0 = time.monotonic()
    dev, soup, heights, terrain_rgb = load()
    log(f"cache load {time.monotonic() - t0:.1f}s: {len(soup)} boxes")
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)

    fcams = _cams(2, 1.0, jitter=1.0)
    fcam_args = [(np.asarray(c.pos, np.float32), c.basis()) for c in fcams]

    cull_npz = None
    if "--cull-npz" in sys.argv:
        cull_npz = sys.argv[sys.argv.index("--cull-npz") + 1]
    fsoup_args = None
    if cull_npz:
        try:
            z = np.load(cull_npz)
            fsoup_args = (jnp.asarray(z["lo"]), jnp.asarray(z["size"]),
                          jnp.asarray(z["attr"]))
            log(f"culled active set from {cull_npz}: {int(z['n_active'])} "
                "boxes (POSE-SPECIFIC: regenerate after changing _cams)")
        except FileNotFoundError:
            pass
    if fsoup_args is None:
        t0 = time.monotonic()
        act = ActiveSoup(soup, W, H, cap="auto", heights=heights)
        fsoup_args = act.active(*fcam_args[0])
        jax.block_until_ready(fsoup_args[0])
        log(f"active set {act.n_active} of {len(soup)} "
            f"(cull {time.monotonic() - t0:.1f}s, cap {len(fsoup_args[0])})")
        if cull_npz:
            np.savez(cull_npz, lo=np.asarray(fsoup_args[0]),
                     size=np.asarray(fsoup_args[1]),
                     attr=np.asarray(fsoup_args[2]),
                     n_active=act.n_active)
        if "--keep-act" not in sys.argv:
            del act  # frees the full-soup device arrays + cull scratch
            # (~2+ GB at flagship scale; bench.py does the same)

    if "--skip-raster" not in sys.argv:
        # fit pair/near from counters-only stage-2 probes
        fps = None
        fns = 0
        for op, basis in fcam_args:
            b = raster_mod.raster_bins(
                fsoup_args[0], fsoup_args[1], op, basis, dev.height,
                W, H, _stage=2,
            )
            fps = raster_mod.fit_pair_slots(
                np.asarray(b["n_tier"]), current=fps)
            fns = raster_mod.fit_near_slots(
                int(np.asarray(b["n_tier"])[0]), current=fns)
        log(f"stage-2 fitted: pair={fps} near={fns}")

        # one full probe at fitted slots for widen/fallback demand
        fws = None
        ffb = 0
        for op, basis in fcam_args:
            probe = raster_mod.raster_cast(
                *fsoup_args, op, basis, dev.height, W, H,
                want_voxel=False, pair_slots=fps, near_slots=fns,
            )
            fws = raster_mod.fit_widen_tiles(probe["n_widen"], current=fws)
            ffb = max(ffb, int(probe["n_fallback"]))
        fit_kw = dict(pair_slots=fps, near_slots=fns, widen_tiles=fws[0],
                      widen2_tiles=fws[1], widen3_tiles=fws[2])
        log(f"widen={fws} fallback_demand={ffb}")

        # demand is pose-exact (both poses probed); 1.15x absorbs the
        # _time_over reps' pose jitter — 2x oversizing doubles the
        # fallback cast's lane count for nothing at 14k-tile demand
        fcap = max(64, 1 << (int(ffb * 1.15) + 64 - 1).bit_length()
                   ) if ffb else 64

        from voxtracer.kernels.heightfield import build_height_mips

        hf_flat0, hf_offs0, _ = build_height_mips(heights)
        hf_flat0 = jax.device_put(hf_flat0)
        trgb = jnp.asarray(terrain_rgb, jnp.float32)
        use_svo_fb = "--svo-fallback" in sys.argv

        def f_flag(op, basis):
            res = raster_mod.raster_cast(
                *fsoup_args, op, basis, dev.height, W, H,
                want_voxel=False, fallback_tiles=fcap, **fit_kw,
            )
            if ffb and use_svo_fb:
                res = raster_mod.apply_fallback(
                    res, table, root, dev.height, op, basis, W, H)
            elif ffb:
                res = raster_mod.apply_fallback_hf(
                    res, hf_flat0, hf_offs0, dev.height, op, basis, W, H,
                    trgb)
            return res["t"]

        dt, _ = _time_over(f_flag, fcam_args)
        log(f"flagship exact 1080p {dt * 1e3:.0f} ms -> "
            f"{W * H / dt / 1e6:.2f} Mrays/s")

        if "--split" in sys.argv and ffb:
            # raster-only (not exact: fallback tiles unresolved) — the
            # delta vs f_flag is the fallback program's true cost
            def f_raster_only(op, basis):
                return raster_mod.raster_cast(
                    *fsoup_args, op, basis, dev.height, W, H,
                    want_voxel=False, fallback_tiles=fcap, **fit_kw,
                )["t"]

            dtr, _ = _time_over(f_raster_only, fcam_args)
            log(f"  raster-only {dtr * 1e3:.0f} ms; fallback share "
                f"{(dt - dtr) * 1e3:.0f} ms "
                f"({(dt - dtr) / dt * 100:.0f}%)")

    if "--skip-pt" not in sys.argv:
        import os

        from voxtracer.core.spectra import build_wl_to_rgb_lut
        from voxtracer.kernels.heightfield import build_height_mips
        from voxtracer.kernels.integrator import render_samples

        lut = jnp.asarray(build_wl_to_rgb_lut())
        sun = np.asarray([0.8, 10.2743, 3.7])
        sun_j = jnp.asarray((sun / np.linalg.norm(sun)).astype(np.float32))
        no_soup = "--no-soup" in sys.argv
        soup_kw = {}
        if not no_soup:
            pt_slots = None
            pt_near = 0
            for op, basis in fcam_args:
                b = raster_mod.raster_bins(
                    fsoup_args[0], fsoup_args[1], op, basis, dev.height,
                    PTW, PTH, jittered=True, _stage=2,
                )
                pt_slots = raster_mod.fit_pair_slots(
                    np.asarray(b["n_tier"]), current=pt_slots)
                pt_near = raster_mod.fit_near_slots(
                    int(np.asarray(b["n_tier"])[0]), current=pt_near)
            pt_nt = (-(-PTW // 8)) * (-(-PTH // 8))
            log(f"PT fitted: pair={pt_slots} near={pt_near}")
            soup_kw = dict(soup=fsoup_args,
                           soup_slots=(pt_slots, pt_near, pt_nt))
        t0 = time.monotonic()
        hf_flat, hf_offs, _ = build_height_mips(heights)
        hf_flat = jax.device_put(hf_flat)
        log(f"hf mips {time.monotonic() - t0:.1f}s"
            + (" (NO soup: hf primaries in trace_paths)" if no_soup else ""))

        def fpt(seeds, op, basis):
            return render_samples(
                table, root, dev.height, lut, op, basis, sun_j, seeds,
                PTW, PTH, max_bounces=8, fog_steps=64,
                hf_mips=hf_flat, hf_offsets=hf_offs,
                terrain_rgb=jnp.asarray(terrain_rgb, jnp.float32),
                **soup_kw,
            )

        fpt_args = [
            (jnp.asarray(np.frombuffer(os.urandom(12 * FK), np.uint32
                                       ).copy().reshape(FK, 3)), op, basis)
            for op, basis in fcam_args
        ]
        dt, _ = _time_over(fpt, fpt_args)
        log(f"flagship PT {dt * 1e3 / FK:.0f} ms/sample -> "
            f"{PTW * PTH * FK / dt / 1e6:.3f} Mpaths/s")


if __name__ == "__main__":
    main()
