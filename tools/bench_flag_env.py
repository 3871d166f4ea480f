"""Flagship (8192^3) exact-1080p frame with the ON-DEVICE envelope.

Round-5 levers on the 713 ms held / 825 ms fly round-4 frame
(VERDICT r4 task #2):
  (a) the device env build (skyline.build_skyline_env_device) replaces
      the 0.18 s/pose host build + upload — fly poses then get the same
      certified resume held poses do;
  (b) a RICHER envelope (bins/K/ratio) now costs ~ms instead of
      multiplying a host sweep, so the ladder-quantization undershoot
      (~7% at K=128) and the cell-bound inflation (~1/ratio) can be
      bought down; init_desc re-swept against the tighter prefix.

Usage: python tools/bench_flag_env.py [build|held|fly|all]
Run on an IDLE host (CLAUDE.md measurement traps).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cams, _time_over, _warm_device, log  # noqa: E402

W, H = 1920, 1080
FLOG2 = 13


def main():
    import jax
    import jax.numpy as jnp

    from voxtracer.core import camera as vcam
    from voxtracer.kernels import skyline as sky_mod
    from voxtracer.kernels.heightfield import (build_height_mips,
                                               hf_frame_cast)
    from voxtracer.world import worldgen

    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(__import__("pathlib").Path(__file__).parents[1]
                              / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    log("devices:", jax.devices())
    t0 = time.monotonic()
    fspace = worldgen.generate(log2_size=FLOG2, verbose=False)
    fdev = fspace.serialize()
    log(f"worldgen {time.monotonic() - t0:.1f}s")
    t0 = time.monotonic()
    fhf_flat, fhf_offs, _ = build_height_mips(fspace.heights)
    fhf_flat = jax.device_put(fhf_flat)
    ftrgb = jnp.asarray(fspace.terrain_rgb, jnp.float32)
    log(f"hf mips {time.monotonic() - t0:.1f}s")
    t0 = time.monotonic()
    levels = sky_mod.sky_levels_from_hf(fhf_flat, fhf_offs, fdev.height)
    jax.block_until_ready(levels["coarse"][0])
    log(f"device sky levels {time.monotonic() - t0:.1f}s")

    fcams = _cams(2, 1.0, jitter=1.0)
    fcam_args = [(np.asarray(c.pos, np.float32), c.basis())
                 for c in fcams]

    if what in ("build", "all"):
        # device env build alone (digest-forced, fresh origins per rep)
        def f_build(origin):
            e = sky_mod.build_skyline_env_device(levels, origin, K=128)
            return e["E"]

        args = [(np.asarray(c.pos, np.float64) + i * 0.37,)
                for i, c in enumerate(_cams(6, 1.0, jitter=3.0))]
        dt, _ = _time_over(f_build, args)
        log(f"device env build (4096, 128): {dt * 1e3:.1f} ms/pose")

        def f_build_big(origin):
            e = sky_mod.build_skyline_env_device(levels, origin,
                                                 bins=8192, K=256,
                                                 ratio=32)
            return e["E"]

        dt, _ = _time_over(f_build_big, args)
        log(f"device env build (8192, 256, ratio 32): {dt * 1e3:.1f} ms/pose")

    if what in ("held", "all"):
        # held-pose frame sweep: env prebuilt + dirs cached per pose
        def held_args_for(bins, K, ratio):
            out = []
            for (op, basis), c in zip(fcam_args, fcams):
                e = sky_mod.build_skyline_env_device(
                    levels, np.asarray(op, np.float64), bins=bins, K=K,
                    ratio=ratio)
                out.append((op, basis, e["E"], e["d0"], e["g"], e["K"],
                            jax.device_put(vcam.generate_rays(c, W, H)[1])))
            return out

        for (bins, K, ratio, idesc) in (
                (4096, 128, 16, 2),   # round-4 production shape
                (4096, 256, 16, 2),
                (8192, 256, 32, 2),
                (8192, 256, 32, 3),
                (8192, 256, 32, 4),
        ):
            def f_held(op, basis, E, d0, g, Kk, dirs, _id=idesc):
                return hf_frame_cast(
                    fhf_flat, fhf_offs, fdev.height, op, basis, W, H,
                    ftrgb, sky_env=(E, d0, g, Kk), ray_dirs=dirs,
                    tile_steps=6, init_desc=_id,
                )["t"]

            dt, _ = _time_over(f_held, held_args_for(bins, K, ratio))
            log(f"held (bins={bins}, K={K}, ratio={ratio}, "
                f"init_desc={idesc}): {dt * 1e3:.0f} ms")

    if what in ("fly", "all"):
        # fly frame: device env build charged IN-LOOP (the whole point)
        def f_fly(op, basis):
            e = sky_mod.build_skyline_env_device(
                levels, np.asarray(op, np.float64), bins=8192, K=256,
                ratio=32)
            return hf_frame_cast(
                fhf_flat, fhf_offs, fdev.height, op, basis, W, H,
                ftrgb, sky_env=(e["E"], e["d0"], e["g"], e["K"]),
                tile_steps=6, init_desc=3,
            )["t"]

        dt, _ = _time_over(f_fly, fcam_args)
        log(f"fly with in-loop device env (8192/256/r32): {dt * 1e3:.0f} ms")


if __name__ == "__main__":
    main()
