"""Measure a FULL-FRAME heightfield cast as the flagship primary engine.

Hypothesis (round 3): at 8192^3 the exact raster frame is box-count-bound
(1183 ms raster program + 303 ms hf fallback for ~878k horizon rays,
tools/bench_flagship.py --split). The hf fallback resolves worst-case
grazing rays at ~0.35 us/ray WITH t_min resume; a full 1080p frame is
2.07M mostly-easy rays, so a straight hf_raycast over the whole frame may
beat the entire raster pipeline on unedited terrain — and it needs no
soup, no cull, no bins (skips the ~30 s flagship active-set build too).

Usage: python tools/bench_hf_frame.py [--buckets 2048,4096,8192]
                                      [--steps 3] [--res WxH] [--cone]
                                      [--sky]

--cone additionally times the cone-march-prefixed frame
(kernels/conemarch.py): per-8x8-tile certified-air prefixes seed the
per-pixel t_min resume. The timed function INCLUDES the cone march
(it is per-pose work, like the cast itself).

--sky additionally times skyline-certified frames (kernels/skyline.py:
per-pose horizon table retires provably-sky tiles instantly), alone
and — with --cone — composed with the cone prefix. The timed function
INCLUDES the per-pose host skyline build (the pyramid is per-world).

--env times the round-4 per-RAY horizon envelope
(skyline.build_skyline_env / skyline_env_tmin): every lane resumes at
its azimuth's certified-air ladder distance. Reported twice: with the
per-pose HOST build inside the timed function (fly-through cost) and
with it prebuilt (pose-held cost — the production loop holds a pose for
1000 samples, main.rs:112). Composes with --cone.
"""

from __future__ import annotations

import sys
import time

import numpy as np

W, H = 1920, 1080


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    global W, H
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    sys.path.insert(0, "/root/repo")
    from bench import _cams, _time_over
    from tools.flagship_cache import load
    from voxtracer.core import camera as vcam
    from voxtracer.kernels.heightfield import build_height_mips, hf_raycast

    if "--res" in sys.argv:
        W, H = map(int, sys.argv[sys.argv.index("--res") + 1].split("x"))
    buckets = [4096]
    if "--buckets" in sys.argv:
        buckets = [int(x) for x in
                   sys.argv[sys.argv.index("--buckets") + 1].split(",")]
    steps = [3]
    if "--steps" in sys.argv:
        steps = [int(x) for x in
                 sys.argv[sys.argv.index("--steps") + 1].split(",")]
    tls = [3]
    if "--tl" in sys.argv:
        tls = [int(x) for x in
               sys.argv[sys.argv.index("--tl") + 1].split(",")]

    t0 = time.monotonic()
    dev, soup, heights, terrain_rgb = load()
    log(f"cache load {time.monotonic() - t0:.1f}s")
    del soup  # not needed: the whole point

    fcams = _cams(2, 1.0, jitter=1.0)
    cam_args = [
        (jax.device_put(vcam.generate_rays(c, W, H)[0]),
         jax.device_put(vcam.generate_rays(c, W, H)[1]))
        for c in fcams
    ]

    cone = None
    if "--cone" in sys.argv:
        from voxtracer.kernels.conemarch import (build_cone_mips,
                                                 frame_tile_bundles)

        ctile = 8
        if "--tile" in sys.argv:
            ctile = int(sys.argv[sys.argv.index("--tile") + 1])
        citers = 192
        if "--iters" in sys.argv:
            citers = int(sys.argv[sys.argv.index("--iters") + 1])
        t0 = time.monotonic()
        cone = build_cone_mips(heights)
        cone = (jax.device_put(cone[0]), cone[1], cone[2])
        jax.block_until_ready(cone[0])
        log(f"cone mips {time.monotonic() - t0:.1f}s "
            f"({cone[0].size * 4 / 1e6:.1f} MB) tile={ctile} "
            f"iters={citers}")
        cone_args = []
        for c, (o, d) in zip(fcams, cam_args):
            dc, sig, nmin = frame_tile_bundles(
                np.asarray(c.basis(), np.float32), W, H, tile=ctile)
            cone_args.append((
                jax.device_put(jnp.asarray(c.pos, jnp.float32)),
                d, jax.device_put(dc), jax.device_put(sig),
                jax.device_put(nmin)))

    env_mips = None
    if "--env" in sys.argv:
        from voxtracer.kernels.skyline import (build_sky_mips,
                                               build_skyline_env,
                                               skyline_env_tmin)

        ebins = 4096
        if "--env-bins" in sys.argv:
            ebins = int(sys.argv[sys.argv.index("--env-bins") + 1])
        eK = 64
        if "--env-K" in sys.argv:
            eK = int(sys.argv[sys.argv.index("--env-K") + 1])
        t0 = time.monotonic()
        env_mips = build_sky_mips(heights)
        log(f"env sky mips {time.monotonic() - t0:.1f}s")
        t0 = time.monotonic()
        envs = [build_skyline_env(env_mips, np.asarray(c.pos, np.float64),
                                  bins=ebins, K=eK)
                for c in fcams]
        log(f"env build bins={ebins} K={eK} "
            f"{(time.monotonic() - t0) / len(fcams):.2f}s/pose")
        env_args = [
            (jax.device_put(jnp.asarray(c.pos, jnp.float32)),
             np.asarray(c.pos, np.float64), d,
             jax.device_put(jnp.asarray(e["E"])), e["d0"], e["g"], e["K"])
            for c, (o, d), e in zip(fcams, cam_args, envs)
        ]

    sky_mips = None
    if "--sky" in sys.argv:
        from voxtracer.kernels.skyline import build_sky_mips

        t0 = time.monotonic()
        sky_mips = build_sky_mips(heights)
        log(f"sky mips {time.monotonic() - t0:.1f}s")
        sky_args = [
            (jax.device_put(jnp.asarray(c.pos, jnp.float32)),
             np.asarray(c.pos, np.float32),
             np.asarray(c.basis(), np.float32), d)
            for c, (o, d) in zip(fcams, cam_args)
        ]

    for tl in tls:
        t0 = time.monotonic()
        hf_flat, hf_offs, height = build_height_mips(heights, tile_log=tl)
        hf_flat = jax.device_put(hf_flat)
        jax.block_until_ready(hf_flat)
        log(f"hf mips tl={tl} {time.monotonic() - t0:.1f}s "
            f"(height={height})")
        for ts in steps:
            for mb in buckets:
                def f(o, d, _mb=mb, _ts=ts):
                    return hf_raycast(hf_flat, hf_offs, height,
                                      o.reshape(-1, 3), d.reshape(-1, 3),
                                      min_bucket=_mb, tile_steps=_ts)["t"]

                dt, _ = _time_over(f, cam_args)
                log(f"hf full-frame {W}x{H} tl={tl} ts={ts} mb={mb}: "
                    f"{dt * 1e3:.0f} ms -> {W * H / dt / 1e6:.2f} Mrays/s")

                if env_mips is not None:
                    idesc = 0
                    if "--idesc" in sys.argv:
                        idesc = int(
                            sys.argv[sys.argv.index("--idesc") + 1])

                    def fenv(o, onp, d, E, d0, g, K, _mb=mb, _ts=ts):
                        tm = skyline_env_tmin(E, d.reshape(-1, 3),
                                              d0, g, K)
                        return hf_raycast(hf_flat, hf_offs, height, o,
                                          d.reshape(-1, 3),
                                          min_bucket=_mb, tile_steps=_ts,
                                          t_min=tm,
                                          init_desc=idesc)["t"]

                    dt, _ = _time_over(fenv, env_args)
                    log(f"hf+env(held) {W}x{H} tl={tl} ts={ts} mb={mb}: "
                        f"{dt * 1e3:.0f} ms -> "
                        f"{W * H / dt / 1e6:.2f} Mrays/s")

                    def fenv_fly(o, onp, d, E, d0, g, K, _mb=mb, _ts=ts):
                        e = build_skyline_env(env_mips, onp)
                        tm = skyline_env_tmin(
                            jnp.asarray(e["E"]), d.reshape(-1, 3),
                            e["d0"], e["g"], e["K"])
                        return hf_raycast(hf_flat, hf_offs, height, o,
                                          d.reshape(-1, 3),
                                          min_bucket=_mb, tile_steps=_ts,
                                          t_min=tm)["t"]

                    dt, _ = _time_over(fenv_fly, env_args)
                    log(f"hf+env(fly)  {W}x{H} tl={tl} ts={ts} mb={mb}: "
                        f"{dt * 1e3:.0f} ms -> "
                        f"{W * H / dt / 1e6:.2f} Mrays/s")
                    o0, _, d0v, E0, dd0, gg0, KK0 = env_args[0]
                    tm0 = np.asarray(skyline_env_tmin(
                        E0, d0v.reshape(-1, 3), dd0, gg0, KK0))
                    log(f"  env certified: {float((tm0 > 0).mean()):.1%} "
                        f"lanes, {float((tm0 >= 1e37).mean()):.1%} "
                        f"all-miss")

                    if cone is not None:
                        ce_args = [
                            ea + (ca[2], ca[3], ca[4])
                            for ea, ca in zip(env_args, cone_args)
                        ]

                        def fce(o, onp, d, E, d0, g, K, dc, sig, nmin,
                                _mb=mb, _ts=ts):
                            from voxtracer.kernels.conemarch import \
                                cone_prefix
                            tm = skyline_env_tmin(E, d.reshape(-1, 3),
                                                  d0, g, K)
                            S = cone_prefix(cone[0], cone[1], cone[2],
                                            height, o, dc, sig,
                                            max_iters=citers)
                            ty, tx = -(-H // ctile), -(-W // ctile)
                            tmt = (S * nmin).reshape(ty, tx)
                            tmt = jnp.repeat(jnp.repeat(tmt, ctile, 0),
                                             ctile, 1)[:H, :W].reshape(-1)
                            tm = jnp.maximum(tm, tmt)
                            return hf_raycast(hf_flat, hf_offs, height,
                                              o, d.reshape(-1, 3),
                                              min_bucket=_mb,
                                              tile_steps=_ts,
                                              t_min=tm)["t"]

                        dt, _ = _time_over(fce, ce_args)
                        log(f"hf+cone+env(held) {W}x{H} tl={tl} ts={ts} "
                            f"mb={mb}: {dt * 1e3:.0f} ms -> "
                            f"{W * H / dt / 1e6:.2f} Mrays/s")

                if sky_mips is not None:
                    from voxtracer.kernels.skyline import (build_skyline,
                                                           tile_sky)

                    ty8, tx8 = -(-H // 8), -(-W // 8)

                    def fsky(o, onp, bnp, d, _mb=mb, _ts=ts,
                             _cone=None, _ca=None):
                        sky = build_skyline(sky_mips, onp)
                        mask = tile_sky(sky, bnp, W, H)
                        tmt = jnp.where(jnp.asarray(mask),
                                        jnp.float32(1e30), jnp.float32(0))
                        if _cone is not None:
                            dc, sig, nmin = _ca
                            S = cone_prefix(_cone[0], _cone[1], _cone[2],
                                            height, o, dc, sig,
                                            max_iters=citers)
                            tmt = jnp.maximum(tmt, S * nmin)
                        tm = jnp.repeat(jnp.repeat(
                            tmt.reshape(ty8, tx8), 8, 0), 8, 1)
                        tm = tm[:H, :W].reshape(-1)
                        return hf_raycast(hf_flat, hf_offs, height, o,
                                          d.reshape(-1, 3),
                                          min_bucket=_mb, tile_steps=_ts,
                                          t_min=tm)["t"]

                    dt, _ = _time_over(fsky, sky_args)
                    log(f"hf+sky     {W}x{H} tl={tl} ts={ts} mb={mb}: "
                        f"{dt * 1e3:.0f} ms -> "
                        f"{W * H / dt / 1e6:.2f} Mrays/s")
                    onp0 = sky_args[0][1]
                    m0 = tile_sky(build_skyline(sky_mips, onp0),
                                  sky_args[0][2], W, H)
                    log(f"  sky tiles certified: {m0.mean():.1%}")

                    if cone is not None:
                        from voxtracer.kernels.conemarch import \
                            cone_prefix
                        cs_args = [
                            sa + (cone,
                                  (ca[2], ca[3], ca[4]))
                            for sa, ca in zip(sky_args, cone_args)
                        ]

                        def fcs(o, onp, bnp, d, _cone, _ca,
                                _mb=mb, _ts=ts):
                            return fsky(o, onp, bnp, d, _mb=_mb,
                                        _ts=_ts, _cone=_cone, _ca=_ca)

                        dt, _ = _time_over(fcs, cs_args)
                        log(f"hf+cone+sky {W}x{H} tl={tl} ts={ts} "
                            f"mb={mb}: {dt * 1e3:.0f} ms -> "
                            f"{W * H / dt / 1e6:.2f} Mrays/s")

                if cone is not None:
                    from voxtracer.kernels.conemarch import cone_prefix

                    ty, tx = -(-H // ctile), -(-W // ctile)

                    def fc(o, d, dc, sig, nmin, _mb=mb, _ts=ts):
                        S = cone_prefix(cone[0], cone[1], cone[2],
                                        height, o, dc, sig,
                                        max_iters=citers)
                        tm = (S * nmin).reshape(ty, tx)
                        tm = jnp.repeat(jnp.repeat(tm, ctile, 0),
                                        ctile, 1)
                        tm = tm[:H, :W].reshape(-1)
                        return hf_raycast(hf_flat, hf_offs, height, o,
                                          d.reshape(-1, 3),
                                          min_bucket=_mb, tile_steps=_ts,
                                          t_min=tm)["t"]

                    dt, _ = _time_over(fc, cone_args)
                    log(f"hf+cone    {W}x{H} tl={tl} ts={ts} mb={mb} "
                        f"tile={ctile} it={citers}: {dt * 1e3:.0f} ms -> "
                        f"{W * H / dt / 1e6:.2f} Mrays/s")

                    if "--quality" in sys.argv:
                        # certificate quality: mean fraction of the true
                        # hit t covered by the resumed t_min, split by
                        # ground/sky lanes
                        o, d, dc, sig, nmin = cone_args[0]
                        S = cone_prefix(cone[0], cone[1], cone[2],
                                        height, o, dc, sig,
                                        max_iters=citers)
                        tm = (S * nmin).reshape(ty, tx)
                        tm = jnp.repeat(jnp.repeat(tm, ctile, 0),
                                        ctile, 1)[:H, :W].reshape(-1)
                        r = hf_raycast(hf_flat, hf_offs, height, o,
                                       d.reshape(-1, 3), min_bucket=mb,
                                       tile_steps=ts)
                        hit = np.asarray(r["hit"])
                        t = np.asarray(r["t"])
                        tmn = np.asarray(tm)
                        g = hit
                        frac = np.where(t > 0, tmn / np.maximum(t, 1e-9),
                                        0.0)
                        log(f"  quality: ground lanes {g.mean():.2%}, "
                            f"mean covered frac (ground) "
                            f"{frac[g].mean():.3f}, median "
                            f"{np.median(frac[g]):.3f}; sky t_min "
                            f"mean {tmn[~g].mean():.0f} "
                            f"(world diag {1.73 * 2**height:.0f})")


if __name__ == "__main__":
    main()
