"""TPU microbench: decompose the fused-PT batch cost.

Times, with the bench's forced-execution discipline:
  1. hf_raycast on bounce-like incoherent lanes at PT widths,
     min_bucket in {0, 1024, 8192};
  2. svo_raycast_bucketed on the same lanes (the round-2 engine);
  3. the fog march (raycast_planet) at the same widths;
  4. a k=8 fused render_samples batch (current code: deepened outer
     buckets + hf casts) for the end-to-end number.
"""

import sys
import time

import numpy as np

PTW, PTH, K = 853, 480, 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "cpu":  # CPU AOT entries are host-specific
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 5.0)
    sys.path.insert(0, "/root/repo")
    import os

    from bench import _cams, _time_over
    from voxtracer.core import camera as vcam
    from voxtracer.core.spectra import build_wl_to_rgb_lut
    from voxtracer.kernels import raster as raster_mod
    from voxtracer.kernels.heightfield import build_height_mips, hf_raycast
    from voxtracer.kernels.integrator import render_samples
    from voxtracer.kernels.traverse import svo_raycast_bucketed
    from voxtracer.kernels import atmosphere
    from voxtracer.world import worldgen
    from voxtracer.world.boxes import extract_boxes

    space = worldgen.generate(log2_size=10, verbose=False)
    dev = space.serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    flat, offs, hh = build_height_mips(space.heights)
    packs = {2: build_height_mips(space.heights, tile_log=2),
             3: (flat, offs, hh)}

    # bounce-like lanes: cast primaries from bench poses, reflect
    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    cams = _cams(4, 1024 / 8192.0)
    B = 1 << 21  # ~2M lanes (~ fused bounce-1 live width)
    n = 1 << 10

    def bounce_lanes(c):
        o, d = vcam.generate_rays(c, PTW, PTH)
        pr = hf_raycast(flat, offs, hh, jnp.asarray(o, jnp.float32),
                        jnp.asarray(d, jnp.float32))
        hit = np.asarray(pr["hit"]).reshape(-1)
        pos = np.asarray(o + np.asarray(pr["t"])[..., None] * d).reshape(
            -1, 3)[hit]
        nrm = np.asarray(pr["normal"]).reshape(-1, 3)[hit]
        reps = -(-B // len(pos))
        pos = np.tile(pos, (reps, 1))[:B]
        nrm = np.tile(nrm, (reps, 1))[:B]
        d2 = rng.standard_normal((B, 3)).astype(np.float32)
        d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
        flip = np.sum(d2 * nrm, axis=-1) < 0
        d2[flip] -= 2 * np.sum(d2[flip] * nrm[flip], axis=-1,
                               keepdims=True) * nrm[flip]
        return jnp.asarray(pos), jnp.asarray(d2)

    lanes = [bounce_lanes(c) for c in cams[:3]]

    sweep = [(2, 1024, 3), (3, 1024, 2), (3, 1024, 3), (3, 1024, 4),
             (3, 1024, 6), (3, 512, 3), (3, 2048, 3)]
    for tl, mb, ts in sweep:
        pf, po, ph = packs[tl]
        f = lambda p, d: hf_raycast(pf, po, ph, p, d,
                                    min_bucket=mb, tile_steps=ts)["t"]
        dt, _ = _time_over(f, lanes)
        log(f"hf cast {B} lanes TS={1 << tl} mb={mb} steps={ts}: "
            f"{dt * 1e3:.1f} ms ({dt / B * 1e9:.1f} ns/lane)")

    f = lambda p, d: svo_raycast_bucketed(
        table, root, dev.height, p, d, min_bucket=1024)["hit_t"
        if False else "t"]
    dt, _ = _time_over(f, lanes)
    log(f"svo cast {B} lanes mb=1024: {dt * 1e3:.1f} ms "
        f"({dt / B * 1e9:.1f} ns/lane)")

    # fog march at 2M lanes
    dens = jnp.full((B,), 0.5, jnp.float32)
    st = jnp.asarray(rng.integers(0, 2**32, (B, 3)).astype(np.uint32))
    f = lambda p, d: atmosphere.raycast_planet(st, p, d, dens, n_steps=64)[
        1]["t"]
    dt, _ = _time_over(f, lanes)
    log(f"fog march {B} lanes 64 steps: {dt * 1e3:.1f} ms")

    # end-to-end fused batch (current integrator code)
    soup = extract_boxes(dev)
    soup_args = (jnp.asarray(soup.lo), jnp.asarray(soup.size),
                 jnp.asarray(raster_mod.pack_box_attr(soup)))
    lut = jnp.asarray(build_wl_to_rgb_lut())
    sun = np.asarray([0.8, 10.2743, 3.7])
    sun_j = jnp.asarray((sun / np.linalg.norm(sun)).astype(np.float32))
    ps = None
    ns = 0
    for c in cams[:3]:
        b = raster_mod.raster_bins(
            soup_args[0], soup_args[1], np.asarray(c.pos, np.float32),
            c.basis(), dev.height, PTW, PTH, jittered=True, _stage=2,
        )
        ps = raster_mod.fit_pair_slots(b["n_tier"], current=ps)
        ns = raster_mod.fit_near_slots(b["n_tier"][0], current=ns)
    nt = (-(-PTW // 8)) * (-(-PTH // 8))
    for k in (K,):
        pt = jax.jit(lambda seeds, op, basis: render_samples(
            table, root, dev.height, lut, op, basis, sun_j, seeds,
            PTW, PTH, max_bounces=8, fog_steps=64,
            soup=soup_args, soup_slots=(ps, ns, nt),
            hf_mips=flat, hf_offsets=offs,
            terrain_rgb=jnp.asarray([0.5, 0.5, 0.5], jnp.float32),
        ))
        args = [
            (jnp.asarray(np.frombuffer(os.urandom(12 * k), np.uint32
                                       ).copy().reshape(k, 3)),
             np.asarray(c.pos, np.float32), c.basis())
            for c in cams[:3]
        ]
        t0 = time.monotonic()
        dt, _ = _time_over(pt, args)
        log(f"(fused compile+reps wall {time.monotonic() - t0:.0f}s)")
        log(f"fused k={k} deep-buckets: {dt * 1e3:.0f} ms/batch = "
            f"{dt * 1e3 / k:.0f} ms/sample -> "
            f"{PTW * PTH * k / dt / 1e6:.3f} Mpaths/s")


if __name__ == "__main__":
    main()
