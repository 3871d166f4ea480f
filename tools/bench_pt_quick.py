"""Quick TPU check of fused path tracing (853x480, 1024^3): k samples
in one trace_paths call with demand-probed jittered raster primaries."""

import sys
import time

import numpy as np

PTW, PTH = 853, 480
K = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    if "--nee-off" in sys.argv:
        import os as _os0

        _os0.environ["VOXT_PT_PROF"] = "nee_off"
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "cpu":  # CPU AOT entries are host-specific
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 5.0)
    sys.path.insert(0, "/root/repo")
    import os

    from bench import _cams, _time_over
    from voxtracer.core.spectra import build_wl_to_rgb_lut
    from voxtracer.kernels import raster as raster_mod
    from voxtracer.kernels.integrator import render_samples
    from voxtracer.world import worldgen
    from voxtracer.world.boxes import extract_boxes

    space = worldgen.generate(log2_size=10, verbose=False)
    dev = space.serialize()
    table = jnp.asarray(dev.table.view(np.int32))
    root = np.int32(dev.root)
    soup = extract_boxes(dev)
    soup_args = (jnp.asarray(soup.lo), jnp.asarray(soup.size),
                 jnp.asarray(raster_mod.pack_box_attr(soup)))
    lut = jnp.asarray(build_wl_to_rgb_lut())
    sun = np.asarray([0.8, 10.2743, 3.7])
    sun_j = jnp.asarray((sun / np.linalg.norm(sun)).astype(np.float32))

    cams = _cams(4, 1024 / 8192.0)
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
    log(f"slots {ps} near {ns}")

    hf_args = {}
    if "--hf" in sys.argv:
        from voxtracer.kernels.heightfield import build_height_mips

        flat, offsets, hh = build_height_mips(space.heights)
        assert hh == dev.height
        hf_args = dict(hf_mips=flat, hf_offsets=offsets,
                       terrain_rgb=jnp.asarray([0.5, 0.5, 0.5],
                                               jnp.float32))
        log("heightfield engine ON")
        if "--sunmaps" in sys.argv:
            from voxtracer.kernels import sunshadow

            t0 = time.monotonic()
            smaps = sunshadow.build(space.heights, sun)
            if smaps is not None:
                smaps = dict(smaps, t_near=jnp.asarray(smaps["t_near"]),
                             t_far=jnp.asarray(smaps["t_far"]))
            log(f"sun maps {'ON' if smaps is not None else 'gated'} "
                f"(build {time.monotonic() - t0:.1f}s)")
            hf_args["sun_maps"] = smaps

    pt = jax.jit(lambda seeds, op, basis: render_samples(
        table, root, dev.height, lut, op, basis, sun_j, seeds,
        PTW, PTH, max_bounces=8, fog_steps=64,
        soup=soup_args, soup_slots=(ps, ns, nt), **hf_args,
    ))
    args = [
        (jnp.asarray(np.frombuffer(os.urandom(12 * K), np.uint32
                                   ).copy().reshape(K, 3)),
         np.asarray(c.pos, np.float32), c.basis())
        for c in cams[:3]
    ]
    t0 = time.monotonic()
    dt, _ = _time_over(pt, args)
    log(f"(compile+3 reps wall {time.monotonic() - t0:.0f}s)")
    log(f"fused k={K}: {dt * 1e3:.0f} ms/batch = {dt * 1e3 / K:.0f} "
        f"ms/sample -> {PTW * PTH * K / dt / 1e6:.3f} Mpaths/s")


if __name__ == "__main__":
    main()
