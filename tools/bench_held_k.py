"""Pose-held exact-raster progressive rate vs jitter-batch width KS.

The reference's production loop holds a pose for 1000 samples
(main.rs:112); with the pose bins cached, each progressive sample pays
only the jittered resolve (BENCH_r04: 19.6 ms/sample at 1920x1080 over
the 1024^3 terrain soup). raster_cast already resolves a LEADING
sample axis of jittered ray grids in one pass — the per-tile widen-round
candidate row gathers (serialized, ~13 ns/row) and the fixed program
overheads are then paid once for all KS samples while the slab math
(vector work) scales with KS. This sweep measures the amortized
per-sample cost at KS = 1/2/4/8 to pick the production batch width
(VERDICT r4 task #1: close the 120 Mrays/s north star pose-held).

Run on an IDLE host (CLAUDE.md measurement traps). ~5 min incl compiles.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cams, _time_over, log  # noqa: E402

LOG2_SIZE = 10
W, H = 1920, 1080


def main():
    import jax
    import jax.numpy as jnp

    from voxtracer.core import camera as vcam
    from voxtracer.core import rng as vrng
    from voxtracer.kernels import raster as raster_mod
    from voxtracer.world import worldgen
    from voxtracer.world.active import ActiveSoup
    from voxtracer.world.boxes import extract_boxes

    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(__import__("pathlib").Path(__file__).parents[1]
                              / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    log("devices:", jax.devices())
    space = worldgen.generate(log2_size=LOG2_SIZE, verbose=False)
    dev = space.serialize()
    soup = extract_boxes(dev)
    s = (1 << LOG2_SIZE) / 8192.0
    cam = _cams(1, s)[0]
    op0, basis0 = np.asarray(cam.pos, np.float32), cam.basis()

    act = ActiveSoup(soup, W, H, cap="auto",
                     heights=getattr(space, "heights", None))
    lo0, sz0, at0 = act.active(op0, basis0)
    log(f"active {act.n_active} of {len(soup)} boxes")

    bj = raster_mod.raster_bins(lo0, sz0, op0, basis0, dev.height, W, H,
                                jittered=True, _stage=2)
    psj = raster_mod.fit_pair_slots(bj["n_tier"])
    nsj = raster_mod.fit_near_slots(bj["n_tier"][0])
    bins_j = raster_mod.raster_bins(
        lo0, sz0, op0, basis0, dev.height, W, H,
        pair_slots=psj, near_slots=nsj, jittered=True, box_attr=at0,
    )
    log(f"slots pair={psj} near={nsj}")

    pyx, pxx = np.meshgrid(np.arange(H, dtype=np.int32),
                           np.arange(W, dtype=np.int32), indexing="ij")
    pyx, pxx = jnp.asarray(pyx), jnp.asarray(pxx)
    basis_j = jnp.asarray(basis0)

    results = {}
    for KS in (1, 2, 4, 8, 16, 32):

        @jax.jit
        def f_held(seeds, lo_a, sz_a, at_a, bins):
            def mk(seed):
                st = vrng.seed_pixels(seed, pxx, pyx)
                _, rnd = vrng.random3(st)
                ld = vcam.pixel_ndc(pxx, pyx, W, H)
                return vcam.ray_directions(basis_j, ld,
                                           jitter=rnd[..., :2], height=H)

            dj = jax.vmap(mk)(seeds)  # (KS, H, W, 3)
            if KS == 1:
                dj = dj[0]
            return raster_mod.raster_cast(
                lo_a, sz_a, at_a, op0, basis0, dev.height, W, H,
                ray_dirs=dj, bins=bins, want_voxel=False,
                pair_slots=psj, near_slots=nsj,
            )["t"]

        args = [
            (jnp.asarray(np.frombuffer(os.urandom(12 * KS), np.uint32)
                         .copy().reshape(KS, 3)), lo0, sz0, at0, bins_j)
            for _ in range(4)
        ]
        t0 = time.monotonic()
        dt, _ = _time_over(f_held, args)
        per = dt / KS
        results[KS] = per
        log(f"KS={KS}: {dt * 1e3:.1f} ms/call -> {per * 1e3:.2f} ms/sample "
            f"= {W * H / per / 1e6:.1f} Mrays/s "
            f"(compile+timing {time.monotonic() - t0:.0f}s)")

    best = min(results, key=results.get)
    log(f"best KS={best}: {results[best] * 1e3:.2f} ms/sample = "
        f"{W * H / results[best] / 1e6:.1f} Mrays/s")


if __name__ == "__main__":
    main()
