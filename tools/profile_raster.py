"""Stage-level profile of the box rasterizer at the bench config.

Times raster_cast at successive `_stage` early-returns (each stage
program is DCE'd to that stage's true dependencies, so deltas between
consecutive stages approximate per-stage cost), plus bins-vs-resolve
split, and prints the tier demand counters that should size pair_slots.

Run on an otherwise-idle host (PERF.md): concurrent CPU load starves the
axon client.
"""

from __future__ import annotations

import sys
import time

import numpy as np

LOG2_SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 10
W, H = 1920, 1080


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "cpu":  # CPU AOT entries are host-specific
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          5.0)

    sys.path.insert(0, "/root/repo")
    from bench import _cams, _time_over
    from voxtracer.kernels import raster as raster_mod
    from voxtracer.world import worldgen
    from voxtracer.world.boxes import extract_boxes

    t0 = time.monotonic()
    space = worldgen.generate(log2_size=LOG2_SIZE, verbose=False)
    dev = space.serialize()
    log(f"worldgen {time.monotonic() - t0:.1f}s")
    t0 = time.monotonic()
    soup = extract_boxes(dev)
    log(f"soup {len(soup)} boxes in {time.monotonic() - t0:.1f}s")

    s = (1 << LOG2_SIZE) / 8192.0
    cams = _cams(4, s)
    cam_args = [(np.asarray(c.pos, np.float32), c.basis()) for c in cams]

    # production shape: the pose-culled active soup (world/active.py).
    # All poses share one fitted cap so every stage profiles one shape.
    from voxtracer.world.active import ActiveSoup

    heights = getattr(space, "heights", None)
    act = ActiveSoup(soup, W, H, heights=heights)
    n_act = 0
    for op, basis in cam_args:
        act.active(op, basis)
        n_act = max(n_act, act.n_active)
    acap = max(1 << 12, 1 << (int(n_act * 1.06) - 1).bit_length())
    act = ActiveSoup(soup, W, H, cap=acap, heights=heights)
    log(f"active cull: max {n_act} of {len(soup)} -> cap {acap}")
    pose_soups = [tuple(act.active(op, basis)) for op, basis in cam_args]
    pose_args = [ps + ca for ps, ca in zip(pose_soups, cam_args)]
    soup_args = pose_soups[0]

    # tier demand at this config (sizes pair_slots)
    ps = ns = ws = None
    for lo_a, sz_a, at_a, op, basis in pose_args:
        r = raster_mod.raster_cast(lo_a, sz_a, at_a, op, basis,
                                   dev.height, W, H, want_voxel=False)
        ps = raster_mod.fit_pair_slots(r["n_tier"], current=ps)
        ns = raster_mod.fit_near_slots(r["n_tier"][0], current=ns or 0)
        ws = raster_mod.fit_widen_tiles(r["n_widen"], current=ws)
    log("n_tier:", np.asarray(r["n_tier"]))
    log("n_pair:", int(r["n_pair"]), " n_widen:", np.asarray(r["n_widen"]),
        " n_fallback:", int(r["n_fallback"]),
        " overflow:", bool(r["overflow"]))
    log("slots:", ps, ns, ws)

    def stage_fn(stg):
        def f(lo_a, sz_a, at_a, op, basis):
            out = raster_mod.raster_cast(
                lo_a, sz_a, at_a, op, basis, dev.height, W, H,
                want_voxel=False, pair_slots=ps, near_slots=ns,
                widen_tiles=ws[0], widen2_tiles=ws[1], widen3_tiles=ws[2],
                fallback_tiles=64, _stage=stg,
            )
            if stg == 0:
                return out["t"]
            return out

        return f

    prev = 0.0
    for stg in (3, 4, 5, 6, 7, 8, 0):
        try:
            dt, _ = _time_over(stage_fn(stg), pose_args)
            log(f"stage {stg}: {dt * 1e3:7.1f} ms  (delta "
                f"{(dt - prev) * 1e3:+7.1f} ms)")
            prev = dt
        except Exception as e:
            log(f"stage {stg} failed: {type(e).__name__} {str(e)[:160]}")

    # bins alone (the pose-only half) vs full
    def f_bins(lo_a, sz_a, at_a, op, basis):
        return raster_mod.raster_bins(
            lo_a, sz_a, op, basis, dev.height, W, H,
        )["cand_rows"]

    dt, _ = _time_over(f_bins, pose_args)
    log(f"raster_bins (pose half): {dt * 1e3:7.1f} ms")


if __name__ == "__main__":
    main()
