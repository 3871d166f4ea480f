"""Bimodal-timing probe: time the SAME raster program twice in one
process on disjoint salted pose sets. Hypothesis (from bench/profiler/
sweep disagreement at identical configs): the first timed window in a
process measures ~2.4x slow — if rep2 is fast, _time_over needs a
throwaway timed pass."""

import sys
import time

import numpy as np

W, H = 1920, 1080


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    sys.path.insert(0, "/root/repo")
    from bench import _cams, _time_over
    from voxtracer.kernels import raster as raster_mod
    from voxtracer.world import worldgen
    from voxtracer.world.active import ActiveSoup
    from voxtracer.world.boxes import extract_boxes

    space = worldgen.generate(log2_size=10, verbose=False)
    dev = space.serialize()
    soup = extract_boxes(dev)
    act = ActiveSoup(soup, W, H, cap="auto",
                     heights=getattr(space, "heights", None))
    cams = _cams(15, 1024 / 8192.0)
    cam_args = [(np.asarray(c.pos, np.float32), c.basis()) for c in cams]
    pose_soups = [tuple(act.active(op, basis)) for op, basis in cam_args]

    ps = ns = ws = None
    for sa, (op, basis) in zip(pose_soups[:3], cam_args[:3]):
        probe = raster_mod.raster_cast(
            *sa, op, basis, dev.height, W, H, want_voxel=False)
        ps = raster_mod.fit_pair_slots(probe["n_tier"], current=ps)
        ns = raster_mod.fit_near_slots(probe["n_tier"][0], current=ns or 0)
        ws = raster_mod.fit_widen_tiles(probe["n_widen"], current=ws)
    kw = dict(pair_slots=ps, near_slots=ns, widen_tiles=ws[0],
              widen2_tiles=ws[1], widen3_tiles=ws[2], fallback_tiles=64)

    def f(lo_a, sz_a, at_a, op, basis):
        return raster_mod.raster_cast(
            lo_a, sz_a, at_a, op, basis, dev.height, W, H,
            want_voxel=False, **kw)["t"]

    pose_args = [sa + ca for sa, ca in zip(pose_soups, cam_args)]
    for i in range(3):
        batch = pose_args[5 * i:5 * i + 5]
        dt, _ = _time_over(f, batch)
        log(f"window {i}: {dt * 1e3:.1f} ms -> {W * H / dt / 1e6:.2f} Mrays/s")
        time.sleep(1)


if __name__ == "__main__":
    main()
