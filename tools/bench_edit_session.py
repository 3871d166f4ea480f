"""Flagship editing session on TPU: edit-to-preview latency (task r4 #4).

Round 3's editing cliff was ~50x (an edit dropped the hf engine and the
preview fell to multi-second SVO walks); round 4 removed it two ways —
heightfield-EXACT edits (top-voxel place/delete of terrain columns)
re-derive the heightmap and patch the device mips in place, other edits
ride a bounded-box hybrid re-cast — but the fix was only ever
CPU-correctness-tested (tests/test_hf_edit.py). This scripts a REAL
50-edit flagship session through the production API
(Renderer.apply_edits + preview_frame) and reports edit-to-preview
latency percentiles, measured on the TPU.

Session shape: 25 top-voxel edits (the hf-exact path) followed by 25
overhang/floating placements (the bounds-box hybrid path) — the order
matters because the first non-exact edit retires the exact path for the
session (render/driver.py apply_edits). Warmup edits compile each
program class first; the timed numbers are steady-state (the reference
recompiles nothing but re-uploads the whole node table per edit,
fragment.rs:274-313).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _warm_device, log  # noqa: E402

W, H = 1920, 1080
FLOG2 = 13
N_EXACT = 25
N_OVERHANG = 25


def run_session(log2_size=FLOG2, width=W, height=H, n_exact=N_EXACT,
                n_overhang=N_OVERHANG, warm=True):
    import jax
    import jax.numpy as jnp

    from voxtracer.core import camera as vcam
    from voxtracer.render.driver import Renderer
    from voxtracer.world import worldgen

    t0 = time.monotonic()
    space = worldgen.generate(log2_size=log2_size, verbose=False)
    dev = space.serialize()
    log(f"worldgen {time.monotonic() - t0:.1f}s")
    r = Renderer(dev, width, height)
    s = (1 << log2_size) / 8192.0
    cam = vcam.Camera(pos=tuple(np.asarray(vcam.DEFAULT_POSE.pos) * s),
                      yaw=vcam.DEFAULT_POSE.yaw,
                      pitch=vcam.DEFAULT_POSE.pitch)
    sun = np.asarray([0.8, 10.2743, 3.7])

    def preview():
        img = r.preview_frame(cam, sun)
        assert img is not None, "preview engine unavailable"
        return float(jnp.asarray(img).sum())  # force execution (axon)

    heights = np.asarray(space.heights)
    n = heights.shape[0]
    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    cx, cz = int(cam.pos[0]), int(cam.pos[2])

    def edit_col():
        x = int(np.clip(cx + rng.integers(-400, 400), 1, n - 2))
        z = int(np.clip(cz + rng.integers(-400, 400), 1, n - 2))
        return x, z

    trgb = tuple(space.terrain_rgb)
    # initial compile + steady-state warm (exact frame program)
    t0 = time.monotonic()
    preview()
    log(f"first preview (compile) {time.monotonic() - t0:.1f}s")
    if warm:
        _warm_device()

    lat_exact = []
    for i in range(n_exact):
        x, z = edit_col()
        h = int(space.heights[x, z])
        t0 = time.monotonic()
        if i % 2 == 0:  # place one terrain-colored voxel on the top
            space.set((x, h, z), trgb)
            r.apply_edits(space, edits=[(x, h, z)])
        else:  # delete the top voxel
            space.set((x, h - 1, z), None)
            r.apply_edits(space, edits=[(x, h - 1, z)])
        preview()
        lat_exact.append(time.monotonic() - t0)

    # overhang phase: first edit switches to the bounds-box hybrid and
    # compiles hf_raycast_edited — warm it out of the timed set
    x, z = edit_col()
    h = int(space.heights[x, z])
    t0 = time.monotonic()
    space.set((x, h + 4, z), (1.0, 1.0, 1.0))
    r.apply_edits(space, edits=[(x, h + 4, z)])
    preview()
    log(f"first overhang edit (compile) {time.monotonic() - t0:.1f}s")
    if warm:
        _warm_device()

    lat_over = []
    for i in range(n_overhang):
        x, z = edit_col()
        h = int(space.heights[x, z])
        t0 = time.monotonic()
        space.set((x, h + 3 + (i % 4), z), (1.0, 1.0, 1.0))
        r.apply_edits(space, edits=[(x, h + 3 + (i % 4), z)])
        preview()
        lat_over.append(time.monotonic() - t0)

    def pct(v):
        v = np.asarray(v)
        return dict(p50=round(float(np.percentile(v, 50)), 3),
                    p90=round(float(np.percentile(v, 90)), 3),
                    max=round(float(v.max()), 3))

    out = dict(exact=pct(lat_exact), overhang=pct(lat_over),
               n=len(lat_exact) + len(lat_over))
    log("edit-to-preview latency (s):", json.dumps(out))
    return out


if __name__ == "__main__":
    import jax

    try:
        if jax.default_backend() != "cpu":
            jax.config.update(
                "jax_compilation_cache_dir",
                str(__import__("pathlib").Path(__file__).parents[1]
                    / ".jax_cache"))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    smoke = os.environ.get("BENCH_SMOKE") == "1"
    out = run_session(
        log2_size=7 if smoke else FLOG2,
        width=256 if smoke else W, height=144 if smoke else H,
        n_exact=3 if smoke else N_EXACT,
        n_overhang=3 if smoke else N_OVERHANG)
    print(json.dumps(out), flush=True)
