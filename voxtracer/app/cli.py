"""voxtracer command-line interface.

Subcommands (superset of the reference's positional-arg modes,
main.rs:311-413):

* ``render``   — render one frame (path-traced or deterministic shading)
                 to PNG and/or EXR.
* ``headless`` — the day-cycle batch job: N samples per frame, EXR dump,
                 sun schedule, throughput prints (main.rs:112-145).
* ``combine``  — average frames/*.exr across iters into movie/*.png
                 (main.rs:312-370).
* ``interact`` — terminal-driven fly camera + block editing session
                 (the windowed app has no TPU-host equivalent; this is
                 the keyboard-driven counterpart).
* ``bench``    — render benchmark (also available as repo-root bench.py).

Every compile-time constant of the reference (window size, world size,
seeds, camera pose, batch cadence) is a flag here (SURVEY.md §5 config).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

# above this box count, primaries raster the frustum-culled active set
# (world/active.py) instead of the whole soup — flagship 8192^3 is ~53M
ACTIVE_SOUP_THRESHOLD = 4_000_000


def _add_common(p):
    p.add_argument("--log2-size", type=int, default=10,
                   help="world edge = 2^log2_size voxels (reference: 13)")
    p.add_argument("--seed-scale", type=lambda s: int(s, 0),
                   default=0xAFE29979, help="scale-noise seed")
    p.add_argument("--seed-noise", type=lambda s: int(s, 0),
                   default=0x1C766E2E, help="fBm noise seed")
    p.add_argument("--width", type=int, default=853)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--pos", type=float, nargs=3, default=None,
                   help="camera position (default: reference pose scaled to world size)")
    p.add_argument("--yaw", type=float, default=-5.3800497)
    p.add_argument("--pitch", type=float, default=0.21999985)
    p.add_argument("--sun", type=float, nargs=3, default=(0.8, 10.2743, 3.7))
    p.add_argument("--max-bounces", type=int, default=24)
    p.add_argument("--fog-steps", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--devices", type=int, default=None,
                   help="shard path-traced sampling over the first N JAX "
                        "devices (sample sharding + psum merge)")
    p.add_argument("--noise-device", default="cpu",
                   help="JAX backend for the worldgen noise eval: 'cpu' "
                        "(default; remote one-shot compiles cost more "
                        "than the host eval) or 'default' for the "
                        "session's accelerator (pays off once the "
                        "persistent compile cache holds the program)")


def _build_world(args, log=print):
    from voxtracer.world import worldgen

    t0 = time.monotonic()
    nd = getattr(args, "noise_device", "cpu")
    space = worldgen.generate(
        log2_size=args.log2_size,
        seed_scale=getattr(args, "seed_scale", None),
        seed_noise=getattr(args, "seed_noise", None),
        noise_device=None if nd == "default" else nd,
    )
    log(f"worldgen total {time.monotonic() - t0:.2f}s")
    return space


def _camera(args):
    from voxtracer.core import camera as vcam

    if args.pos is None:
        s = (1 << args.log2_size) / 8192.0
        pos = tuple(np.asarray(vcam.DEFAULT_POSE.pos) * s)
    else:
        pos = tuple(args.pos)
    return vcam.Camera(pos=pos, yaw=args.yaw, pitch=args.pitch)


def _renderer(args, space):
    from voxtracer.render.driver import Renderer

    return Renderer(
        space.serialize(),
        args.width,
        args.height,
        max_bounces=args.max_bounces,
        fog_steps=args.fog_steps,
        seed=args.seed,
        devices=getattr(args, "devices", None),
    )


def cmd_render(args):
    space = _build_world(args)
    cam = _camera(args)
    sun = np.asarray(args.sun, np.float64)

    if args.mode == "path":
        r = _renderer(args, space)
        t0 = time.monotonic()
        r.render(cam, sun, args.spp)
        dt = time.monotonic() - t0
        print(
            f"{args.spp} spp in {dt:.2f}s = "
            f"{args.spp * args.width * args.height / dt / 1e6:.2f} Mpaths/s"
        )
        if args.out:
            r.save_png(args.out)
            print("wrote", args.out)
        if args.exr:
            r.save_exr(args.exr)
            print("wrote", args.exr)
    else:
        import jax.numpy as jnp

        from voxtracer.core import camera as vcam
        from voxtracer.kernels import shade
        from voxtracer.render import film

        dev = space.serialize()
        table = jnp.asarray(dev.table.view(np.int32))
        root = np.int32(dev.root if dev.root != 0xFFFFFFFF else -1)
        o, d = vcam.generate_rays(cam, args.width, args.height)
        sun_unit = jnp.asarray(sun / np.linalg.norm(sun), jnp.float32)
        tiles = args.bands if args.height % args.bands == 0 else 1
        t0 = time.monotonic()
        if args.engine == "raster" and args.mode == "shaded":
            from voxtracer.kernels import raster
            from voxtracer.world.boxes import extract_boxes

            soup = extract_boxes(dev)
            print(f"box soup: {len(soup)} boxes")
            if len(soup) > ACTIVE_SOUP_THRESHOLD:
                from voxtracer.world.active import ActiveSoup

                act = ActiveSoup(soup, args.width, args.height)
                soup_args = act.active(np.asarray(cam.pos, np.float32),
                                       cam.basis())
                print(f"active set: {act.n_active} boxes"
                      + (" (OVERFLOW)" if act.overflowed else ""))
            else:
                soup_args = (
                    jnp.asarray(soup.lo), jnp.asarray(soup.size),
                    jnp.asarray(raster.pack_box_attr(soup)),
                )
            t0 = time.monotonic()
            img = raster.raster_primary_frame(
                *soup_args, dev.height,
                np.asarray(cam.pos, np.float32), cam.basis(), sun_unit,
                args.width, args.height, table=table, root=root,
            )
        elif args.engine == "beam" and args.height % 8 == 0 and args.width % 8 == 0:
            from voxtracer.kernels import beam

            aug = jnp.asarray(
                beam.build_aug_table(dev.table, dev.solid_leaf)
            )
            frame_fn = (beam.beam_primary_frame if args.mode == "shaded"
                        else beam.beam_shadow_frame)
            img = frame_fn(
                table, aug, root, dev.height,
                np.asarray(cam.pos, np.float32), d, sun_unit,
            )
        elif args.mode == "shaded":
            img = shade.svo_primary_frame(table, root, dev.height, o, d,
                                          sun_unit, tiles=tiles)
        else:  # shadow
            img = shade.svo_shadow_frame(table, root, dev.height, o, d,
                                         sun_unit, tiles=tiles)
        img.block_until_ready()
        dt = time.monotonic() - t0
        rays = args.width * args.height * (1 if args.mode == "shaded" else 2)
        print(f"frame in {dt * 1e3:.1f} ms = {rays / dt / 1e6:.2f} Mrays/s")
        if args.out:
            film.save_png(args.out, np.asarray(img))
            print("wrote", args.out)


def cmd_headless(args):
    from voxtracer.render.driver import headless_run

    space = _build_world(args)
    cam = _camera(args)
    r = _renderer(args, space)
    headless_run(
        r,
        cam,
        out_dir=args.frames_dir,
        frame_samples=args.frame_samples,
        sun_start=np.asarray(args.sun, np.float64),
        max_iters=args.iters,
        max_frames=args.max_frames,
        checkpoint_every=args.checkpoint_every,
        checkpoint_path=args.checkpoint_path,
    )


def cmd_combine(args):
    from voxtracer.render.driver import combine

    combine(args.frames_dir, args.movie_dir)


def cmd_interact(args):
    from voxtracer.app.interactive import run_interactive

    run_interactive(args)


def build_parser():
    ap = argparse.ArgumentParser(prog="voxtracer")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("render", help="render one frame")
    _add_common(p)
    p.add_argument("--mode", choices=("path", "shaded", "shadow"), default="path")
    p.add_argument("--engine", choices=("raster", "beam", "ray"),
                   default="raster",
                   help="primary-visibility engine for --mode shaded")
    p.add_argument("--bands", type=int, default=27,
                   help="row bands for early-exit tiling")
    p.add_argument("--spp", type=int, default=16)
    p.add_argument("--out", default="frame.png")
    p.add_argument("--exr", default=None)
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("headless", help="day-cycle batch render")
    _add_common(p)
    p.add_argument("--frames-dir", default="frames")
    p.add_argument("--frame-samples", type=int, default=1000)
    p.add_argument("--iters", type=int, default=1)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--checkpoint-every", type=int, default=None,
                   help="snapshot render state every N samples")
    p.add_argument("--checkpoint-path", default="render_state.npz")
    p.set_defaults(fn=cmd_headless)

    p = sub.add_parser("combine", help="frames/*.exr -> movie/*.png")
    p.add_argument("--frames-dir", default="frames")
    p.add_argument("--movie-dir", default="movie")
    p.set_defaults(fn=cmd_combine)

    p = sub.add_parser("interact", help="terminal fly camera + editing")
    _add_common(p)
    p.add_argument("--spp", type=int, default=4)
    p.set_defaults(fn=cmd_interact)

    return ap


def main(argv=None):
    try:
        import pathlib

        import jax

        # Persistent compile cache for the (minutes-long) remote TPU
        # compiles ONLY: XLA:CPU caches AOT machine code whose CPU
        # features are baked in at compile time — loading an entry
        # written on a different host machine is flagged "could lead to
        # SIGILL" and has produced real segfaults in later compiles of
        # the same process. The CPU backend recompiles fast anyway.
        if jax.default_backend() != "cpu":
            jax.config.update(
                "jax_compilation_cache_dir",
                str(pathlib.Path(__file__).resolve().parents[2]
                    / ".jax_cache"),
            )
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
