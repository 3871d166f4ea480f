"""Terminal interactive session — the fly-camera/editor counterpart of
the reference's winit app (main.rs:149-309), adapted to a headless TPU
host: a LIVE progressive loop renders 1 sample per tick into a preview
PNG (the reference renders 1 sample/frame continuously,
main.rs:164-208), shows FPS from the same 250-frame ring buffer
(main.rs:179-189), and polls stdin without blocking so edits take
effect within one sample interval.

Command mapping (reference keys in parens):
  w/a/s/d N   move forward/left/back/right N voxels (WASD fly movement)
  up/down N   vertical movement (Space/Shift)
  look DY DP  adjust yaw/pitch in radians (mouse look, main.rs:295-308)
  fast        toggle 100x speed (Ctrl, main.rs:94-97)
  g           teleport up by world_size/8 (G key's +100000, main.rs:251-253)
  r           step the sun along the day arc by 0.05 (R key, main.rs:254-263)
  del         delete the block under the crosshair (left click)
  place       place an emissive white block on the face under the
              crosshair (right click -> [1.0; 3], main.rs:281-284)
  pose        print camera pose (Esc print, main.rs:241)
  spp N       set the preview refresh cadence (samples between writes)
  save PATH   save the current accumulation as PNG
  q           quit

Picking uses the device traversal on the view-center ray — the same
cast the reference does CPU-side (software::raycast, main.rs:273).

With ``input_fn`` given (tests), the session is scripted instead of
live: commands are consumed back-to-back with one progressive sample
after each; an ``input_fn`` returning None simulates an idle tick (no
input pending), exercising the live loop's continuous accumulation.

Idle cadence (main.rs:164-208 presents a sample every frame): while no
input is pending the loop keeps accumulating path-traced samples, and
the preview PNG refreshes on a TIME cadence (``preview_interval``,
default 100 ms) as well as the sample-count one — when samples are
slower than the interval every sample is presented immediately, when
they are faster the writes coalesce, so the session always shows the
freshest accumulation the sample rate allows."""

from __future__ import annotations

import time

import numpy as np

from voxtracer.core import camera as vcam


def _stdin_poller():
    """Non-blocking stdin line poller (None = no input yet)."""
    import select
    import sys

    def poll():
        ready, _, _ = select.select([sys.stdin], [], [], 0.0)
        if not ready:
            return None
        line = sys.stdin.readline()
        if line == "":
            raise EOFError
        return line

    return poll


def run_interactive(args, input_fn=None, log=print,
                    preview_interval: float = 0.1):
    import jax.numpy as jnp

    from voxtracer.app.cli import _build_world, _camera
    from voxtracer.kernels.traverse import svo_raycast
    from voxtracer.render.driver import Renderer, rotate_sun
    from voxtracer.utils.profiling import FrameTimer

    space = _build_world(args, log=log)
    cam = _camera(args)
    pos = np.asarray(cam.pos, np.float64)
    yaw, pitch = cam.yaw, cam.pitch
    sun = np.asarray(args.sun, np.float64)
    sun /= np.linalg.norm(sun)
    renderer = Renderer(
        space.serialize(), args.width, args.height,
        max_bounces=args.max_bounces, fog_steps=args.fog_steps, seed=args.seed,
        devices=getattr(args, "devices", None),
    )
    refresh_every = max(args.spp, 1)
    fast = False
    preview = "preview.png"
    scripted = input_fn is not None
    poll = None if scripted else _stdin_poller()
    timer = FrameTimer()

    last_write = [0.0]  # monotonic time of the last preview write

    def sample_once():
        c = vcam.Camera(pos=tuple(pos), yaw=yaw, pitch=pitch)
        renderer.sample(c, sun)
        timer.tick()

    def write_preview():
        renderer.save_png(preview)
        last_write[0] = time.monotonic()
        log(f"[{renderer.acc.samples} samples | {timer.fps:.1f} fps] "
            f"-> {preview}")

    def idle_tick():
        """One live-loop tick with no input pending: accumulate a PT
        sample, refresh the preview on the time cadence (module doc)."""
        sample_once()
        if (renderer.acc.samples % refresh_every == 0
                or time.monotonic() - last_write[0] >= preview_interval):
            write_preview()

    def fast_preview():
        """Immediate shaded raster frame after a camera/world change —
        sub-second edit-to-preview latency; the path-traced accumulation
        then refines it on idle ticks (the reference presents a sample
        every frame, main.rs:164-208)."""
        from voxtracer.render import film

        c = vcam.Camera(pos=tuple(pos), yaw=yaw, pitch=pitch)
        img = renderer.preview_frame(c, sun)
        if img is None:
            return False
        film.save_png(preview, np.asarray(img))
        timer.tick()
        log(f"[raster preview | {timer.fps:.1f} fps] -> {preview}")
        return True

    def center_pick():
        basis = np.asarray(vcam.camera_basis(yaw, pitch))
        d = basis @ np.array([0.0, 0.0, 1.0])
        dev = space.serialize()
        table = jnp.asarray(dev.table.view(np.int32))
        root = np.int32(dev.root if dev.root != 0xFFFFFFFF else -1)
        r = svo_raycast(
            table, root, dev.height,
            jnp.asarray(pos[None, :], jnp.float32),
            jnp.asarray(d[None, :], jnp.float32),
            skip_t0=False,
        )
        if not bool(np.asarray(r["hit"])[0]):
            return None
        return (
            np.asarray(r["voxel"])[0],
            np.asarray(r["normal"])[0].astype(np.int64),
        )

    sample_once()
    write_preview()
    while True:
        # --- live progressive rendering until input arrives -----------
        if scripted:
            try:
                line = input_fn("> ")
            except (EOFError, StopIteration):
                return
            if line is None:  # scripted idle tick (module doc)
                idle_tick()
                continue
        else:
            try:
                line = poll()
            except EOFError:
                return
            if line is None:
                idle_tick()
                continue

        line = line.strip()
        if not line:
            write_preview()
            continue
        parts = line.split()
        cmd, rest = parts[0].lower(), parts[1:]
        speed = 1000.0 if fast else 10.0
        basis = np.asarray(vcam.camera_basis(yaw, 0.0))
        fwd = basis @ np.array([0.0, 0.0, 1.0])
        right = basis @ np.array([1.0, 0.0, 0.0])

        def amt():
            return float(rest[0]) if rest else speed

        if cmd == "q":
            return
        elif cmd == "w":
            pos += fwd * amt()
        elif cmd == "s":
            pos -= fwd * amt()
        elif cmd == "a":
            pos -= right * amt()
        elif cmd == "d":
            pos += right * amt()
        elif cmd == "up":
            pos[1] += amt()
        elif cmd == "down":
            pos[1] -= amt()
        elif cmd == "look" and len(rest) >= 2:
            yaw += float(rest[0])
            pitch = float(np.clip(pitch + float(rest[1]), -np.pi / 2, np.pi / 2))
        elif cmd == "fast":
            fast = not fast
            log(f"fast={'on' if fast else 'off'}")
        elif cmd == "g":
            pos[1] += (1 << args.log2_size) / 8.0
        elif cmd == "r":
            sun = rotate_sun(sun, 0.05)
            log(f"sun={sun}")
        elif cmd in ("del", "place"):
            picked = center_pick()
            if picked is None:
                log("no block under crosshair")
            else:
                voxel, normal = picked
                if cmd == "del":
                    edited = tuple(int(c) for c in voxel)
                    space.set(edited, None)
                    log(f"deleted {edited}")
                elif not all(
                    0 <= int(c) < (1 << space.height()) for c in voxel + normal
                ):
                    # placing on a world-boundary face would land outside
                    # [0, 2^height) and alias onto an in-range voxel
                    log("placement outside world bounds")
                    continue
                else:
                    edited = tuple(int(c) for c in voxel + normal)
                    space.set(edited, (1.0, 1.0, 1.0))
                    log(f"placed emissive block at {edited}")
                # O(changed nodes) table upload + in-place soup patch:
                # the fast raster primaries survive the edit
                renderer.apply_edits(space, edits=[edited])
        elif cmd == "pose":
            log(f"pos={tuple(pos)} yaw={yaw} pitch={pitch}")
            continue
        elif cmd == "spp":
            refresh_every = max(int(rest[0]), 1)
            continue
        elif cmd == "save" and rest:
            renderer.save_png(rest[0])
            log(f"wrote {rest[0]}")
            continue
        else:
            log("commands: w/a/s/d/up/down [N], look DY DP, fast, g, r, "
                "del, place, pose, spp N, save PATH, q")
            continue
        # state changed: write an immediate raster preview, then one
        # path-traced sample at the new state (the accumulator resets
        # itself on pose/sun/world changes; idle ticks keep refining)
        fast_preview()
        sample_once()
        write_preview()
