"""Checkpoint/resume for progressive renders and worlds.

The reference's only checkpoint granularity is its EXR frame cadence
(SURVEY.md §5): a crash loses at most the current 1000-sample frame.
Here the full render state is first-class: accumulator + sample count +
host RNG state + camera/sun pose, plus the world as its flat node table
(already a dense array). Stored as an .npz (no external deps).
"""

from __future__ import annotations

import json

import numpy as np

from voxtracer.core import camera as vcam
from voxtracer.world.svo import EMPTY, DeviceSvo

FORMAT_VERSION = 2  # v2 adds solid_leaf (beam-engine aug data)


def save_render_state(path, renderer, cam: vcam.Camera, sun) -> None:
    """Snapshot a driver.Renderer mid-accumulation."""
    meta = dict(
        version=FORMAT_VERSION,
        samples=renderer.acc.samples,
        width=renderer.width,
        height=renderer.height,
        max_bounces=renderer.max_bounces,
        fog_steps=renderer.fog_steps,
        cam_pos=list(map(float, cam.pos)),
        yaw=float(cam.yaw),
        pitch=float(cam.pitch),
        sun=list(map(float, np.asarray(sun, np.float64))),
        tree_height=renderer.tree_height,
        root=int(renderer.root),
    )
    arrays = dict(
        meta=json.dumps(meta),
        accumulator=np.asarray(renderer.acc.buffer),
        table=np.asarray(renderer.table),
        rng_state=np.frombuffer(
            json.dumps(renderer.host_rng.getstate()).encode(), dtype=np.uint8
        ),
    )
    if getattr(renderer, "solid_leaf", None) is not None:
        arrays["solid_leaf"] = np.asarray(renderer.solid_leaf, np.int32)
    np.savez_compressed(path, **arrays)


def load_render_state(path):
    """Restore (renderer, cam, sun) from a snapshot."""
    import jax.numpy as jnp

    from voxtracer.render.driver import Renderer

    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    assert 1 <= meta["version"] <= FORMAT_VERSION
    table = z["table"]
    dev = DeviceSvo(
        table=table.view(np.uint32),
        root=meta["root"] if meta["root"] >= 0 else EMPTY,
        height=meta["tree_height"],
        solid_leaf=z["solid_leaf"] if "solid_leaf" in z.files else None,
    )
    r = Renderer(
        dev, meta["width"], meta["height"],
        max_bounces=meta["max_bounces"], fog_steps=meta["fog_steps"],
    )
    state = json.loads(bytes(z["rng_state"]).decode())
    r.host_rng.setstate(
        (state[0], tuple(state[1]), state[2])
    )
    cam = vcam.Camera(pos=tuple(meta["cam_pos"]), yaw=meta["yaw"],
                      pitch=meta["pitch"])
    sun = np.asarray(meta["sun"], np.float64)
    # re-arm the accumulator with the saved contents
    sun_unit = sun / np.linalg.norm(sun)
    r.acc.begin_sample(cam.pos, cam.yaw, cam.pitch,
                       sun_unit.astype(np.float32))
    r.acc.buffer = jnp.asarray(z["accumulator"])
    r.acc.samples = meta["samples"]
    return r, cam, sun


def save_world(path, space) -> None:
    """Persist a world (the reference never persists worlds, SURVEY §5)."""
    dev = space.serialize()
    arrays = dict(
        table=dev.table, root=np.int64(dev.root), height=np.int64(dev.height),
    )
    if dev.solid_leaf is not None:
        arrays["solid_leaf"] = np.asarray(dev.solid_leaf, np.int32)
    np.savez_compressed(path, **arrays)


def load_world_device(path) -> DeviceSvo:
    z = np.load(path)
    return DeviceSvo(
        table=z["table"], root=int(z["root"]), height=int(z["height"]),
        solid_leaf=z["solid_leaf"] if "solid_leaf" in z.files else None,
    )
