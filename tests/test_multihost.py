"""Multi-host distribution (dist/multihost.py): a REAL 2-process job
over the gRPC coordinator (the same control/data path a DCN pod uses),
each process owning 4 virtual CPU chips, rendering one sample-sharded
step on the global 8-device mesh. The replicated result must be
bit-identical across hosts AND to the single-process 8-device run with
the same seeds — multi-host is purely a layout change.
"""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

SEEDS = np.stack(
    [np.array([3 * i + 1, 5 * i + 2, 7 * i + 3], np.uint32) for i in range(8)]
)


def build_world():
    """Small deterministic world + LUT, identical in every process."""
    from voxtracer.core.spectra import build_wl_to_rgb_lut
    from voxtracer.world.svo import from_dense

    rng = np.random.default_rng(42)
    solid = rng.random((8, 8, 8)) < 0.25
    rgb = rng.random((8, 8, 8, 3)).astype(np.float32)
    dev = from_dense(solid, rgb).serialize()
    return (
        dev.table.view(np.int32),
        np.int32(dev.root),
        dev.height,
        np.asarray(build_wl_to_rgb_lut()),
    )


def render_args():
    from voxtracer.core import camera as vcam

    cam = vcam.Camera(pos=(4.0, 9.0, -4.0), yaw=0.2, pitch=-0.5)
    sun = np.array([0.3, 0.8, 0.5])
    sun = (sun / np.linalg.norm(sun)).astype(np.float32)
    return np.asarray(cam.pos, np.float32), cam.basis(), sun


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_host_job_matches_single_process(tmp_path):
    import os

    repo = Path(__file__).resolve().parents[1]
    port = _free_port()
    out = tmp_path / "frame"
    env = dict(os.environ)
    # ONLY the repo on PYTHONPATH: the axon site package (sitecustomize)
    # initializes the XLA backend at interpreter startup, which breaks
    # jax.distributed.initialize's must-be-first requirement
    env["PYTHONPATH"] = str(repo)
    procs = [
        subprocess.Popen(
            [sys.executable, str(repo / "tests" / "_multihost_worker.py"),
             str(port), str(pid), str(out)],
            cwd=repo, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=300)
        logs.append(stdout)
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(logs)

    f0 = np.load(f"{out}.0.npy")
    f1 = np.load(f"{out}.1.npy")
    np.testing.assert_array_equal(f0, f1)

    # single-process 8-device reference (conftest provides the devices)
    import jax.numpy as jnp

    from voxtracer.dist.mesh import make_mesh
    from voxtracer.dist.shard import replicate_world, sample_sharded_step

    table_np, root, height, lut_np = build_world()
    mesh = make_mesh(8)
    table, lut = replicate_world(mesh, jnp.asarray(table_np),
                                 jnp.asarray(lut_np))
    step = sample_sharded_step(mesh, table, root, height, lut, 16, 12,
                               max_bounces=2, fog_steps=4)
    ref = step(jnp.asarray(SEEDS), *render_args())
    # the 2-process psum reduces in a different order than the
    # single-process one — identical samples, ulp-level sum jitter
    np.testing.assert_allclose(f0, np.asarray(ref), rtol=1e-6, atol=1e-6)
