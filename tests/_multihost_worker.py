"""Worker for tests/test_multihost.py: one simulated host of a 2-host
CPU job (4 virtual devices each, coordinator over local gRPC — the same
wire path DCN jobs use). Renders one sample-sharded step on the global
8-device mesh and writes the replicated frame.

Usage: python tests/_multihost_worker.py PORT PROCESS_ID OUT_PREFIX
"""

import os
import sys

port, pid, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import jax  # noqa: E402

from voxtracer.dist import multihost  # noqa: E402

multihost.init(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

from tests.test_multihost import SEEDS, build_world, render_args  # noqa: E402
from voxtracer.dist.shard import sample_sharded_step  # noqa: E402

table_np, root, height, lut_np = build_world()
mesh = multihost.global_mesh()
table, lut = multihost.replicate_world_global(mesh, table_np, lut_np)
step = sample_sharded_step(
    mesh, table, root, height, lut, 16, 12, max_bounces=2, fog_steps=4
)
seeds = multihost.global_seeds(mesh, SEEDS[multihost.local_rows(mesh)])
cam_pos, cam_basis, sun = render_args()
frame = step(seeds, cam_pos, cam_basis, sun)
np.save(f"{out}.{pid}.npy", multihost.local_frame(frame))
print("worker", pid, "ok", flush=True)
