"""Multi-host (DCN) rendering: ``jax.distributed`` bootstrap + global
arrays over a mesh that spans hosts.

The reference is strictly single-device (fragment.rs:389-414); this is
the pod-scale layer SURVEY §2.9 planned. JAX is single-controller *per
process*: every host runs the same program, owns its local chips, and
the global mesh stitches them together — collectives ride ICI within a
host and DCN across hosts. The sharding strategy stays the same as the
single-host one (dist/shard.py): *sample sharding*, where each chip
traces the full frame with its own seed and one ``psum`` over the global
axis merges the batch. That keeps DCN traffic to one frame of f32 per
step regardless of chip count.

Workflow (each host runs identically):

    init(coordinator, num_processes, process_id)   # or env-driven
    mesh  = make_mesh()                            # all global devices
    table, lut = replicate_world_global(mesh, table_np, lut_np)
    step  = sample_sharded_step(mesh, table, ...)  # dist/shard.py, reused
    seeds = global_seeds(mesh, my_local_seeds)     # (ndev_global, 3) u32
    frame = step(seeds, cam_pos, cam_basis, sun)   # replicated sum

Every process sees the same replicated ``frame``; process 0 accumulates
and writes EXRs (the headless cadence of render/driver.py).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
):
    """Bootstrap ``jax.distributed`` for a multi-host job.

    No-op for single-process runs (num_processes absent or 1). Arguments
    default to the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) so launchers can stay generic.
    Must be called before any other JAX API touches the backend.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def global_mesh(axis: str = "dp") -> Mesh:
    """1-D mesh over every device in the job (all hosts)."""
    return Mesh(np.array(jax.devices()), (axis,))


def global_seeds(mesh: Mesh, local_seeds: np.ndarray, axis: str = "dp"):
    """Assemble the global (ndev_global, 3) uint32 seed array from this
    process's (ndev_local, 3) rows.

    Each process contributes seeds only for its addressable devices;
    rows land on the device that traces with them (sample sharding), so
    no seed ever crosses DCN.
    """
    local_seeds = np.asarray(local_seeds, np.uint32)
    ndev = mesh.devices.size
    n_local = len([d for d in mesh.devices.flat
                   if d.process_index == jax.process_index()])
    assert local_seeds.shape == (n_local, 3), (
        f"need one seed row per local device: {local_seeds.shape} != "
        f"({n_local}, 3)"
    )
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(
        sharding, local_seeds, global_shape=(ndev, 3)
    )


def replicate_world_global(mesh: Mesh, *arrays):
    """Replicate read-only host arrays (node table, LUT) onto every chip
    of a multi-host mesh. Every process passes the same host data (the
    world is deterministic from the seed, so each host generates its
    own copy — nothing big crosses DCN)."""
    rep = NamedSharding(mesh, P())
    out = []
    for a in arrays:
        a = np.asarray(a)
        out.append(
            jax.make_array_from_process_local_data(
                rep, a, global_shape=a.shape
            )
        )
    return out


def local_frame(global_frame) -> np.ndarray:
    """Materialize the replicated frame on this host (one addressable
    shard — the psum already made all copies identical)."""
    shard = global_frame.addressable_shards[0].data
    assert shard.shape == global_frame.shape, (
        "frame is not replicated; gather it with a P() out_spec"
    )
    return np.asarray(shard)


def local_rows(mesh: Mesh):
    """Global row indices of this process's devices in a 1-D mesh — the
    rows of a P(axis)-sharded array this process must supply."""
    me = jax.process_index()
    return [i for i, d in enumerate(mesh.devices.flat)
            if d.process_index == me]
