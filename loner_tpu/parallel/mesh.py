"""Multi-chip scaling via jax.sharding.

The reference is single-GPU; its only parallelism is process-pipeline +
share-nothing trial pools (SURVEY §2.2). This module adds what the
reference never had: data-parallel mapping over a TPU mesh. The natural
shard axis is the keyframe window — each device owns one (or more) window
slots' rays end-to-end (sampling, ray building, rendering, loss), and the
shared field/occupancy gradients are all-reduced by GSPMD over ICI. Pose
twists are replicated (their gradients are slot-local, the psum is a
no-op for other slots' zeros).

Used by __graft_entry__.dryrun_multichip and, on real multi-chip slices,
by the Optimizer when ``mesh`` is passed.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from loner_tpu.mapping.rays import WindowBuffers

DATA_AXIS = "data"
RAY_AXIS = "ray"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(
    n_kf: int, n_ray: int, kf_axis: str = DATA_AXIS, ray_axis: str = RAY_AXIS
) -> Mesh:
    """(kf x ray) mesh for slices wider than the keyframe window: the
    window-slot axis data-parallelizes over ``kf_axis`` and each slot's
    POINT buffer shards over ``ray_axis`` (GSPMD turns the per-iteration
    uniform index gathers into cross-shard collectives; verified
    loss-equal to the single-device program on a virtual mesh —
    tests/test_mesh_sharding.py)."""
    devices = np.asarray(jax.devices()[: n_kf * n_ray]).reshape(n_kf, n_ray)
    return Mesh(devices, (kf_axis, ray_axis))


def shard_window_buffers(buffers: WindowBuffers, mesh: Mesh) -> WindowBuffers:
    """Place the window buffers with the keyframe-slot axis sharded; on a
    2-axis mesh (make_mesh_2d) the per-slot point axis additionally
    shards over RAY_AXIS."""
    ray = RAY_AXIS if RAY_AXIS in mesh.axis_names else None
    slot = NamedSharding(mesh, P(DATA_AXIS))
    pts = NamedSharding(mesh, P(DATA_AXIS, ray))
    return WindowBuffers(
        jax.device_put(buffers.dirs, pts),
        jax.device_put(buffers.depths, pts),
        jax.device_put(buffers.counts, slot),
        jax.device_put(buffers.sky_dirs, slot),
        jax.device_put(buffers.sky_counts, slot),
        jax.device_put(buffers.slot_valid, slot),
    )


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (field params, occ grid, twists) over the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
