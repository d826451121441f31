"""Multi-chip rendering over a ``jax.sharding.Mesh``.

The reference is single-GPU (SURVEY.md §2.3); its only intra-frame
parallelism is per-pixel SIMT. The natural TPU scale-out axis is the same
one: **rays**. The volume and its acceleration structures are replicated
(uint8 volumes are ≤ ~0.8 GB — small next to HBM) and the image is sharded
by rows across the mesh; the march needs *zero* collectives until the final
gather of image tiles, which XLA inserts automatically from the output
sharding. The lock-step while-loop's global ``any(not done)`` becomes a
cheap ICI all-reduce per iteration.

A volume-sharded mode (split along Z with halo cells for trilinear + gradient
taps — the TP analogue) is the documented extension for volumes that outgrow
a single chip's HBM.

Device placement of the acceleration *build* (occupancy + distance
transforms) is replicated as well: the per-TF-edit rebuild is cheap and
latency-bound, and replication keeps every chip able to march immediately.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.marcher_xla import RenderOutput, march
from ..render.ray_setup import RaySetup

RAY_AXIS = "rays"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def shard_rays(rays: RaySetup, mesh: Mesh) -> RaySetup:
    """Shard every per-pixel field by image rows (axis 0)."""
    row = NamedSharding(mesh, P(RAY_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, row), rays)


def replicate(tree, mesh: Mesh):
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), tree)


def march_sharded(
    mesh: Mesh,
    volume_u8,
    gradient_u8,
    dist_maps_u8,
    tf,
    rays: RaySetup,
    block_size_xyz,
    proj_view_model,
    **static_options,
) -> RenderOutput:
    """Data-parallel march: rays sharded over the mesh, volume replicated.

    The image height must be divisible by the mesh size. Uses jit + sharding
    annotations (GSPMD); XLA partitions the while-loop and inserts the
    ``psum``-style reduction for the global done-test and the final gather.
    """
    n = mesh.devices.size
    H = rays.valid.shape[0]
    if H % n:
        raise ValueError(f"image height {H} not divisible by mesh size {n}")
    rays_s = shard_rays(rays, mesh)
    vol, grad, maps, tf_r, bs, pvm = replicate(
        (volume_u8, gradient_u8, dist_maps_u8, tf, block_size_xyz,
         proj_view_model),
        mesh,
    )
    return march(vol, grad, maps, tf_r, rays_s, bs, pvm, **static_options)
