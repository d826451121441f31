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


def render_frame_sharded(
    mesh: Mesh,
    vol_t,
    occupancy_t,
    tf,
    rays: RaySetup,
    uniforms,
    proj_view_model,
    grad_t=None,
    *,
    p_axis: int,
    ert: bool = True,
    test=None,
    oversample: float = 1.0,
    interpret: bool = False,
    dist_leap: bool = False,
) -> RenderOutput:
    """Multi-chip production path (w-grid sweep + warp, render/sweep_pallas):

    * the **sweep** phase shards the w-grid rows over the mesh (volume and
      acceleration maps replicated — same placement rationale as the march);
    * one tiled ``all_gather`` rebuilds the grid (the frame's only
      collective, a few MB over ICI);
    * the **warp** phase shards the image rows, so outputs come back
      row-sharded exactly like ``march_sharded``.

    Constraints: image height and the planned grid height must split evenly
    into 8-row tiles per device (H % (8·n) == 0; the plan's Hi is a multiple
    of 64, so n ∈ {1, 2, 4, 8} always satisfies the grid side).
    """
    import functools

    import jax.numpy as jnp

    from ..options import Test
    from ..render import sweep_pallas as sp
    from ..render.marcher_xla import RenderOutput as RO

    if test is None:
        test = Test.NONE
    n = mesh.devices.size
    H, W = rays.valid.shape
    if H % (sp.TILE_H * n) or W % sp.TILE_W:
        raise ValueError(f"image {H}x{W} not tile-divisible over {n} devices")
    plan = sp.plan_frame(uniforms, rays, p_axis, vol_t.shape, H, W)
    if plan is None:
        raise sp.PallasUnsupported("view exceeds w-grid kernel limits")
    if plan["Hi"] % (sp.TILE_H * n):
        raise ValueError(f"grid height {plan['Hi']} not divisible over {n}")
    Np = vol_t.shape[0]
    n_slabs = int(max(2, round(Np * oversample)))
    grid_params = jnp.asarray(
        [plan["wu0"], plan["dwu"], plan["wv0"], plan["dwv"]], jnp.float32
    )
    hcoef = (jnp.asarray(plan["hcoef"], jnp.float32)
             if plan.get("hcoef") is not None else None)
    body = functools.partial(
        sp._frame_body,
        p_axis=p_axis, Hi=plan["Hi"], Wi=plan["Wi"],
        R_sweep=plan["R_sweep"], R_warp=plan["R_warp"], ert=ert, test=test,
        n_slabs=n_slabs, sgn_p=plan["sgn_p"], interpret=interpret,
        dist_leap=dist_leap, RECT_A=plan["RECT_A"], RECT_B=plan["RECT_B"],
        n_shards=n, axis_name=RAY_AXIS,
    )
    row = P(RAY_AXIS)
    repl = P()
    out_specs = RO(color=row, depth=row, num_volume_samples=row,
                   num_distance_samples=row, num_empty_samples=row,
                   iterations=repl)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(repl, repl, repl, row, repl, repl, repl, repl, repl),
        out_specs=out_specs,
        check_vma=False,
    )
    return fn(vol_t, occupancy_t, tf, rays, uniforms, proj_view_model,
              grid_params, grad_t, hcoef)


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
