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


VOL_AXIS = "slabs"
_HALO = 2   # trilinear needs 1 plane, on-the-fly gradient taps 1 more


def march_volume_sharded(
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
    """Volume-sharded (tensor-parallel analogue, SURVEY §2.3): the volume is
    split along z into per-device slabs with ``_HALO`` halo planes for the
    trilinear / on-the-fly-gradient taps; rays are replicated and each device
    marches only the ray segment inside its slab's z-interval. The segment
    results compose exactly with the front-to-back over operator in per-pixel
    ray order (ERT saturates alpha to exactly 1, so later segments multiply
    by zero); the small distance maps stay replicated — TP here scales the
    *volume* memory, the only multi-GB array.

    Segment sample phases differ from the single-device march (each segment
    re-derives n_steps from its own interval), so parity with ``march`` is
    at resample tolerance, like the plane-sweep renderers.
    """
    import functools

    import jax.numpy as jnp

    n = int(mesh.devices.size)
    D = volume_u8.shape[0]
    Pz = -(-D // n)
    # Slab stack with clamped halo (CLAMP_TO_EDGE semantics at volume ends).
    idx = np.clip(
        np.arange(n)[:, None] * Pz + np.arange(-_HALO, Pz + _HALO)[None, :],
        0, D - 1,
    )
    slabs = jnp.asarray(volume_u8)[idx]              # (n, P+2H, H, W)
    grad_slabs = (jnp.asarray(gradient_u8)[idx]
                  if gradient_u8 is not None else None)
    f = jnp.float32

    def body(slab, grad_slab, maps, tf_, rays_, bs, pvm):
        d_idx = jax.lax.axis_index(VOL_AXIS)
        z0 = d_idx * Pz
        z1 = jnp.minimum(z0 + Pz, D)
        z_lo = z0.astype(f) / f(D)                   # texture-space interval
        z_hi = z1.astype(f) / f(D)

        # Clamp each ray to [z_lo, z_hi] along z (the same interval
        # arithmetic as the clip plane / depth clamps, ray_setup.py).
        o = rays_.entry
        dirs = rays_.ray_dir
        dz = dirs[..., 2]
        par = jnp.abs(dz) < 1e-9
        safe = jnp.where(par, 1.0, dz)
        t0 = (z_lo - o[..., 2]) / safe
        t1 = (z_hi - o[..., 2]) / safe
        tl = jnp.minimum(t0, t1)
        th = jnp.maximum(t0, t1)
        inside = (o[..., 2] >= z_lo) & (o[..., 2] <= z_hi)
        tl = jnp.where(par, jnp.where(inside, 0.0, 1e30), tl)
        th = jnp.where(par, jnp.where(inside, rays_.ray_distance, -1e30), th)
        ta = jnp.maximum(0.0, tl)
        tb = jnp.minimum(rays_.ray_distance, th)
        seg_valid = rays_.valid & (ta < tb)
        import dataclasses as _dc

        seg = _dc.replace(
            rays_,
            entry=o + dirs * ta[..., None],
            exit=o + dirs * tb[..., None],
            ray_distance=jnp.maximum(tb - ta, 0.0),
            valid=seg_valid,
        )
        out = march(
            slab[0], None if grad_slab is None else grad_slab[0],
            maps, tf_, seg, bs, pvm,
            vol_origin_z=z0 - _HALO,
            global_depth=D,
            **static_options,
        )
        return jax.tree.map(lambda x: x[None], out)

    if grad_slabs is None:
        body_fn = lambda s, m, t, r, b, p: body(s, None, m, t, r, b, p)
        args = (slabs, dist_maps_u8, tf, rays, block_size_xyz,
                proj_view_model)
        in_specs = (P(VOL_AXIS), P(), P(), P(), P(), P())
    else:
        body_fn = body
        args = (slabs, grad_slabs, dist_maps_u8, tf, rays, block_size_xyz,
                proj_view_model)
        in_specs = (P(VOL_AXIS), P(VOL_AXIS), P(), P(), P(), P(), P())
    vol_mesh = Mesh(mesh.devices, (VOL_AXIS,))
    parts = jax.shard_map(
        body_fn, mesh=vol_mesh, in_specs=in_specs,
        out_specs=jax.tree.map(lambda _: P(VOL_AXIS),
                               _render_output_spec_tree()),
        check_vma=False,
    )(*args)

    # Compose segments with the over operator in per-pixel ray order
    # (dz > 0 → slab 0 is nearest). GSPMD gathers the slab axis on demand.
    dz = rays.ray_dir[..., 2]
    Hh, Ww = rays.valid.shape
    zero = jnp.zeros((Hh, Ww, 4), f)

    def fold(order):
        c = zero
        for k in order:
            c = c + (1.0 - c[..., 3:4]) * parts.color[k]
        return c

    fwd = fold(range(n))
    bwd = fold(range(n - 1, -1, -1))
    color = jnp.where((dz > 0)[..., None], fwd, bwd)
    depth = parts.depth.max(axis=0)        # reverse-Z: greater = nearer
    return RenderOutput(
        color=color,
        depth=depth,
        num_volume_samples=parts.num_volume_samples.sum(axis=0),
        num_distance_samples=parts.num_distance_samples.sum(axis=0),
        num_empty_samples=parts.num_empty_samples.sum(axis=0),
        iterations=parts.iterations.max(axis=0),
    )


def _render_output_spec_tree():
    return RenderOutput(color=0, depth=0, num_volume_samples=0,
                        num_distance_samples=0, num_empty_samples=0,
                        iterations=0)


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
    Np = vol_t.shape[0]
    n_slabs = int(max(2, round(Np * oversample)))
    if plan.get("rect_w", 256) > 256 and (
            n_slabs < Np
            or (plan["Hi"] // n) % plan.get("tile_h", 8)):
        # Wide-rect plans are brick-kernel-only, and the brick kernel
        # additionally needs >=1 slab per voxel plane and per-shard grid
        # rows divisible by the tile height — conditions the plan cannot
        # know (it never sees the shard count or the oversample). Re-plan
        # at the 256-lane rect the per-slab kernel can cover instead of
        # letting _frame_body refuse at trace time.
        plan = sp.plan_frame(uniforms, rays, p_axis, vol_t.shape, H, W,
                             max_rect=256)
        if plan is None:
            raise sp.PallasUnsupported("view exceeds w-grid kernel limits")
    if plan["Hi"] % (sp.TILE_H * n):
        raise ValueError(f"grid height {plan['Hi']} not divisible over {n}")
    grid_params = jnp.asarray(
        [plan["wu0"], plan["dwu"], plan.get("cu", 0.0),
         plan["wv0"], plan["dwv"], plan.get("cv", 0.0)], jnp.float32
    )
    hcoef = (jnp.asarray(plan["hcoef"], jnp.float32)
             if plan.get("hcoef") is not None else None)
    body = functools.partial(
        sp._frame_body,
        p_axis=p_axis, Hi=plan["Hi"], Wi=plan["Wi"],
        R_sweep=plan["R_sweep"], R_warp=plan["R_warp"], ert=ert, test=test,
        n_slabs=n_slabs, sgn_p=plan["sgn_p"], interpret=interpret,
        dist_leap=dist_leap, RECT_A=plan["RECT_A"], RECT_B=plan["RECT_B"],
        tile_h=plan.get("tile_h", 8), R_brick=plan.get("R_brick"),
        span_blks=plan.get("span_blks", 2),
        rect_w=plan.get("rect_w", 256),
        warp_variant=plan.get("warp_variant", "A"),
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


def sweep_volume_sharded(
    mesh: Mesh,
    vol_t,
    occupancy_t,
    tf,
    uniforms,
    proj_view_model,
    grad_t=None,
    *,
    p_axis: int,
    height: int,
    width: int,
    ert: bool = True,
    interpret: bool = False,
    dist_leap: bool = False,
) -> RenderOutput:
    """Volume-sharded (TP) PRODUCTION path: the w-grid brick sweep runs on
    per-device plane slabs of the (p-transposed) volume and the segment
    grids compose with the over operator — the tensor-parallel analogue of
    ``march_volume_sharded`` for the production renderer (SURVEY §2.3; the
    reference is single-GPU, ``render_frame_sharded`` shards rays).

    No kernel changes: each device renders its slab through the UNCHANGED
    brick kernel on a LOCAL texture space. With the default aligned
    sampling (n_slabs == Np) the affine re-basing is exact:

        s' = (s·Np − z0) / Np_loc         (slab/plane coordinates)
        o_p' = (o_p·Np − z0) / Np_loc,  t' = t·Np/Np_loc
        wu' = wu·Np_loc/Np  (so wu'·t' == wu·t — u/v sampling unchanged)

    ``kappa`` (the opacity-correction step length) stays GLOBAL, so each
    segment composites exactly the samples the single-device sweep takes in
    its s-range; segment over-composition is then exact up to ERT's
    cross-shard tail (an earlier shard's saturated alpha multiplies later
    segments by (1−α) ≤ 0.01 instead of skipping them — the ERT
    approximation bound itself).

    The occupancy maps are sliced per shard on map-plane boundaries (shard
    edges are rounded to ``bp_p``; the local volume is padded to a whole
    number of map planes, padded occupancy = EMPTY). Depth comes from a
    per-shard pvm composed with the local→global texture affine, so clip
    depths are globally correct before the nearest-hit fold."""
    import dataclasses as _dc

    import jax.numpy as jnp

    from ..render import sweep_bricks as sb
    from ..render import sweep_pallas as sp
    from ..render.sweep import _SLICE_AXES

    f = jnp.float32
    n = int(mesh.devices.size)
    Np, Sv, Su = vol_t.shape
    n_slabs = Np                       # aligned sampling only (default)

    # vol_t is PRE-transposed for p_axis, so only that axis may plan
    # (a cheaper off-axis plan would be applied to the wrong
    # transposition); shape_for is therefore only ever called with p_axis.
    view, plan = sp.select_view_plan(
        uniforms, height, width,
        lambda q: (Np, Sv, Su), axes=(p_axis,))
    if view is None or view.get("mixed") or plan is None:
        raise sp.PallasUnsupported("view exceeds w-grid kernel limits")
    if plan.get("R_brick") is None:
        raise sp.PallasUnsupported("brick kernel infeasible for this view")
    sgn = 1 if plan["sgn_p"] > 0 else -1

    # ---- shard geometry (host): map-plane-aligned slab edges + halo ----
    mp = occupancy_t.shape[0]
    bp = -(-Np // mp)                  # voxel planes per map plane
    Pz = -(-(-(-Np // n)) // bp) * bp  # slab planes per shard (bp-aligned)
    HALO = sb.BRICK + 1
    z0s = [min(d * Pz, Np) for d in range(n)]
    z1s = [min(z0 + Pz, Np) for z0 in z0s]
    # One static local size for every shard (shard_map needs equal shapes):
    # planes [z0, z1 + HALO) clamped, padded to a whole number of map
    # planes.
    np_loc = -(-(Pz + HALO) // bp) * bp
    idx = np.clip(
        np.arange(n)[:, None] * Pz + np.arange(np_loc)[None, :], 0, Np - 1)
    # Slab gather on HOST, then a device_put SHARDED over the mesh: each
    # device receives only its own (np_loc, Sv, Su) slab. Gathering on
    # device (jnp.asarray(vol_t)[idx]) would materialise all n slab copies
    # (~(1 + HALO/Pz)× the volume) on the default device first — defeating
    # the TP mode's purpose of holding volumes one chip cannot.
    vol_mesh = Mesh(mesh.devices, (VOL_AXIS,))
    shard = jax.sharding.NamedSharding(vol_mesh, P(VOL_AXIS))
    vol_h = np.asarray(vol_t)
    slabs = jax.device_put(vol_h[idx], shard)          # (n, np_loc, Sv, Su)
    # Clamp-padding would duplicate plane Np-1 past the volume end; the
    # occupancy pad below marks those planes EMPTY so they are never
    # sampled.
    grad_slabs = (jax.device_put(np.asarray(grad_t)[idx], shard)
                  if grad_t is not None else None)
    mp_loc = np_loc // bp
    midx = np.arange(n)[:, None] * (Pz // bp) + np.arange(mp_loc)[None, :]
    in_rng_m = midx < mp
    occ_slabs = jax.device_put(
        np.where(
            in_rng_m[..., None, None],
            np.asarray(occupancy_t)[np.clip(midx, 0, mp - 1)],
            np.uint8(255),                             # padded planes empty
        ), shard)                                      # (n, mp_loc, mv, mu)
    z0_arr = jnp.asarray(z0s, jnp.int32)
    z1_arr = jnp.asarray(z1s, jnp.int32)

    v_ax, u_ax = _SLICE_AXES[p_axis]
    VOL = VOL_AXIS

    def body(slab, grad_slab, occ_slab, tf_, u_, pvm):
        d_idx = jax.lax.axis_index(VOL)
        slab = slab[0]
        occ_slab = occ_slab[0]
        grad_sl = None if grad_slab is None else grad_slab[0]
        z0 = z0_arr[d_idx].astype(f)
        z1 = z1_arr[d_idx].astype(f)
        scale = f(Np) / f(np_loc)                      # global→local s

        # Global w-grid fields (identical on every device), then rebased.
        Hi, Wi = plan["Hi"], plan["Wi"]
        gyi = jax.lax.broadcasted_iota(f, (Hi, Wi), 0)
        gxi = jax.lax.broadcasted_iota(f, (Hi, Wi), 1)
        wu_g = sp._mob_fwd(plan["wu0"], plan["dwu"], plan.get("cu", 0.0) or
                           0.0, gxi + 0.5)
        wv_g = sp._mob_fwd(plan["wv0"], plan["dwv"], plan.get("cv", 0.0) or
                           0.0, gyi + 0.5)
        s_lo, s_hi, cov, kappa = sb.grid_fields(
            u_, wu_g, wv_g, sgn, p_axis, max(Np, Sv, Su), n_slabs)
        # Restrict to the shard's s-range and rebase into local texture
        # coordinates (0.25 local-slab margin keeps halo slabs excluded
        # under f32 rounding).
        lo_g = z0 / f(Np)
        hi_g = z1 / f(Np)
        s_lo_c = jnp.maximum(s_lo, lo_g)
        s_hi_c = jnp.minimum(s_hi, hi_g)
        cov_d = cov & (s_lo_c <= s_hi_c)
        s_lo_l = (s_lo_c * f(Np) - z0) / f(np_loc)
        s_hi_l = jnp.minimum((s_hi_c * f(Np) - z0) / f(np_loc),
                             (z1 - z0 - 0.25) / f(np_loc))
        wu_l = wu_g / scale
        wv_l = wv_g / scale

        o = u_.cam_pos_tex
        o_p_l = (o[p_axis] * f(Np) - z0) / f(np_loc)
        o_l = o.at[p_axis].set(o_p_l)
        u_loc = _dc.replace(u_, cam_pos_tex=o_l)

        # Local→global texture affine for the depth projection: global
        # p-coordinate = local·(np_loc/Np) + z0/Np; u/v unchanged. pvm
        # consumes GLOBAL texture coords (center-shifted), so compose.
        A = jnp.zeros((4, 4), f)
        A = A.at[u_ax, u_ax].set(1.0).at[v_ax, v_ax].set(1.0)
        A = A.at[p_axis, p_axis].set(f(np_loc) / f(Np))
        A = A.at[p_axis, 3].set(z0 / f(Np))
        A = A.at[3, 3].set(1.0)
        # _sweep_bricks_jit's epilogue maps pen−0.5 through pvm; in local
        # coords pen_l−0.5 must first map to pen_g−0.5:
        # pen_g − 0.5 = A·(pen_l) − 0.5 = A·((pen_l − 0.5) + 0.5) − 0.5.
        shift = jnp.eye(4, dtype=f).at[:3, 3].set(0.5)
        unshift = jnp.eye(4, dtype=f).at[:3, 3].set(-0.5)
        pvm_l = pvm @ (unshift @ A @ shift)

        out = sb._sweep_bricks_jit(
            slab, occ_slab, tf_, None, u_loc, pvm_l, grad_sl,
            (wu_l, wv_l, s_lo_l, s_hi_l, kappa, cov_d),
            p_axis=p_axis, R=plan["R_brick"], ert=ert, test=None,
            count_samples=False, n_slabs=np_loc, sgn=sgn,
            tile_h=plan["tile_h"], span_blks=plan["span_blks"],
            rect_w=plan.get("rect_w", 256),
            interpret=interpret, dist_leap=dist_leap,
        )
        return jax.tree.map(lambda x: x[None], out)

    if grad_slabs is None:
        body_fn = lambda s, o_, t, u_, pv: body(s, None, o_, t, u_, pv)
        args = (slabs, occ_slabs, tf, uniforms, proj_view_model)
        in_specs = (P(VOL), P(VOL), P(), P(), P())
    else:
        body_fn = body
        args = (slabs, grad_slabs, occ_slabs, tf, uniforms,
                proj_view_model)
        in_specs = (P(VOL), P(VOL), P(VOL), P(), P(), P())
    parts = jax.shard_map(
        body_fn, mesh=vol_mesh, in_specs=in_specs,
        out_specs=jax.tree.map(lambda _: P(VOL),
                               _render_output_spec_tree()),
        check_vma=False,
    )(*args)

    # Ordered over-composition: sgn > 0 ⇒ shard 0 is nearest (static).
    order = range(n) if sgn > 0 else range(n - 1, -1, -1)
    Hi, Wi = plan["Hi"], plan["Wi"]
    color = jnp.zeros((Hi, Wi, 4), f)
    depth = jnp.zeros((Hi, Wi), f)
    nsamp = jnp.zeros((Hi, Wi), jnp.int32)
    for k in order:
        color = color + (1.0 - color[..., 3:4]) * parts.color[k]
        depth = jnp.where(depth != 0.0, depth, parts.depth[k])
        nsamp = nsamp + parts.num_volume_samples[k]
    zi = jnp.zeros((Hi, Wi), jnp.int32)
    return RenderOutput(color=color, depth=depth, num_volume_samples=nsamp,
                        num_distance_samples=zi, num_empty_samples=zi,
                        iterations=parts.iterations.max(axis=0))
