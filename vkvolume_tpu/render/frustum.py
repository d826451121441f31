"""Intermediate w-grid ("shear-warp") construction for the Pallas sweep.

A ray through the camera is fully described by ``w = (w_u, w_v)`` with
``dir ∝ (w_u, w_v, 1)`` in (u, v, p) texture axes. Rendering on a grid that
is *uniform in w* makes every slab's source footprint an axis-aligned,
uniformly-scaled window — no perspective amplification across a tile and no
rotation coupling between image rows and volume rows, which is exactly what
the Pallas sweep kernel's rect-DMA scheme needs. The finished w-grid image
is then warped to pixels once per frame (a single projective resample —
render/warp_pallas.py), the modern form of Lacroute & Levoy's shear-warp
factorisation, re-derived for the TPU memory hierarchy.

The pixel↔w map and all fields are exact; the only approximation relative
to rendering per-pixel is the final bilinear resample of the finished
radiance image, bounded by choosing the grid at least as fine as the pixel
grid (oversampling clamp aside).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .ray_setup import FrameUniforms, RaySetup, ray_caster_get_back
from .sweep import _SLICE_AXES


@dataclasses.dataclass
class WGrid:
    rays: RaySetup            # per-grid-point fields (entry/exit/valid/...)
    gx: jax.Array             # (H, W) pixel → grid x coordinate (for warp)
    gy: jax.Array             # (H, W) pixel → grid y coordinate
    Hi: int
    Wi: int
    wu0: float
    dwu: float
    wv0: float
    dwv: float


def _round_up(x, m):
    return -(-int(x) // m) * m


def build_wgrid(
    uniforms: FrameUniforms,
    rays: RaySetup,
    p_axis: int,
    vol_shape_t,              # (Np, Sv, Su)
    height: int,
    width: int,
    *,
    max_oversample: float = 2.5,
    kernel_span_u: int = 120,
    tile_w: int = 128,
) -> WGrid | None:
    """Build the uniform w-grid for this frame, or None if the view cannot
    satisfy both the kernel footprint limit and the oversampling cap."""
    Np, Sv, Su = vol_shape_t
    v_ax, u_ax = _SLICE_AXES[p_axis]

    d = np.asarray(rays.ray_dir)
    valid = np.asarray(rays.valid)
    if not valid.any():
        return None
    d_p = d[..., p_axis]
    ok = np.abs(d_p) > 1e-6
    safe = np.where(ok, d_p, 1.0)
    wu_pix = d[..., u_ax] / safe
    wv_pix = d[..., v_ax] / safe
    sel = valid & ok
    wu_v = wu_pix[sel]
    wv_v = wv_pix[sel]
    wu_lo, wu_hi = float(wu_v.min()), float(wu_v.max())
    wv_lo, wv_hi = float(wv_v.min()), float(wv_v.max())
    # Small margin so bilinear taps at the borders stay inside the grid.
    mu = max(1e-6, (wu_hi - wu_lo) * 0.01)
    mv = max(1e-6, (wv_hi - wv_lo) * 0.01)
    wu_lo -= mu; wu_hi += mu; wv_lo -= mv; wv_hi += mv

    o = np.asarray(uniforms.cam_pos_tex)
    o_p = float(o[p_axis])
    t_max = max(abs(0.0 - o_p), abs(1.0 - o_p))

    # Grid resolution. Quality: at least one grid cell per pixel footprint
    # in w (use the median finite-difference; extreme outliers are clamped
    # by max_oversample). Kernel: a tile of `tile_w` cells must span at most
    # kernel_span_u texels: dwu * Su * t_max * tile_w <= kernel_span_u.
    du_pix = np.abs(np.diff(wu_pix, axis=1))[sel[:, 1:] & sel[:, :-1]]
    dv_pix = np.abs(np.diff(wv_pix, axis=0))[sel[1:, :] & sel[:-1, :]]
    # Median pixel footprint: the grid resolves typical pixels 1:1; the
    # densest (nearest-to-camera) pixels see slight smoothing. Keeps the
    # grid — and the final warp's per-tile footprint — bounded.
    du_q = np.percentile(du_pix[du_pix > 0], 50) if (du_pix > 0).any() else 1e-6
    dv_q = np.percentile(dv_pix[dv_pix > 0], 50) if (dv_pix > 0).any() else 1e-6

    Wi_quality = (wu_hi - wu_lo) / max(du_q, 1e-9)
    Hi_quality = (wv_hi - wv_lo) / max(dv_q, 1e-9)
    Wi_kernel = (wu_hi - wu_lo) * Su * t_max * tile_w / kernel_span_u
    # v footprint: 8-cell tile must fit R-10 rows; R adapts up to 48, so we
    # only need dwv * Sv * t_max * 8 <= 38.
    Hi_kernel = (wv_hi - wv_lo) * Sv * t_max * 8.0 / 38.0

    Wi = max(Wi_quality, Wi_kernel, 128.0)
    Hi = max(Hi_quality, Hi_kernel, 8.0)
    if Wi > width * max_oversample or Hi > height * max_oversample:
        return None
    Wi = _round_up(Wi, 128)
    Hi = _round_up(Hi, 8)

    dwu = (wu_hi - wu_lo) / Wi
    dwv = (wv_hi - wv_lo) / Hi

    # --- Per-grid-point ray fields (exact: same interval math as make_rays).
    f = jnp.float32
    gyi, gxi = jnp.mgrid[0:Hi, 0:Wi]
    wu_g = f(wu_lo) + (gxi.astype(f) + 0.5) * f(dwu)
    wv_g = f(wv_lo) + (gyi.astype(f) + 0.5) * f(dwv)
    sgn_p = float(np.sign(np.median(d_p[sel])) or 1.0)
    dir_xyz = [None, None, None]
    dir_xyz[p_axis] = jnp.full((Hi, Wi), f(sgn_p))
    dir_xyz[u_ax] = wu_g * f(sgn_p)
    dir_xyz[v_ax] = wv_g * f(sgn_p)
    dirs = jnp.stack(dir_xyz, -1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    rays_g = rays_from_dirs(uniforms, dirs)

    # --- Pixel → grid coordinates for the final warp (continuous).
    gx = (jnp.asarray(wu_pix) - f(wu_lo)) / f(dwu) - 0.5
    gy = (jnp.asarray(wv_pix) - f(wv_lo)) / f(dwv) - 0.5
    pix_ok = jnp.asarray(sel)
    gx = jnp.where(pix_ok, gx, -10.0)
    gy = jnp.where(pix_ok, gy, -10.0)

    return WGrid(rays=rays_g, gx=gx, gy=gy, Hi=Hi, Wi=Wi,
                 wu0=wu_lo, dwu=dwu, wv0=wv_lo, dwv=dwv)


def rays_from_dirs(u: FrameUniforms, dirs: jax.Array) -> RaySetup:
    """Entry/exit/valid interval for arbitrary tex-space directions — the
    same math as make_rays (AABB slab test + clip-plane entry clamp,
    replacing the reference's rasterized draws)."""
    f = jnp.float32
    H, W = dirs.shape[:2]
    o = u.cam_pos_tex
    d = dirs
    dir_inv = 1.0 / d
    t0 = (0.0 - o) * dir_inv
    t1 = (1.0 - o) * dir_inv
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    s_o = jnp.dot(u.plane_tex[:3], o) + u.plane_tex[3]
    s_d = d @ u.plane_tex[:3]
    t_plane = jnp.where(s_d != 0.0, -s_o / s_d, jnp.float32(jnp.inf))
    t_entry = jnp.where(s_d > 0.0, jnp.maximum(t_near, t_plane), t_near)
    valid = (t_entry < t_far) & (t_far > 0.0)
    entry = o + t_entry[..., None] * d
    exit_ = ray_caster_get_back(entry, d)
    world_entry = (
        jnp.concatenate([entry - 0.5, jnp.ones_like(entry[..., :1])], -1)
        @ u.model.T
    )
    clip_entry = world_entry @ (u.view.T @ u.proj.T)
    entry_clip_zw = clip_entry[..., 2:4]
    ray_distance = jnp.linalg.norm(exit_ - entry, axis=-1)
    return RaySetup(
        entry=entry,
        exit=exit_,
        ray_dir=d,
        ray_distance=ray_distance,
        valid=valid,
        depth_init=jnp.zeros((H, W), f),
        entry_clip_zw=entry_clip_zw,
    )
