"""Final image warp — Pallas kernel resampling the finished w-grid image to
pixels (the "warp" half of the shear-warp factorisation; see frustum.py).

One bilinear projective resample per frame: for every 8×128 pixel tile, DMA
the axis-aligned bounding rect of the tile's source footprint (C×R×384
floats) into VMEM and reconstruct per-pixel values with the same
lane-gather + tent-weight scheme as the sweep kernel. Runs once per frame,
so rect DMAs are issued inline (no double buffering needed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
RECT_W = 640


def _kernel(meta_ref, gx_ref, gy_ref, src_ref, out_ref, scratch, sem, *, R, C):
    f = jnp.float32
    Hi = meta_ref[0]
    Wi = meta_ref[1]

    gx = gx_ref[:]
    gy = gy_ref[:]
    inside = (gx > -5.0)

    big = f(1e30)
    gx_min = jnp.min(jnp.where(inside, gx, big))
    gy_min = jnp.min(jnp.where(inside, gy, big))
    any_in = jnp.any(inside)

    u0 = jnp.floor(gx_min).astype(jnp.int32)
    v0 = jnp.floor(gy_min).astype(jnp.int32)
    u0a = jnp.clip((u0 // 128) * 128, 0, jnp.maximum(Wi - RECT_W, 0))
    v0a = jnp.clip((v0 // 8) * 8, 0, jnp.maximum(Hi - R, 0))
    u0a = pl.multiple_of(u0a, 128)
    v0a = pl.multiple_of(v0a, 8)

    @pl.when(any_in)
    def _():
        dma = pltpu.make_async_copy(
            src_ref.at[:, pl.ds(v0a, R), pl.ds(u0a, RECT_W)], scratch, sem
        )
        dma.start()
        dma.wait()

    gxc = jnp.clip(gx, 0.0, Wi.astype(f) - 1.0)
    gyc = jnp.clip(gy, 0.0, Hi.astype(f) - 1.0)
    iu0 = jnp.clip(jnp.floor(gxc).astype(jnp.int32), 0, Wi - 1)
    iu1 = jnp.minimum(iu0 + 1, Wi - 1)
    fu = jnp.clip(gxc - jnp.floor(gxc), 0.0, 1.0)
    il0 = jnp.clip(iu0 - u0a, 0, RECT_W - 1)
    il1 = jnp.clip(iu1 - u0a, 0, RECT_W - 1)

    N_HALVES = RECT_W // 128

    def u_tap(row_vreg_halves, il):
        # N-way half select for a RECT_W-wide rect row.
        g = jnp.take_along_axis(row_vreg_halves[0], jnp.minimum(il, 127),
                                axis=1)
        for h in range(1, N_HALVES):
            g = jnp.where(
                il < 128 * h, g,
                jnp.take_along_axis(
                    row_vreg_halves[h],
                    jnp.clip(il - 128 * h, 0, 127), axis=1),
            )
        return g

    gy_min_t = jnp.min(jnp.where(inside, gyc, f(1e30)))
    gy_max_t = jnp.max(jnp.where(inside, gyc, f(-1e30)))
    r_lo = jnp.floor(gy_min_t).astype(jnp.int32) - 1 - v0a
    r_hi = jnp.ceil(gy_max_t).astype(jnp.int32) + 1 - v0a

    outs = []
    for c in range(C):
        def row_block(b, acc, c=c):
            def do(acc):
                a = acc
                for rr in range(8):
                    r = b * 8 + rr
                    vg = (v0a + r).astype(f)
                    w_hat = jnp.maximum(0.0, 1.0 - jnp.abs(gyc - vg))
                    row = scratch[c, r, :]
                    halves = tuple(
                        jnp.broadcast_to(
                            row[128 * h:128 * (h + 1)].reshape(1, 128),
                            (TILE_H, 128))
                        for h in range(N_HALVES)
                    )
                    g0 = u_tap(halves, il0)
                    g1 = u_tap(halves, il1)
                    a = a + w_hat * (g0 + (g1 - g0) * fu)
                return a

            overlap = (r_lo <= b * 8 + 7) & (r_hi >= b * 8)
            return jax.lax.cond(overlap, do, lambda a: a, acc)

        acc = jnp.zeros((TILE_H, TILE_W), f)
        for b in range(R // 8):
            acc = row_block(b, acc)
        outs.append(acc)

    stacked = jnp.stack(outs)                     # (C, 8, 128)
    out_ref[:] = jnp.where(inside[None], stacked, 0.0)


@functools.partial(jax.jit, static_argnames=("R",))
def warp_to_pixels(src_chw: jax.Array, gx: jax.Array, gy: jax.Array,
                   *, R: int = 48) -> jax.Array:
    """Resample (C, Hi, Wi) float32 channels to the (H, W) pixel grid at
    continuous source coords (gx, gy); gx < -5 marks uncovered pixels → 0."""
    C, Hi, Wi = src_chw.shape
    H, W = gx.shape
    meta = jnp.asarray([Hi, Wi], jnp.int32)
    kern = functools.partial(_kernel, R=R, C=C)
    tile_map = lambda ty, tx, *_: (ty, tx)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H // TILE_H, W // TILE_W),
        in_specs=[
            pl.BlockSpec((TILE_H, TILE_W), tile_map),
            pl.BlockSpec((TILE_H, TILE_W), tile_map),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((C, TILE_H, TILE_W),
                               lambda ty, tx, *_: (0, ty, tx)),
        scratch_shapes=[
            pltpu.VMEM((C, R, RECT_W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, H, W), jnp.float32),
        grid_spec=grid_spec,
    )(meta, gx, gy, src_chw)
    return out


def required_R(gx, gy, interpret_ok: bool = True) -> int | None:
    """Smallest supported rect height for this pixel→grid map (per-tile row
    span + alignment + tent margin), or None if no candidate fits."""
    H, W = gx.shape
    gxa = np.asarray(gx)
    gya = np.asarray(gy)
    inside = gxa > -5.0
    if not inside.any():
        return 16

    def tile_span(a):
        t = a.reshape(H // TILE_H, TILE_H, W // TILE_W, TILE_W)
        t = np.transpose(t, (0, 2, 1, 3)).reshape(-1, TILE_H * TILE_W)
        m = inside.reshape(H // TILE_H, TILE_H, W // TILE_W, TILE_W)
        m = np.transpose(m, (0, 2, 1, 3)).reshape(-1, TILE_H * TILE_W)
        t = np.where(m, t, np.nan)
        with np.errstate(invalid="ignore"):
            sp = np.nanmax(t, axis=1) - np.nanmin(t, axis=1)
        return np.nanmax(np.where(np.isnan(sp), 0.0, sp))

    span_v = tile_span(gya)
    span_u = tile_span(gxa)
    if span_u > RECT_W - 132:
        return None
    for R in (16, 24, 32, 48, 64, 96, 128, 192):
        if span_v <= R - 10:
            return R
    return None
