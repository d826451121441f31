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


def _kernel(meta_ref, gx_ref, gy_ref, src_ref, out_ref, scratch, sem, *, R, C,
            MAXU, MAXV):
    """``MAXU``/``MAXV``: static max rect bases (128-/8-aligned by
    construction — the caller pads the source; an unaligned traced clip
    bound here was a misaligned-DMA silent-corruption bug, see
    _resample_kernel)."""
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
    u0a = jnp.clip((u0 // 128) * 128, 0, MAXU)
    v0a = jnp.clip((v0 // 8) * 8, 0, MAXV)
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
    # Pad so the static max rect bases stay aligned (see _kernel docstring);
    # pad texels are only ever read with zero tent weight.
    Hi_pad = -(-Hi // 8) * 8
    Wi_pad = -(-Wi // 128) * 128
    if (Hi_pad, Wi_pad) != (Hi, Wi):
        src_chw = jnp.pad(
            src_chw, ((0, 0), (0, Hi_pad - Hi), (0, Wi_pad - Wi)))
    meta = jnp.asarray([Hi, Wi], jnp.int32)
    kern = functools.partial(_kernel, R=R, C=C,
                             MAXU=max(Wi_pad - RECT_W, 0),
                             MAXV=max(Hi_pad - R, 0))
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


# ---------------------------------------------------------------------------
# Two-pass projective warp.
#
# The pixel→grid map is an exact homography (the unnormalized texture-space
# ray direction is affine in the pixel coordinates, so gx and gy are ratios
# of affine functions with a shared denominator — see render/plan.py). A
# homography factors into two 1-D rational resamples (Catmull & Smith 1980):
#
#   pass A:  T(yg, j)  = G(yg, XA(yg, j)),  XA = gx(Î(yg, j), j)
#            where Î solves gy(Î, j) = yg  (closed-form Möbius)
#   pass B:  out(i, j) = T(gy(i, j), j)
#
# Each pass is ROW-ALIGNED: the source rows needed by an output tile are
# exactly the tile's own rows (pass A), or — after transposing T — again the
# tile's own rows (pass B). Only the lane (column) window is dynamic, so one
# (8, RECT) DMA + a couple of lane gathers replace the single-pass warp's
# R×(2×RECT/128) gather loop: ~8 vs ~1920 gathers per channel per tile at a
# 30° view rotation.
# ---------------------------------------------------------------------------


def _resample_epilogue(out_ref, rows_for, pos, inside, base, Ws, *,
                       RECT, C, encode_out):
    """Shared gather/lerp/encode tail of BOTH resample kernels (inline and
    cross-step-pipelined): per channel, two lane-gather taps around
    ``pos - base`` out of the (8, RECT) scratch rows served by
    ``rows_for(c)``, linear blend, masked pixels → 0. Kept in one place so
    the two kernels cannot desync (the device smoke equality-checks them)."""
    f = jnp.float32
    posc = jnp.clip(pos, 0.0, Ws.astype(f) - 1.0)
    iu0 = jnp.floor(posc).astype(jnp.int32)
    fu = jnp.clip(posc - jnp.floor(posc), 0.0, 1.0)
    il0 = jnp.clip(iu0 - base, 0, RECT - 1)
    il1 = jnp.clip(iu0 + 1 - base, 0, RECT - 1)

    def u_tap(halves, il):
        g = jnp.take_along_axis(halves[0], jnp.minimum(il, 127), axis=1)
        for h in range(1, RECT // 128):
            g = jnp.where(
                il < 128 * h, g,
                jnp.take_along_axis(halves[h],
                                    jnp.clip(il - 128 * h, 0, 127), axis=1),
            )
        return g

    for c in range(C):
        rows = rows_for(c)                           # (8, RECT)
        if rows.dtype != jnp.float32:
            rows = rows.astype(jnp.int32).astype(f)
        halves = tuple(rows[:, 128 * h:128 * (h + 1)]
                       for h in range(RECT // 128))
        g0 = u_tap(halves, il0)
        g1 = u_tap(halves, il1)
        val = g0 + (g1 - g0) * fu
        val = jnp.where(inside, val, 0.0)
        if encode_out:
            # Mosaic lacks a direct f32→u16 cast; go via int32.
            out_ref[c, :, :] = jnp.round(
                jnp.clip(val, 0.0, 65535.0)
            ).astype(jnp.int32).astype(jnp.uint16)
        else:
            out_ref[c, :, :] = val


def _resample_kernel(meta_ref, pos_ref, src_ref, out_ref, scratch, sem,
                     *, RECT, C, encode_out, MAXB):
    """out[c, y, x] = lerp(src[c, y, pos[y, x]]) for one 8×128 tile; the
    source rows are the tile's own rows (row-aligned 1-D resample).
    pos < -5 marks masked pixels → 0.

    The source (and, with ``encode_out``, the output) may be uint16-encoded
    values — linear resampling commutes with the affine u16 encoding, and
    the half-width rects halve the warp's DMA traffic (the two-pass warp is
    DMA-bound; values are destined for an 8-bit image, so the ≤1/65535
    quantisation is far below output tolerance).

    ``MAXB``: static max rect base = Ws_pad - RECT, 128-aligned by
    construction (the caller pads source lanes to a 128 multiple). The old
    traced clip bound ``Ws - RECT`` was NOT lane-aligned when Ws %% 128 != 0
    (e.g. a 2368-row grid transposed into lanes), so tiles near the source's
    far edge started a MISALIGNED dynamic DMA under a false
    ``pl.multiple_of`` claim — silent corruption on device (round-5 bisect:
    RECT=1024 bad tiles confined to the far-edge column block)."""
    f = jnp.float32
    Ws = meta_ref[0]
    ty = pl.program_id(0)

    pos = pos_ref[:]
    inside = pos > -5.0
    any_in = jnp.any(inside)

    posc = jnp.clip(pos, 0.0, Ws.astype(f) - 1.0)
    big = f(1e30)
    p_min = jnp.min(jnp.where(inside, posc, big))
    u0 = jnp.floor(p_min).astype(jnp.int32)
    u0a = jnp.clip((u0 // 128) * 128, 0, MAXB)
    u0a = pl.multiple_of(u0a, 128)

    @pl.when(any_in)
    def _():
        dma = pltpu.make_async_copy(
            src_ref.at[:, pl.ds(ty * TILE_H, TILE_H), pl.ds(u0a, RECT)],
            scratch, sem,
        )
        dma.start()
        dma.wait()

    _resample_epilogue(out_ref, lambda c: scratch[c, :, :], pos, inside,
                       u0a, Ws, RECT=RECT, C=C, encode_out=encode_out)


def _resample_kernel_pipe(meta_ref, pos_ref, src_ref, out_ref,
                          scratch, sems, *, RECT, C, encode_out, NTX, NT):
    """Cross-grid-step pipelined twin of _resample_kernel: the (C, 8, RECT)
    rect DMA for tile s+1 is started while tile s computes (the two-pass
    warp is DMA-bound; the inline DMA serialised transfer and compute).
    Possible because the per-tile aligned rect base is precomputed on the
    host side of the jit into an SMEM scalar array — any tile's base is
    readable at any step, and the wait can rebuild the exact descriptor
    the start used. ``meta_ref`` packs [Ws, 0, base_0, base_1, ...]."""
    Ws = meta_ref[0]
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    s = ty * NTX + tx

    # base == -1 marks a fully-masked tile (host sentinel): its DMA is
    # skipped entirely (the pass is DMA-bound; padded pos rows would
    # otherwise transfer (C, 8, RECT) per dead tile). Start and wait use
    # the SAME predicate, so every started DMA is waited exactly once.
    def live(step):
        return meta_ref[2 + step] >= 0

    def dma(step, slot):
        base = jnp.maximum(meta_ref[2 + step], 0)
        base = pl.multiple_of(base, 128)
        ti = step // NTX
        return pltpu.make_async_copy(
            src_ref.at[:, pl.ds(ti * TILE_H, TILE_H), pl.ds(base, RECT)],
            scratch.at[slot], sems.at[slot],
        )

    @pl.when(jnp.logical_and(s == 0, live(s)))
    def _():
        dma(s, jax.lax.rem(s, 2)).start()

    # The next-step base index is clamped for the CONDITION read (at the
    # last step 2+s+1 would index past the scalar array); the body's own
    # dma(s + 1) read only executes when s < NT - 1.
    nxt_live = live(jnp.minimum(s + 1, NT - 1))

    @pl.when(jnp.logical_and(s < NT - 1, nxt_live))
    def _():
        dma(s + 1, jax.lax.rem(s + 1, 2)).start()

    @pl.when(live(s))
    def _():
        dma(s, jax.lax.rem(s, 2)).wait()

    pos = pos_ref[:]
    inside = pos > -5.0
    base = jnp.maximum(meta_ref[2 + s], 0)
    slot = jax.lax.rem(s, 2)
    _resample_epilogue(out_ref, lambda c: scratch[slot, c, :, :], pos,
                       inside, base, Ws, RECT=RECT, C=C,
                       encode_out=encode_out)


@functools.partial(jax.jit,
                   static_argnames=("RECT", "encode_out", "interpret",
                                    "pipeline"))
def resample_rows(src_chw: jax.Array, pos: jax.Array, *, RECT: int = 512,
                  encode_out: bool = False,
                  interpret: bool = False,
                  pipeline: bool | None = None) -> jax.Array:
    """Row-aligned 1-D resample: out[c, y, x] = lerp(src[c, y, pos[y, x]]).

    ``pos`` is (Ho, Wo) with Ho == src rows; Ho % 8 == 0, Wo % 128 == 0.
    pos < -5 → 0 (mask). Per-tile column span must fit RECT - 132 — except
    at RECT == Ws (the full-source rect, plan._pick_rect's frozen-orbit
    rescue), where the window covers every source column and ANY span is
    valid. ``src_chw`` may be uint16 (encoded values); ``encode_out``
    keeps the output uint16-encoded as well. ``interpret`` runs the real
    kernel under the Pallas interpreter (tests).

    ``pipeline``: double-buffer the rect DMA across grid steps (tile s+1's
    transfer overlaps tile s's gathers — the pass is DMA-bound). The
    per-tile aligned bases are precomputed into the scalar-prefetch array.
    None reads VKV_WARP_PIPE once at trace time (device A/B knob)."""
    import os

    C, Hs, Ws = src_chw.shape
    Ho, Wo = pos.shape
    assert Ho == Hs, (Ho, Hs)
    if pipeline is None:
        pipeline = os.environ.get("VKV_WARP_PIPE", "0") == "1"
    out_dtype = jnp.uint16 if encode_out else jnp.float32
    nty, ntx = Ho // TILE_H, Wo // TILE_W
    # Pad source lanes to a 128 multiple so the max rect base Ws_pad - RECT
    # is 128-aligned — an unaligned traced clip bound produced misaligned
    # dynamic DMAs (silent device corruption; see _resample_kernel). The
    # pad column is only ever read with zero tent weight (posc clamps to
    # the REAL Ws - 1, where the fractional tap weight is 0).
    Ws_pad = -(-Ws // 128) * 128
    if Ws_pad != Ws:
        src_chw = jnp.pad(src_chw, ((0, 0), (0, 0), (0, Ws_pad - Ws)))
    assert RECT <= Ws_pad, (RECT, Ws_pad)
    max_base = max(Ws_pad - RECT, 0)

    if pipeline:
        # Per-tile aligned rect bases (the kernel's own min/floor/align
        # math, hoisted to XLA so any step can prefetch any tile's rect).
        pt = pos.reshape(nty, TILE_H, ntx, TILE_W)
        pmin = jnp.min(
            jnp.where(pt > -5.0, jnp.clip(pt, 0.0, Ws - 1.0), jnp.inf),
            axis=(1, 3))
        u0 = jnp.floor(
            jnp.where(jnp.isfinite(pmin), pmin, 0.0)).astype(jnp.int32)
        bases = jnp.clip((u0 // 128) * 128, 0, max_base)
        # Fully-masked tiles (no finite pos) carry base = -1: the kernel
        # skips their rect DMA entirely (the output is masked to 0 anyway).
        bases = jnp.where(jnp.isfinite(pmin), bases, -1)
        meta = jnp.concatenate([
            jnp.asarray([Ws, 0], jnp.int32), bases.reshape(-1)])
        kern = functools.partial(_resample_kernel_pipe, RECT=RECT, C=C,
                                 encode_out=encode_out, NTX=ntx,
                                 NT=nty * ntx)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nty, ntx),
            in_specs=[
                pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, *_: (ty, tx)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((C, TILE_H, TILE_W),
                                   lambda ty, tx, *_: (0, ty, tx)),
            scratch_shapes=[
                pltpu.VMEM((2, C, TILE_H, RECT), src_chw.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((C, Ho, Wo), out_dtype),
            grid_spec=grid_spec,
            interpret=interpret,
        )(meta, pos, src_chw)

    meta = jnp.asarray([Ws], jnp.int32)
    kern = functools.partial(_resample_kernel, RECT=RECT, C=C,
                             encode_out=encode_out, MAXB=max_base)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, *_: (ty, tx)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((C, TILE_H, TILE_W),
                               lambda ty, tx, *_: (0, ty, tx)),
        scratch_shapes=[
            pltpu.VMEM((C, TILE_H, RECT), src_chw.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, Ho, Wo), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, pos, src_chw)


def _resample_rows_reference(src_chw, pos):
    """XLA twin of resample_rows (interpret/test mode)."""
    C, Hs, Ws = src_chw.shape
    posc = jnp.clip(pos, 0.0, Ws - 1.0)
    x0 = jnp.floor(posc).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, Ws - 1)
    fx = posc - jnp.floor(posc)
    r = jnp.arange(Hs)[:, None]
    out = []
    for c in range(C):
        g0 = src_chw[c][r, x0]
        g1 = src_chw[c][r, x1]
        out.append(g0 + (g1 - g0) * fx)
    res = jnp.stack(out)
    return jnp.where((pos > -5.0)[None], res, 0.0)


def warp_two_pass(chans: jax.Array, xa: jax.Array, gy_t: jax.Array,
                  *, RECT_A: int, RECT_B: int, scales=None,
                  interpret: bool = False,
                  pipeline: bool | None = None) -> jax.Array:
    """Projective warp via two row-aligned resamples + transposes.

    chans: (C, Hi, Wi) grid image; xa: (Hi, W) pass-A positions;
    gy_t: (W, Hp) transposed pass-B positions (Hp = H padded to %128).
    Returns (C, Hp, W) — caller crops rows to H.

    ``scales``: per-channel factors mapping values into [0, 65535] — when
    given, the whole warp runs uint16-encoded (half the DMA/transpose
    traffic of the DMA-bound passes; ≤1/65535 quantisation per pass) and
    the output is decoded back. Channels already in [0, 65535] use 1.0.
    """
    if interpret:
        t = _resample_rows_reference(chans, xa)
        out_t = _resample_rows_reference(jnp.swapaxes(t, 1, 2), gy_t)
        return jnp.swapaxes(out_t, 1, 2)
    if scales is not None:
        sc = jnp.asarray(scales, jnp.float32)[:, None, None]
        enc = jnp.round(
            jnp.clip(chans * sc, 0.0, 65535.0)).astype(jnp.uint16)
        t = resample_rows(enc, xa, RECT=RECT_A, encode_out=True,
                          pipeline=pipeline)
        out_t = resample_rows(jnp.swapaxes(t, 1, 2), gy_t, RECT=RECT_B,
                              pipeline=pipeline)
        return jnp.swapaxes(out_t, 1, 2) / sc              # (C, Hp, W)
    t = resample_rows(chans, xa, RECT=RECT_A,
                      pipeline=pipeline)                   # (C, Hi, W)
    out_t = resample_rows(jnp.swapaxes(t, 1, 2), gy_t, RECT=RECT_B,
                          pipeline=pipeline)
    return jnp.swapaxes(out_t, 1, 2)                       # (C, Hp, W)


def warp_two_pass_b(chans: jax.Array, yb: jax.Array, gx_p: jax.Array,
                    *, RECT_A: int, RECT_B: int, scales=None,
                    interpret: bool = False,
                    pipeline: bool | None = None) -> jax.Array:
    """Column-first projective warp (the transposed Catmull-Smith order;
    picked by the plan when the row-first order degenerates — see
    plan.two_pass_warp_plan).

    chans: (C, Hi, Wi) grid image; yb: (Wi, Hp) pass-1 positions into grid
    rows (per grid COLUMN); gx_p: (Hp, W) pass-2 positions into grid
    columns (per padded pixel row). Returns (C, Hp, W) — caller crops.
    ``scales`` as in warp_two_pass (u16-encoded passes)."""
    src = jnp.swapaxes(chans, 1, 2)                        # (C, Wi, Hi)
    if interpret:
        t = _resample_rows_reference(src, yb)              # (C, Wi, Hp)
        return _resample_rows_reference(jnp.swapaxes(t, 1, 2), gx_p)
    if scales is not None:
        sc = jnp.asarray(scales, jnp.float32)[:, None, None]
        enc = jnp.round(
            jnp.clip(src * sc, 0.0, 65535.0)).astype(jnp.uint16)
        t = resample_rows(enc, yb, RECT=RECT_A, encode_out=True,
                          pipeline=pipeline)
        return resample_rows(jnp.swapaxes(t, 1, 2), gx_p, RECT=RECT_B,
                             pipeline=pipeline) / sc
    t = resample_rows(src, yb, RECT=RECT_A, pipeline=pipeline)
    return resample_rows(jnp.swapaxes(t, 1, 2), gx_p, RECT=RECT_B,
                         pipeline=pipeline)


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
