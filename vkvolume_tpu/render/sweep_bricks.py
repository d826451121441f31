"""Brick-batched plane-sweep kernel — round-3 rework of the separable w-grid
sweep (the production hot path; see sweep_pallas.py for the algorithm and the
mapping from the reference's per-pixel ray march, volume_render.frag:212-312).

Why bricks: the round-2 kernel paid its control costs PER SLAB — one rect
DMA, one coarse-window ESS check, one leap computation, scalar rect math and
two row-block conds for every slab a tile sampled (~540 cycles/slab measured,
of which sampling arithmetic was a minority). The empty-space windows already
span ~2 occupancy-map planes (≈ 8 slabs at block size 4), so batching the
slab loop into 8-slab *bricks* leaves the set of sampled slabs essentially
unchanged while cutting the control costs 8×:

* one (PLANES, R, RECT_W) u8 rect DMA per brick (double the rows of a slab
  rect, half the total bytes: the plane-pair duplication is gone),
* one ESS window + Chebyshev leap per brick (the union-of-endpoints rect is
  exact: qu/qv bounds are concave/convex in t, so endpoint rects contain
  every intermediate slab's rect),
* a statically unrolled in-brick slab loop (slab direction is static: the
  frame plan's ``sgn_p``), with *static* plane offsets and no plane lerp
  when ``n_slabs == Np`` (the default sampling_factor=1 configuration — the
  slab centre lies exactly on voxel plane k, the second plane's lerp weight
  is identically zero; the round-2 kernel DMA'd and lerped it anyway).

Also new vs round 2: 16-row pixel tiles (per-brick work amortised over 2×
the pixels) and per-slab-in-brick tent windows that touch only the 8-row
blocks the slab's footprint overlaps.

Separable (w-grid) sampling only — the general per-pixel path stays in
sweep_pallas._kernel as the correctness twin / fallback.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..options import Test
from ..tf.transfer_function import TFParams
from .marcher_xla import RenderOutput
from .ray_setup import FrameUniforms, RaySetup
from .sweep import _SLICE_AXES

TILE_W = 128
RECT_W = 256
BRICK = 8          # slabs per brick (≈ 2 occupancy-map planes at b=4)
NSLOT = 4          # DMA pipeline depth (3 bricks ahead)
PLANES_MIN = BRICK + 1


def _kernel(meta_ref, fpar_ref,                    # SMEM (prefetch)
            wu_ref, wv_ref, slo_ref, shi_ref, kap_ref, cov_ref,  # VMEM tiles
            coarse_ref,                             # (mp, CVp, 128) u8 VMEM
            cskip_ref,                              # (mp, CVp, 128) u8 VMEM
            vol_ref, grad_ref,                      # ANY (manual DMA)
            lum_ref, alpha_ref, firsts_ref, nsamp_ref,           # outputs
            scratch, sems, gscratch, gsems,
            *, R, PLANES, ert, count_samples, use_gradient, sgn, aligned,
            tile_h, n_slabs, span_blks, texture_tf=False,
            tent_prec=jax.lax.Precision.HIGHEST, rect_w=RECT_W):
    f = jnp.float32
    Np = meta_ref[0]
    Sv = meta_ref[1]
    Su = meta_ref[2]
    Sv_pad = meta_ref[3]
    Su_pad = meta_ref[4]
    bp_p = meta_ref[5]           # voxels per occupancy-map plane along p
    CV = meta_ref[6]
    CU = meta_ref[7]
    kb_occ_lo = meta_ref[8]      # globally occupied brick range
    kb_occ_hi = meta_ref[9]
    CVp = coarse_ref.shape[1]
    mp_c = coarse_ref.shape[0]

    o_u = fpar_ref[0]
    o_v = fpar_ref[1]
    o_p = fpar_ref[2]
    ds = fpar_ref[3]
    imin = fpar_ref[4]
    iinv = fpar_ref[5]
    vaf = fpar_ref[6]
    inv_cvox_v = fpar_ref[7]
    inv_cvox_u = fpar_ref[8]
    gmin = fpar_ref[9]
    ginv = fpar_ref[10]
    drift_u = fpar_ref[11]       # map cells drifted per map plane at |w|=1
    drift_v = fpar_ref[12]

    wu = wu_ref[:]
    wv = wv_ref[:]
    s_lo = slo_ref[:]
    s_hi = shi_ref[:]
    kappa = kap_ref[:]
    cov = cov_ref[:] > 0.0
    # Separable w-grid: wu is column-only (identical rows) and wv is
    # row-only (identical columns) — the per-slab u math runs on ONE 8-row
    # block and the v math on one column (4× fewer vreg ops per slab at
    # 32-row tiles than full-tile arithmetic; the lane gather only ever
    # consumed rows [0:8] anyway).
    wu8 = wu[0:8, :]
    wv_col = wv[:, 0:1]
    cov_row = jnp.any(cov, axis=1, keepdims=True)        # (tile_h, 1)

    big = f(1e30)
    s_lo_t = jnp.min(jnp.where(cov, s_lo, big))
    s_hi_t = jnp.max(jnp.where(cov, s_hi, -big))
    any_cov = jnp.any(cov)

    wu_min = jnp.min(jnp.where(cov, wu, big))
    wu_max = jnp.max(jnp.where(cov, wu, -big))
    wv_min = jnp.min(jnp.where(cov, wv, big))
    wv_max = jnp.max(jnp.where(cov, wv, -big))

    def tent_dot(what, colu):
        """(tile_h, S) @ (S, TILE_W) tent reduction. ``split3`` emulates
        Precision.HIGH (which this Mosaic toolchain rejects as an enum,
        docs/smoke_r4.json brick_rect512_tent_high) with three explicit
        DEFAULT-precision bf16 passes: each operand splits into hi+lo
        bf16 parts and the lo·lo term is dropped — residual error is
        ≤ 2·255·2⁻¹⁸ ≈ 0.002 u8 LSB, half the MXU passes of HIGHEST."""
        dims = (((1,), (0,)), ((), ()))
        if tent_prec == "split3":
            bf = jnp.bfloat16
            w_hi = what.astype(bf)
            w_lo = (what - w_hi.astype(f)).astype(bf)
            c_hi = colu.astype(bf)
            c_lo = (colu - c_hi.astype(f)).astype(bf)
            d = lambda a, b: jax.lax.dot_general(
                a, b, dims, precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=f)
            return d(w_hi, c_hi) + d(w_lo, c_hi) + d(w_hi, c_lo)
        return jax.lax.dot_general(what, colu, dims, precision=tent_prec,
                                   preferred_element_type=f)

    n_bricks = (n_slabs + BRICK - 1) // BRICK      # static

    # Brick index range covering [s_lo_t, s_hi_t] ∩ the occupied range.
    k_a = jnp.floor(s_lo_t / ds - 0.5).astype(jnp.int32)
    k_b = jnp.ceil(s_hi_t / ds - 0.5).astype(jnp.int32)
    kb_a = jnp.clip(jnp.maximum(k_a // BRICK, kb_occ_lo), 0, n_bricks - 1)
    kb_b = jnp.clip(jnp.minimum(k_b // BRICK, kb_occ_hi), 0, n_bricks - 1)
    if sgn > 0:
        kb_begin, kb_end = kb_a, kb_b + 1          # end exclusive
        in_range = lambda kb: kb < kb_end
    else:
        kb_begin, kb_end = kb_b, kb_a - 1
        in_range = lambda kb: kb > kb_end

    def slab_s(k):
        return (k.astype(f) + 0.5) * ds

    def qu_bounds2(k1, k2):
        """Union rect (u/v lo/hi in texel coords) of the endpoint slabs —
        contains every intermediate slab's rect (qu_lo concave / qu_hi
        convex in t)."""
        t1 = slab_s(k1) - o_p
        t2 = slab_s(k2) - o_p
        ulo = jnp.minimum(
            jnp.minimum(wu_min * t1, wu_max * t1),
            jnp.minimum(wu_min * t2, wu_max * t2))
        uhi = jnp.maximum(
            jnp.maximum(wu_min * t1, wu_max * t1),
            jnp.maximum(wu_min * t2, wu_max * t2))
        vlo = jnp.minimum(
            jnp.minimum(wv_min * t1, wv_max * t1),
            jnp.minimum(wv_min * t2, wv_max * t2))
        vhi = jnp.maximum(
            jnp.maximum(wv_min * t1, wv_max * t1),
            jnp.maximum(wv_min * t2, wv_max * t2))
        qu_lo = (o_u + ulo) * Su.astype(f) - 0.5
        qu_hi = (o_u + uhi) * Su.astype(f) - 0.5
        qv_lo = (o_v + vlo) * Sv.astype(f) - 0.5
        qv_hi = (o_v + vhi) * Sv.astype(f) - 0.5
        return qu_lo, qu_hi, qv_lo, qv_hi

    def k0_of(k):
        if aligned:
            return jnp.clip(k, 0, Np - 2)
        zp = slab_s(k) * Np.astype(f) - 0.5
        return jnp.clip(jnp.floor(zp).astype(jnp.int32), 0, Np - 2)

    def brick_geom(kb):
        """(p0, v0a, u0a): aligned DMA origin for brick kb."""
        k1 = kb * BRICK
        k2 = jnp.minimum(k1 + BRICK - 1, n_slabs - 1)
        qu_lo, _, qv_lo, _ = qu_bounds2(k1, k2)
        u0 = jnp.floor(qu_lo).astype(jnp.int32)
        v0 = jnp.floor(qv_lo).astype(jnp.int32)
        u0a = jnp.clip((u0 // 128) * 128, 0, jnp.maximum(Su_pad - rect_w, 0))
        v0a = jnp.clip((v0 // 8) * 8, 0, jnp.maximum(Sv_pad - R, 0))
        p0 = jnp.clip(k0_of(k1), 0, Np - PLANES)
        return p0, v0a, u0a

    # Per-tile footprint drift rate (map cells per map plane along p), for
    # the Chebyshev leap (sweep_pallas._kernel's formula, lifted from
    # volume_render.frag:242-244 to tile granularity).
    rate = jnp.maximum(
        f(1.0),
        jnp.maximum(
            jnp.maximum(jnp.abs(wu_min), jnp.abs(wu_max)) * drift_u,
            jnp.maximum(jnp.abs(wv_min), jnp.abs(wv_max)) * drift_v,
        ),
    )
    inv_dsNp = 1.0 / (ds * Np.astype(f))     # slabs per voxel plane along p
    d_pair = jnp.ceil(2.0 * bp_p.astype(f) * inv_dsNp).astype(jnp.int32)

    def _win_min(ref, m0, qu_lo, qu_hi, qv_lo, qv_hi):
        """Min of ``ref[m0]`` over the (trilinear-dilated) u/v cell window;
        conservatively 0 when the window exceeds the 16-row view."""
        cv_lo = jnp.clip(
            jnp.floor((qv_lo - 1.0) * inv_cvox_v).astype(jnp.int32), 0, CV - 1)
        cv_hi = jnp.clip(
            jnp.floor((qv_hi + 2.0) * inv_cvox_v).astype(jnp.int32), 0, CV - 1)
        cu_lo = jnp.clip(
            jnp.floor((qu_lo - 1.0) * inv_cvox_u).astype(jnp.int32), 0, CU - 1)
        cu_hi = jnp.clip(
            jnp.floor((qu_hi + 2.0) * inv_cvox_u).astype(jnp.int32), 0, CU - 1)
        cv8 = jnp.clip((cv_lo // 8) * 8, 0, jnp.maximum(CVp - 16, 0))
        cv8 = pl.multiple_of(cv8, 8)
        block = ref[m0, pl.ds(cv8, 16), :]                 # (16, 128) u8
        rows = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0) + cv8
        cols = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
        mask = ((rows >= cv_lo) & (rows <= cv_hi)
                & (cols >= cu_lo) & (cols <= cu_hi))
        d = jnp.min(jnp.where(mask, block.astype(jnp.int32), 255))
        return jnp.where(cv_hi > cv8 + 15, 0, d)

    def brick_window(kb):
        """(occupied, d_leap) for brick kb.

        * ``occupied`` — TIGHT: the brick's own union footprint against
          ``cskip_ref`` (occupancy min-pooled over the brick's plane span),
          so the sampled-slab set stays as tight as the per-slab kernel's.
        * ``d_leap`` — EXTENDED: Chebyshev distance under the footprint
          unioned d_pair slabs ahead (lateral drift margin that makes
          ``leap_target``'s plane leap safe — see sweep_pallas)."""
        k1 = kb * BRICK
        k2 = jnp.minimum(k1 + BRICK - 1, n_slabs - 1)
        quT = qu_bounds2(k1, k2)
        if sgn > 0:
            ka, kc = k1, jnp.clip(k2 + d_pair, 0, n_slabs - 1)
            k_front = k1
        else:
            ka, kc = jnp.clip(k1 - d_pair, 0, n_slabs - 1), k2
            k_front = k2
        quE = qu_bounds2(ka, kc)
        m_lo = jnp.clip(k0_of(k1) // bp_p, 0, mp_c - 1)
        m0 = jnp.clip(k0_of(k_front) // bp_p, 0, mp_c - 1)
        occupied = _win_min(cskip_ref, m_lo, *quT) == 0
        d = _win_min(coarse_ref, m0, *quE)
        return occupied, d

    def leap_target(kb, d):
        """First brick after leaping over the empty Chebyshev ball of radius
        d-1 around the window (conservative; never skips an occupied brick)."""
        P = jnp.floor((d.astype(f) - 1.0) / rate).astype(jnp.int32)
        if sgn > 0:
            c0 = k0_of(kb * BRICK) // bp_p
            k_tgt = jnp.floor(
                (((c0 + P + 1) * bp_p - 2).astype(f) + 1.5) * inv_dsNp - 0.5
            ).astype(jnp.int32)
            return jnp.maximum(kb + 1, k_tgt // BRICK)
        k2 = jnp.minimum(kb * BRICK + BRICK - 1, n_slabs - 1)
        c0 = k0_of(k2) // bp_p
        k_tgt = jnp.ceil(
            (((c0 - P) * bp_p).astype(f) + 0.5) * inv_dsNp - 0.5
        ).astype(jnp.int32) - 1
        return jnp.minimum(kb - 1, k_tgt // BRICK)

    def next_valid(kb):
        def cond(st):
            kk, done = st
            return in_range(kk) & ~done

        def body(st):
            kk, _ = st
            occupied, d = brick_window(kk)
            return jnp.where(occupied, kk, leap_target(kk, d)), occupied

        kk, _ = jax.lax.while_loop(cond, body, (kb, jnp.bool_(False)))
        return kk

    def _dma(kb, slot):
        p0, v0a, u0a = brick_geom(kb)
        v0a = pl.multiple_of(v0a, 8)
        u0a = pl.multiple_of(u0a, 128)
        return pltpu.make_async_copy(
            vol_ref.at[pl.ds(p0, PLANES), pl.ds(v0a, R), pl.ds(u0a, rect_w)],
            scratch.at[slot],
            sems.at[slot],
        )

    def _gdma(kb, slot):
        p0, v0a, u0a = brick_geom(kb)
        v0a = pl.multiple_of(v0a, 8)
        u0a = pl.multiple_of(u0a, 128)
        return pltpu.make_async_copy(
            grad_ref.at[pl.ds(p0, PLANES), pl.ds(v0a, R), pl.ds(u0a, rect_w)],
            gscratch.at[slot],
            gsems.at[slot],
        )

    def start_dma(kb, slot):
        _dma(kb, slot).start()
        if use_gradient:
            _gdma(kb, slot).start()

    def wait_dma(kb, slot):
        _dma(kb, slot).wait()
        if use_gradient:
            _gdma(kb, slot).wait()

    zero = jnp.zeros((tile_h, TILE_W), f)
    init_lum = zero
    init_alpha = zero
    init_firsts = jnp.full((tile_h, TILE_W), 2.0, f)
    init_nsamp = jnp.zeros((tile_h, TILE_W), jnp.int32)

    kb_first = next_valid(kb_begin)
    step = 1 if sgn > 0 else -1
    kb1_0 = next_valid(kb_first + step)
    kb2_0 = next_valid(kb1_0 + step)
    kb3_0 = next_valid(kb2_0 + step)

    for i, kk in enumerate((kb_first, kb1_0, kb2_0, kb3_0)):
        @pl.when(any_cov & in_range(kk))
        def _(kk=kk, i=i):
            start_dma(kk, i)

    def live(alpha):
        if not ert:
            return jnp.bool_(True)
        return jnp.any(cov & (alpha <= 0.99))

    def loop_cond(st):
        kb_cur = st[0]
        alpha = st[6]
        return any_cov & in_range(kb_cur) & live(alpha)

    def loop_body(st):
        kb_cur, k1, k2, k3, slot, lum, alpha, firsts, nsamp = st

        wait_dma(kb_cur, slot)

        s_first = slab_s(kb_cur * BRICK)
        s_last = slab_s(jnp.minimum(kb_cur * BRICK + BRICK - 1, n_slabs - 1))
        sb_lo = jnp.minimum(s_first, s_last)
        sb_hi = jnp.maximum(s_first, s_last)
        pixel_work = cov & (sb_hi >= s_lo) & (sb_lo <= s_hi)
        if ert:
            pixel_work = pixel_work & (alpha <= 0.99)
        do_sample = jnp.any(pixel_work)

        def sample_brick(carry):
            lum, alpha, firsts, nsamp = carry
            p0, v0a, u0a = brick_geom(kb_cur)

            def sample_rows(buf, pidx, fp, il0, fu, r_base8):
                """Separable sampling of one slab from brick rows [pidx]
                (and [pidx+1] when not aligned): a FIXED-size row window at
                a dynamic 8-aligned sublane offset (the slab's tent support
                — no per-block conds). BOTH u taps come from ONE lane
                gather per half: adjacent texels are packed into an i32
                lane (v[i] | v[i+1] << 8) so the gather at il0 yields the
                (il0, il0+1) pair (the caller zeroes ``fu`` where the
                second tap is clamped at the volume edge). Returns
                (span_blks*8, TILE_W)."""
                il8 = il0[0:8, :]
                fu8 = fu[0:8, :]
                blocks = []
                for b in range(span_blks):
                    rb = r_base8 + 8 * b
                    r0 = buf[slot, pidx, pl.ds(rb, 8), :]
                    rows = r0.astype(jnp.int32)
                    if not aligned:
                        r1 = buf[slot, pidx + 1, pl.ds(rb, 8), :]
                        rowsf = (rows.astype(f) * (1.0 - fp)
                                 + r1.astype(jnp.int32).astype(f) * fp)
                        # Plane-lerped rows are fractional: pack as fixed-
                        # point u8.8 pairs (exact for the 0..255 range).
                        rows = jnp.round(rowsf * 256.0).astype(jnp.int32)
                        shift, scale = 16, f(1.0 / 256.0)
                    else:
                        shift, scale = 8, f(1.0)
                    nxt = pltpu.roll(rows, rect_w - 1, axis=1)
                    packed = rows | (nxt << shift)
                    halves = tuple(packed[:, 128 * h:128 * (h + 1)]
                                   for h in range(rect_w // 128))

                    g = jnp.take_along_axis(
                        halves[0], jnp.minimum(il8, 127), axis=1)
                    for h in range(1, rect_w // 128):
                        g = jnp.where(
                            il8 < 128 * h, g,
                            jnp.take_along_axis(
                                halves[h],
                                jnp.clip(il8 - 128 * h, 0, 127),
                                axis=1),
                        )
                    mask = (1 << shift) - 1
                    g0 = (g & mask).astype(f) * scale
                    g1 = ((g >> shift) & mask).astype(f) * scale
                    blocks.append(g0 + (g1 - g0) * fu8)      # (8, TILE_W)
                return jnp.concatenate(blocks, axis=0)

            js = range(BRICK) if sgn > 0 else range(BRICK - 1, -1, -1)
            for j in js:
                k = kb_cur * BRICK + j
                s = slab_s(k)
                t = s - o_p
                in_rng = (cov & (s >= s_lo) & (s <= s_hi)
                          & (k < n_slabs))
                if ert:
                    in_rng = in_rng & (alpha <= 0.99)

                qu = (o_u + wu8 * t) * Su.astype(f) - 0.5      # (8, 128)
                qv = jnp.clip((o_v + wv_col * t) * Sv.astype(f) - 0.5,
                              0.0, Sv.astype(f) - 1.0)         # (tile_h, 1)
                iu0 = jnp.clip(jnp.floor(qu).astype(jnp.int32), 0, Su - 1)
                iu1 = jnp.minimum(iu0 + 1, Su - 1)
                fu = jnp.clip(qu - jnp.floor(qu), 0.0, 1.0)
                # Volume right edge: the second tap is clamped onto the
                # first (iu1 == iu0) — the packed pair would read the pad
                # texel instead, so zero the lerp weight (exact: the old
                # two-gather path produced g1 == g0 there).
                fu = jnp.where(iu1 > iu0, fu, 0.0)
                il0 = jnp.clip(iu0 - u0a, 0, rect_w - 1)

                qv_min_t = jnp.min(jnp.where(cov_row, qv, f(1e30)))
                r_lo = jnp.floor(qv_min_t).astype(jnp.int32) - v0a
                r_base8 = jnp.clip((r_lo // 8) * 8, 0,
                                   jnp.int32(R - 8 * span_blks))
                r_base8 = pl.multiple_of(r_base8, 8)

                if aligned:
                    pidx = jnp.clip(k, 0, Np - 2) - p0
                    fp = f(0.0)
                else:
                    zp = s * Np.astype(f) - 0.5
                    kk0 = jnp.clip(jnp.floor(zp).astype(jnp.int32), 0, Np - 2)
                    fp = jnp.clip(zp - kk0.astype(f), 0.0, 1.0)
                    pidx = kk0 - p0

                colu = sample_rows(scratch, pidx, fp, il0, fu, r_base8)
                r_glob = (jax.lax.broadcasted_iota(
                    jnp.int32, (tile_h, 8 * span_blks), 1)
                    + v0a + r_base8).astype(f)
                what = jnp.maximum(0.0, 1.0 - jnp.abs(qv - r_glob))
                intensity = tent_dot(what, colu) * f(1.0 / 255.0)

                if texture_tf:
                    # TRANSFER_FUNCTION_TEXTURE path: the 256×256 texture is
                    # the baked quantised closed form (engine bakes it via
                    # tf/transfer_function.bake_texture, the twin of
                    # src/volume_component.cpp:246-261), so the NEAREST
                    # lookup (transfer_function.glsl:36-38) equals the
                    # closed form evaluated at the quantised texel centre
                    # and truncated to u8 — no 2D gather needed.
                    ii = jnp.clip(jnp.floor(intensity * 256.0), 0.0, 255.0)
                    a_tf = jnp.clip((ii * f(1.0 / 255.0) - imin) * iinv,
                                    0.0, 1.0)
                else:
                    a_tf = jnp.clip((intensity - imin) * iinv, 0.0, 1.0)
                if use_gradient:
                    gcolu = sample_rows(gscratch, pidx, fp, il0, fu,
                                        r_base8)
                    gradient = tent_dot(what, gcolu) * f(1.0 / 255.0)
                    if texture_tf:
                        gi = jnp.clip(jnp.floor(gradient * 256.0), 0.0,
                                      255.0)
                        a_g = jnp.clip((gi * f(1.0 / 255.0) - gmin) * ginv,
                                       0.0, 1.0)
                    else:
                        a_g = jnp.clip((gradient - gmin) * ginv, 0.0, 1.0)
                    a_tf = a_tf * a_g
                if texture_tf:
                    # static_cast<uint8_t> truncation of the bake.
                    a_tf = jnp.floor(jnp.clip(a_tf * 255.0, 0.0, 255.0)
                                     ) * f(1.0 / 255.0)

                a_corr = jnp.clip(
                    vaf * (1.0 - jnp.power(1.0 - a_tf, kappa)), 0.0, 1.0)
                contrib = in_rng & (a_tf > 0.0)
                one_m = 1.0 - alpha
                lum = jnp.where(contrib, lum + one_m * a_tf * a_corr, lum)
                new_alpha = jnp.where(contrib, alpha + one_m * a_corr, alpha)
                hit = contrib & (a_corr > 0.0) & (firsts > 1.5)
                firsts = jnp.where(hit, s, firsts)
                if ert:
                    sat = contrib & (new_alpha > 0.99)
                    new_alpha = jnp.where(sat, 1.0, new_alpha)
                alpha = new_alpha
                if count_samples:
                    nsamp = nsamp + in_rng
            return lum, alpha, firsts, nsamp

        lum, alpha, firsts, nsamp = jax.lax.cond(
            do_sample, sample_brick, lambda c: c,
            (lum, alpha, firsts, nsamp),
        )

        k4 = next_valid(k3 + step)

        @pl.when(in_range(k4))
        def _():
            start_dma(k4, slot)

        return (k1, k2, k3, k4, jax.lax.rem(slot + 1, NSLOT),
                lum, alpha, firsts, nsamp)

    final = jax.lax.while_loop(
        loop_cond, loop_body,
        (kb_first, kb1_0, kb2_0, kb3_0, jnp.int32(0),
         init_lum, init_alpha, init_firsts, init_nsamp),
    )
    kf = final[0:4]
    slot_f = final[4]
    lum, alpha, firsts, nsamp = final[5], final[6], final[7], final[8]

    # Drain in-flight DMAs (early exits leave up to 4 started).
    for i, kk in enumerate(kf):
        @pl.when(any_cov & in_range(kk))
        def _(kk=kk, i=i):
            wait_dma(kk, jax.lax.rem(slot_f + i, NSLOT))

    lum_ref[:] = lum
    alpha_ref[:] = alpha
    firsts_ref[:] = firsts
    nsamp_ref[:] = nsamp


def grid_fields(u: FrameUniforms, wu_g, wv_g, sgn, p_axis, dim_max,
                n_slabs):
    """(s_lo, s_hi, covered, kappa) for w-grid rays, computed DIRECTLY in
    w-space — replicating rays_from_dirs' entry/exit semantics (AABB slab
    test + clip-plane entry clamp + frag-exact back-face recompute,
    render/ray_setup.py) on the unnormalised direction (wu, wv, 1)·sgn.
    Intervals are scale-invariant in |d|, so no 3-D normalisation, no
    RaySetup construction, and no per-pixel division for wu/wv — the
    per-pose grid-field cost inside the fused frame."""
    f = jnp.float32
    v_ax, u_ax = _SLICE_AXES[p_axis]
    o = u.cam_pos_tex
    d = [None, None, None]
    d[p_axis] = jnp.full(wu_g.shape, f(sgn))
    d[u_ax] = wu_g * f(sgn)
    d[v_ax] = wv_g * f(sgn)
    inv = [1.0 / d[a] for a in range(3)]
    t_near = None
    t_far = None
    for a in range(3):
        t0 = (0.0 - o[a]) * inv[a]
        t1 = (1.0 - o[a]) * inv[a]
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1)
        t_near = lo if t_near is None else jnp.maximum(t_near, lo)
        t_far = hi if t_far is None else jnp.minimum(t_far, hi)
    plane = u.plane_tex
    s_o = plane[0] * o[0] + plane[1] * o[1] + plane[2] * o[2] + plane[3]
    s_d = plane[0] * d[0] + plane[1] * d[1] + plane[2] * d[2]
    t_plane = jnp.where(s_d != 0.0, -s_o / jnp.where(s_d == 0.0, 1.0, s_d),
                        jnp.float32(jnp.inf))
    t_entry = jnp.where(s_d > 0.0, jnp.maximum(t_near, t_plane), t_near)
    covered = (t_entry < t_far) & (t_far > 0.0)
    entry = [o[a] + t_entry * d[a] for a in range(3)]
    t_back = None
    for a in range(3):
        t2 = jnp.maximum(-entry[a] * inv[a], (1.0 - entry[a]) * inv[a])
        t_back = t2 if t_back is None else jnp.minimum(t_back, t2)
    s_a = entry[p_axis]
    s_b = t_back * d[p_axis] + entry[p_axis]
    s_lo = jnp.minimum(s_a, s_b)
    s_hi = jnp.maximum(s_a, s_b)
    kappa = (f(dim_max) / f(n_slabs)
             * jnp.sqrt(1.0 + wu_g * wu_g + wv_g * wv_g))
    return s_lo, s_hi, covered, kappa


@functools.partial(
    jax.jit,
    static_argnames=("p_axis", "R", "ert", "test", "count_samples",
                     "n_slabs", "interpret", "dist_leap", "sgn", "tile_h",
                     "span_blks", "texture_tf", "tent_prec",
                     "rect_w"),
)
def _sweep_bricks_jit(
    vol_t, occupancy_t, tf: TFParams, rays: RaySetup, uniforms: FrameUniforms,
    proj_view_model, grad_t=None, grid=None,
    *, p_axis, R, ert, test, count_samples, n_slabs, sgn, tile_h=16,
    span_blks=2, interpret=False, dist_leap=False, texture_tf=False,
    tent_prec=None, rect_w=RECT_W,
):
    """Brick-kernel twin of sweep_pallas._sweep_pallas_jit (separable w-grid
    rays only; ``sgn`` — the slab iteration direction — is static).
    ``grid`` = (wu, wv, s_lo, s_hi, kappa, covered) precomputed w-grid
    fields (see grid_fields) — ``rays`` is then unused (pass None).

    ``tent_prec``: MXU precision of the tent-weight dot ("highest" = 6
    bf16 passes, "high" = 3, "default" = 1). None reads
    VKV_TENT_PRECISION once at trace time (bench A/B knob — an env change
    after the first trace in a process does NOT retrace). The tent inputs
    are ≤ 8 significant bits each (u8 texels lerped once, weights in
    [0, 1]), so "high" is exact to far below 1 u8 LSB; "default" can err
    ~0.5 LSB of intensity."""
    f = jnp.float32
    H, W = (grid[0].shape if grid is not None else rays.valid.shape)
    Np, Sv, Su = vol_t.shape
    v_ax, u_ax = _SLICE_AXES[p_axis]
    Sv_pad = -(-max(Sv, R) // 8) * 8
    Su_pad = -(-max(Su, rect_w) // 128) * 128
    use_gradient = grad_t is not None and tf.use_gradient
    if (Sv_pad, Su_pad) != (Sv, Su):
        vol_t = jnp.pad(vol_t, ((0, 0), (0, Sv_pad - Sv), (0, Su_pad - Su)))
        if use_gradient:
            grad_t = jnp.pad(
                grad_t, ((0, 0), (0, Sv_pad - Sv), (0, Su_pad - Su))
            )
    if not use_gradient:
        grad_t = jnp.zeros((PLANES_MIN, 8, 128), jnp.uint8)

    aligned = n_slabs == Np
    ds_np = Np / n_slabs                       # voxel planes per slab
    PLANES = (BRICK + 1 if aligned
              else int(np.ceil((BRICK - 1) * ds_np)) + 2)
    if Np < PLANES:
        raise ValueError(f"volume too shallow for brick kernel: {Np}")

    o = uniforms.cam_pos_tex
    o_p, o_u, o_v = o[p_axis], o[u_ax], o[v_ax]
    ds = 1.0 / n_slabs
    dim_max = max(Np, Sv, Su)
    if grid is not None:
        wu, wv, s_lo, s_hi, kappa, covered = grid
    else:
        d = rays.ray_dir
        d_p = d[..., p_axis]
        safe_dp = jnp.where(jnp.abs(d_p) < 1e-6,
                            jnp.where(d_p < 0, -1e-6, 1e-6), d_p)
        wu = d[..., u_ax] / safe_dp
        wv = d[..., v_ax] / safe_dp
        s_a = rays.entry[..., p_axis]
        s_b = rays.exit[..., p_axis]
        s_lo = jnp.minimum(s_a, s_b)
        s_hi = jnp.maximum(s_a, s_b)
        covered = rays.valid & (jnp.abs(d_p) > 1e-6)
        kappa = f(dim_max) * ds / jnp.abs(safe_dp)

    # Coarse 2D map (same construction as sweep_pallas; see its docstring).
    mp, mv, mu = occupancy_t.shape
    occ = occupancy_t == 0

    bp_p = -(-Np // mp)
    bp_v = -(-Sv // mv)
    bp_u = -(-Su // mu)

    factor_v = max(1, -(-8 // bp_v))
    factor_u = max(-(-mu // 128), max(1, -(-8 // bp_u)))
    CV = -(-mv // factor_v)
    CU = -(-mu // factor_u)
    dmap = occupancy_t if dist_leap else jnp.minimum(occupancy_t, 1)
    dmap_pad = jnp.pad(
        dmap, ((0, 0), (0, CV * factor_v - mv), (0, CU * factor_u - mu)),
        constant_values=255,
    )
    coarse = jnp.min(
        dmap_pad.reshape(mp, CV, factor_v, CU, factor_u), axis=(2, 4)
    )
    # Leap map: pre-min'd with the next plane (slab k interpolates planes
    # k0, k0+1).
    coarse_pair = jnp.minimum(
        coarse, jnp.concatenate([coarse[1:], coarse[-1:]], axis=0))
    CVp = max(16, -(-CV // 8) * 8)
    coarse_u8 = jnp.pad(
        coarse_pair, ((0, 0), (0, CVp - CV), (0, 128 - CU)),
        constant_values=255,
    ).astype(jnp.uint8)
    # Tight skip map: binary occupancy min-pooled over the plane span one
    # brick covers (cskip[m] == 0 ⇔ an occupied cell exists in map planes
    # [m, m + mp_span]).
    mp_span = -(-(PLANES - 1) // bp_p)
    cbin = jnp.minimum(coarse, 1)
    cskip = cbin
    for s in range(1, mp_span + 1):
        shifted = jnp.concatenate(
            [cbin[s:], jnp.full((min(s, mp), CV, CU), 255, cbin.dtype)],
            axis=0)[:mp]
        cskip = jnp.minimum(cskip, shifted)
    cskip_u8 = jnp.pad(
        cskip, ((0, 0), (0, CVp - CV), (0, 128 - CU)), constant_values=255
    ).astype(jnp.uint8)

    # Globally occupied brick range.
    n_bricks = -(-n_slabs // BRICK)
    nonempty_m = jnp.any(occ, axis=(1, 2))
    ks_i = jnp.arange(n_slabs, dtype=jnp.int32)
    s_ks = (ks_i.astype(f) + 0.5) * ds
    zps = s_ks * Np - 0.5
    k0s = jnp.clip(jnp.floor(zps).astype(jnp.int32), 0, Np - 2)
    m0 = jnp.clip(k0s // bp_p, 0, mp - 1)
    m1 = jnp.clip((k0s + 1) // bp_p, 0, mp - 1)
    ne = nonempty_m[m0] | nonempty_m[m1]
    kb_i = ks_i // BRICK
    kb_occ_lo = jnp.min(jnp.where(ne, kb_i, jnp.int32(n_bricks)))
    kb_occ_hi = jnp.max(jnp.where(ne, kb_i, jnp.int32(-1)))

    meta = jnp.asarray(
        [Np, Sv, Su, Sv_pad, Su_pad, bp_p, CV, CU, 0, 0], jnp.int32,
    ).at[8].set(kb_occ_lo).at[9].set(kb_occ_hi)
    fpar = jnp.stack([
        o_u.astype(f), o_v.astype(f), o_p.astype(f), jnp.float32(ds),
        tf.intensity_min, tf.intensity_range_inv, tf.voxel_alpha_factor,
        jnp.float32(1.0 / (factor_v * bp_v)),
        jnp.float32(1.0 / (factor_u * bp_u)),
        tf.gradient_min, tf.gradient_range_inv,
        jnp.float32(Su * bp_p / (Np * bp_u)),     # drift_u (cells/plane)
        jnp.float32(Sv * bp_p / (Np * bp_v)),     # drift_v
    ])

    grid = (H // tile_h, W // TILE_W)
    tile_map = lambda ty, tx, *_: (ty, tx)

    if tent_prec is None:
        tent_prec = os.environ.get("VKV_TENT_PRECISION", "highest")
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT,
            "split3": "split3"}[tent_prec]

    kern = functools.partial(
        _kernel, R=R, PLANES=PLANES, ert=ert,
        count_samples=count_samples or test == Test.NUM_TEXTURE_SAMPLES,
        use_gradient=use_gradient, sgn=1 if sgn > 0 else -1,
        aligned=aligned, tile_h=tile_h, n_slabs=n_slabs,
        span_blks=min(span_blks, R // 8), texture_tf=texture_tf,
        tent_prec=prec, rect_w=rect_w)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_h, TILE_W), tile_map),   # wu
            pl.BlockSpec((tile_h, TILE_W), tile_map),   # wv
            pl.BlockSpec((tile_h, TILE_W), tile_map),   # s_lo
            pl.BlockSpec((tile_h, TILE_W), tile_map),   # s_hi
            pl.BlockSpec((tile_h, TILE_W), tile_map),   # kappa
            pl.BlockSpec((tile_h, TILE_W), tile_map),   # cov
            pl.BlockSpec(memory_space=pltpu.VMEM),      # coarse leap map
            pl.BlockSpec(memory_space=pltpu.VMEM),      # coarse skip map
            pl.BlockSpec(memory_space=pl.ANY),          # volume
            pl.BlockSpec(memory_space=pl.ANY),          # gradient (or dummy)
        ],
        out_specs=[
            pl.BlockSpec((tile_h, TILE_W), tile_map),
            pl.BlockSpec((tile_h, TILE_W), tile_map),
            pl.BlockSpec((tile_h, TILE_W), tile_map),
            pl.BlockSpec((tile_h, TILE_W), tile_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((NSLOT, PLANES, R, rect_w), jnp.uint8),
            pltpu.SemaphoreType.DMA((NSLOT,)),
            pltpu.VMEM((NSLOT, PLANES, R, rect_w) if use_gradient
                       else (1, 1, 8, 128), jnp.uint8),
            pltpu.SemaphoreType.DMA((NSLOT,)),
        ],
    )

    lum, alpha, firsts, nsamp = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((H, W), f),
            jax.ShapeDtypeStruct((H, W), f),
            jax.ShapeDtypeStruct((H, W), f),
            jax.ShapeDtypeStruct((H, W), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        meta, fpar,
        wu.astype(f), wv.astype(f), s_lo.astype(f), s_hi.astype(f),
        kappa.astype(f), covered.astype(f),
        coarse_u8,
        cskip_u8,
        vol_t,
        grad_t,
    )

    color = jnp.stack([lum, lum, lum, alpha], -1)

    hit = (alpha > 0.0) & (firsts < 1.5)
    t_hit = firsts - o_p
    pen_xyz = [None, None, None]
    pen_xyz[p_axis] = firsts
    pen_xyz[u_ax] = o_u + wu * t_hit
    pen_xyz[v_ax] = o_v + wv * t_hit
    pen = jnp.stack(pen_xyz, -1) - 0.5
    pen_h = jnp.concatenate([pen, jnp.ones((H, W, 1), f)], -1)
    pen_clip = pen_h @ proj_view_model.T
    pen_depth = pen_clip[..., 2] / jnp.where(pen_clip[..., 3] == 0, 1.0,
                                             pen_clip[..., 3])
    depth_init = (jnp.zeros((H, W), f) if rays is None else rays.depth_init)
    depth = jnp.where(hit, pen_depth, depth_init)

    if test == Test.NUM_TEXTURE_SAMPLES:
        n_steps_max = jnp.floor(
            jnp.ceil(f(dim_max) * jnp.sqrt(f(3.0))) * tf.sampling_factor
        )
        val = nsamp.astype(f) / n_steps_max
        color = jnp.concatenate(
            [jnp.stack([val, val, val], -1), jnp.ones((H, W, 1), f)], -1
        )
        color = jnp.where(covered[..., None], color, 0.0)

    zi = jnp.zeros((H, W), jnp.int32)
    return RenderOutput(color=color, depth=depth, num_volume_samples=nsamp,
                        num_distance_samples=zi, num_empty_samples=zi,
                        iterations=jnp.int32(n_slabs))

