"""Plane-sweep renderer — Pallas TPU kernel (the flagship hot path).

Same algorithm as render/sweep.py (see its docstring for the mapping from
the reference's per-pixel ray march, volume_render.frag:212-312, to the
slab sweep), hand-scheduled for the TPU memory hierarchy:

* Grid over 8×128 **pixel tiles**; each tile runs its own slab loop with
  per-tile empty-space skipping and early-ray-termination breaks — the
  Pallas analogue of per-ray ESS/ERT.
* Per (tile, slab): one aligned async DMA pulls the 2×R×256 uint8 source
  rect (the two voxel planes the slab interpolates, restricted to the
  tile's footprint) HBM→VMEM, double-buffered so the next slab's rect
  streams in while the current one is sampled.
* Trilinear reconstruction = plane lerp (scalar weight) → per-row lane
  gathers (`take_along_axis` on (8,128) vregs — the VPU's dynamic-gather
  unit) for the two u taps → tent("hat")-weighted accumulation over source
  rows, which performs the v lerp exactly (the tent weight is nonzero for
  exactly the two straddling rows).
* ESS: per-slab occupied bounding boxes (derived from the same occupancy
  map the reference builds, occupancy_map.comp) live in SMEM; slabs whose
  bbox misses the tile's footprint are skipped *without issuing their DMA*.
  Empty-slab skipping is exact (all-zero-alpha corners interpolate to zero
  alpha).
* ERT: the slab loop breaks once every covered pixel in the tile is
  saturated (alpha > 0.99 ⇒ forced to 1, volume_render.frag:293-299), and
  when the slab plane passes the tile's furthest exit.

Constraints (checked by the wrapper; violations fall back to the XLA
sweep): H % 8 == 0, W % 128 == 0, per-tile source footprint <= 252
texels wide and <= R-10 rows tall (true
whenever a volume texel covers >= ~1 pixel, e.g. any fit-to-viewport or
zoomed view).
"""

from __future__ import annotations

import functools
import math
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
from .sweep import _SLICE_AXES, principal_axis, transpose_for_axis

TILE_H = 8
TILE_W = 128
RECT_W = 256


def _kernel(meta_ref, fpar_ref,                    # SMEM (prefetch)
            wu_ref, wv_ref, slo_ref, shi_ref, kap_ref, cov_ref,  # VMEM tiles
            coarse_ref,                             # (mp, CVp, 128) u8 VMEM
            vol_ref,                                # ANY (manual DMA)
            grad_ref,                               # ANY (zeros if unused)
            lum_ref, alpha_ref, firsts_ref, nsamp_ref,           # outputs
            scratch, sems, gscratch, gsems,         # rect buffers + DMA sems
            *, R, ert, count_samples, use_gradient, separable):
    f = jnp.float32
    n_slabs = meta_ref[0]
    Np = meta_ref[1]
    Sv = meta_ref[2]             # logical extents (sampling clamps)
    Su = meta_ref[3]
    sgn_i = meta_ref[4]          # +1 / -1 slab iteration direction
    Sv_pad = meta_ref[5]         # padded extents (aligned DMA bounds)
    Su_pad = meta_ref[6]
    bp_p = meta_ref[7]           # voxels per occupancy-map plane along p
    CV = meta_ref[8]             # logical coarse-occupancy rows
    CU = meta_ref[9]             # logical coarse-occupancy cols

    o_u = fpar_ref[0]
    o_v = fpar_ref[1]
    o_p = fpar_ref[2]
    ds = fpar_ref[3]
    imin = fpar_ref[4]
    iinv = fpar_ref[5]
    vaf = fpar_ref[6]
    inv_cvox_v = fpar_ref[7]     # 1 / (voxels per coarse cell along v)
    inv_cvox_u = fpar_ref[8]
    gmin = fpar_ref[9]
    ginv = fpar_ref[10]
    drift_u = fpar_ref[11]       # map cells drifted per map plane at |w|=1
    drift_v = fpar_ref[12]
    CVp = coarse_ref.shape[1]
    mp_c = coarse_ref.shape[0]

    wu = wu_ref[:]
    wv = wv_ref[:]
    s_lo = slo_ref[:]
    s_hi = shi_ref[:]
    kappa = kap_ref[:]
    cov = cov_ref[:] > 0.0

    big = f(1e30)
    s_lo_t = jnp.min(jnp.where(cov, s_lo, big))
    s_hi_t = jnp.max(jnp.where(cov, s_hi, -big))
    any_cov = jnp.any(cov)

    wu_min = jnp.min(jnp.where(cov, wu, big))
    wu_max = jnp.max(jnp.where(cov, wu, -big))
    wv_min = jnp.min(jnp.where(cov, wv, big))
    wv_max = jnp.max(jnp.where(cov, wv, -big))

    # Slab index range covering [s_lo_t, s_hi_t]: s_k = (k + 0.5) * ds.
    k_a = jnp.floor(s_lo_t / ds - 0.5).astype(jnp.int32)
    k_b = jnp.ceil(s_hi_t / ds - 0.5).astype(jnp.int32)
    # Clamp to the globally occupied slab range (meta[10..11]) — slabs
    # outside it are empty for every tile.
    k_a = jnp.clip(jnp.maximum(k_a, meta_ref[10]), 0, n_slabs - 1)
    k_b = jnp.clip(jnp.minimum(k_b, meta_ref[11]), 0, n_slabs - 1)
    k_begin = jnp.where(sgn_i > 0, k_a, k_b)
    k_end = jnp.where(sgn_i > 0, k_b + 1, k_a - 1)   # exclusive

    def in_range(k):
        return jnp.where(sgn_i > 0, k < k_end, k > k_end)

    def rect_uv(k):
        """Aligned rect origin (v0a, u0a) for slab k (scalars)."""
        s = (k.astype(f) + 0.5) * ds
        t = s - o_p
        qu_lo = (o_u + jnp.minimum(wu_min * t, wu_max * t)) * Su.astype(f) - 0.5
        qv_lo = (o_v + jnp.minimum(wv_min * t, wv_max * t)) * Sv.astype(f) - 0.5
        u0 = jnp.floor(qu_lo).astype(jnp.int32)
        v0 = jnp.floor(qv_lo).astype(jnp.int32)
        u0a = jnp.clip((u0 // 128) * 128, 0, jnp.maximum(Su_pad - RECT_W, 0))
        v0a = jnp.clip((v0 // 8) * 8, 0, jnp.maximum(Sv_pad - R, 0))
        return v0a, u0a

    def qu_bounds(k):
        s = (k.astype(f) + 0.5) * ds
        t = s - o_p
        qu_lo = (o_u + jnp.minimum(wu_min * t, wu_max * t)) * Su.astype(f) - 0.5
        qu_hi = (o_u + jnp.maximum(wu_min * t, wu_max * t)) * Su.astype(f) - 0.5
        qv_lo = (o_v + jnp.minimum(wv_min * t, wv_max * t)) * Sv.astype(f) - 0.5
        qv_hi = (o_v + jnp.maximum(wv_min * t, wv_max * t)) * Sv.astype(f) - 0.5
        return qu_lo, qu_hi, qv_lo, qv_hi

    def k0_of(k):
        s = (k.astype(f) + 0.5) * ds
        zp = s * Np.astype(f) - 0.5
        return jnp.clip(jnp.floor(zp).astype(jnp.int32), 0, Np - 2)

    # Per-tile footprint drift rate (map cells per map plane along p) for
    # the Chebyshev leap: a leap of P planes drifts the footprint by at
    # most P·rate cells in u/v, so P = floor((d-1)/rate) stays inside the
    # empty Chebyshev ball of radius d-1 (the reference's leap formula,
    # volume_render.frag:242-244, lifted to tile granularity).
    rate = jnp.maximum(
        f(1.0),
        jnp.maximum(
            jnp.maximum(jnp.abs(wu_min), jnp.abs(wu_max)) * drift_u,
            jnp.maximum(jnp.abs(wv_min), jnp.abs(wv_max)) * drift_v,
        ),
    )
    inv_dsNp = 1.0 / (ds * Np.astype(f))     # slabs per voxel plane along p

    def window_min_d(k):
        """Min pooled map value over the tile's (dilated) footprint on slab
        k's map planes (coarse_ref[m] is pre-min'd with plane m+1): 0 means
        an occupied cell is in the footprint (must sample); d ≥ 1 means
        every cell within Chebyshev d-1 of the footprint is empty.

        The footprint is the UNION of the windows at slab k and at the slab
        two map planes ahead (in the travel direction): a leap of P planes
        drifts the footprint laterally, and measuring the ball from the
        pair-wide window leaves a full plane of drift margin for
        ``leap_target``'s P = floor((d-1)/rate) (the per-slab window alone
        under-covers by ~one plane of drift — intermediate skipped slabs in
        the same plane pair would escape it laterally on diagonal views)."""
        kc = jnp.clip(k, 0, n_slabs - 1)
        # Slabs per two map planes along p.
        d_pair = jnp.ceil(2.0 * bp_p.astype(f) / (ds * Np.astype(f))
                          ).astype(jnp.int32)
        k2 = jnp.clip(kc + jnp.where(sgn_i > 0, d_pair, -d_pair),
                      0, n_slabs - 1)
        qu_lo1, qu_hi1, qv_lo1, qv_hi1 = qu_bounds(kc)
        qu_lo2, qu_hi2, qv_lo2, qv_hi2 = qu_bounds(k2)
        qu_lo = jnp.minimum(qu_lo1, qu_lo2)
        qu_hi = jnp.maximum(qu_hi1, qu_hi2)
        qv_lo = jnp.minimum(qv_lo1, qv_lo2)
        qv_hi = jnp.maximum(qv_hi1, qv_hi2)
        m0 = jnp.clip(k0_of(kc) // bp_p, 0, mp_c - 1)
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
        block = coarse_ref[m0, pl.ds(cv8, 16), :]          # (16, 128) u8
        rows = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0) + cv8
        cols = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
        mask = ((rows >= cv_lo) & (rows <= cv_hi)
                & (cols >= cu_lo) & (cols <= cu_hi))
        d = jnp.min(jnp.where(mask, block.astype(jnp.int32), 255))
        # Window taller than the 16-row view → can't see the whole
        # footprint → conservatively occupied.
        return jnp.where(cv_hi > cv8 + 15, 0, d)

    def leap_target(k, d):
        """Next slab index after leaping over the empty Chebyshev ball of
        radius d-1 around slab k's footprint (conservative: may land one
        slab short; never lands past an occupied slab)."""
        P = jnp.floor((d.astype(f) - 1.0) / rate).astype(jnp.int32)
        c0 = k0_of(k) // bp_p
        fwd = jnp.maximum(
            k + 1,
            jnp.floor(
                (((c0 + P + 1) * bp_p - 2).astype(f) + 1.5) * inv_dsNp - 0.5
            ).astype(jnp.int32),
        )
        bwd = jnp.minimum(
            k - 1,
            jnp.ceil(
                (((c0 - P) * bp_p).astype(f) + 0.5) * inv_dsNp - 0.5
            ).astype(jnp.int32) - 1,
        )
        return jnp.where(sgn_i > 0, fwd, bwd)

    def next_valid(k):
        """First slab k' (k inclusive, stepping sgn) whose footprint holds
        an occupied map cell, leaping by the Chebyshev distance; k_end-ward
        out-of-range if none."""
        def cond(st):
            kk, done = st
            return in_range(kk) & ~done

        def body(st):
            kk, _ = st
            d = window_min_d(kk)
            occupied = d == 0
            return jnp.where(occupied, kk, leap_target(kk, d)), occupied

        kk, _ = jax.lax.while_loop(cond, body, (k, jnp.bool_(False)))
        return kk

    def _dma(k, slot):
        v0a, u0a = rect_uv(k)
        k0 = k0_of(k)
        v0a = pl.multiple_of(v0a, 8)
        u0a = pl.multiple_of(u0a, 128)
        return pltpu.make_async_copy(
            vol_ref.at[pl.ds(k0, 2), pl.ds(v0a, R), pl.ds(u0a, RECT_W)],
            scratch.at[slot],
            sems.at[slot],
        )

    def _gdma(k, slot):
        v0a, u0a = rect_uv(k)
        k0 = k0_of(k)
        v0a = pl.multiple_of(v0a, 8)
        u0a = pl.multiple_of(u0a, 128)
        return pltpu.make_async_copy(
            grad_ref.at[pl.ds(k0, 2), pl.ds(v0a, R), pl.ds(u0a, RECT_W)],
            gscratch.at[slot],
            gsems.at[slot],
        )

    def start_dma(k, slot):
        _dma(k, slot).start()
        if use_gradient:
            _gdma(k, slot).start()

    def wait_dma(k, slot):
        # Reconstruct the same descriptors that were issued into this slot.
        _dma(k, slot).wait()
        if use_gradient:
            _gdma(k, slot).wait()

    zero = jnp.zeros((TILE_H, TILE_W), f)
    init_lum = zero
    init_alpha = zero
    init_firsts = jnp.full((TILE_H, TILE_W), 2.0, f)
    init_nsamp = jnp.zeros((TILE_H, TILE_W), jnp.int32)

    # 3-deep prefetch pipeline: while slab k_cur is sampled, the rects for
    # the next three valid slabs stream in (hides the per-rect DMA latency
    # that otherwise serialises the slab loop).
    k_first = next_valid(k_begin)
    k1_0 = next_valid(k_first + sgn_i)
    k2_0 = next_valid(k1_0 + sgn_i)
    k3_0 = next_valid(k2_0 + sgn_i)

    for i, kk in enumerate((k_first, k1_0, k2_0, k3_0)):
        @pl.when(any_cov & in_range(kk))
        def _(kk=kk, i=i):
            start_dma(kk, i)

    def live(alpha):
        if not ert:
            return jnp.bool_(True)
        return jnp.any(cov & (alpha <= 0.99))

    def loop_cond(st):
        k_cur = st[0]
        alpha = st[6]
        return any_cov & in_range(k_cur) & live(alpha)

    def loop_body(st):
        k_cur, k1, k2, k3, slot, lum, alpha, firsts, nsamp = st

        wait_dma(k_cur, slot)

        s_cur = (k_cur.astype(f) + 0.5) * ds
        pixel_work = cov & (s_cur >= s_lo) & (s_cur <= s_hi)
        if ert:
            pixel_work = pixel_work & (alpha <= 0.99)
        do_sample = jnp.any(pixel_work)

        def sample_block(carry):
            lum, alpha, firsts, nsamp = carry
            # ---- Sample slab k_cur from scratch[slot] ----
            s = (k_cur.astype(f) + 0.5) * ds
            t = s - o_p
            zp = s * Np.astype(f) - 0.5
            k0 = jnp.clip(jnp.floor(zp).astype(jnp.int32), 0, Np - 2)
            fp = jnp.clip(zp - k0.astype(f), 0.0, 1.0)
            v0a, u0a = rect_uv(k_cur)

            qu = (o_u + wu * t) * Su.astype(f) - 0.5
            qv = (o_v + wv * t) * Sv.astype(f) - 0.5
            qv = jnp.clip(qv, 0.0, Sv.astype(f) - 1.0)
            iu0 = jnp.clip(jnp.floor(qu).astype(jnp.int32), 0, Su - 1)
            iu1 = jnp.minimum(iu0 + 1, Su - 1)
            fu = jnp.clip(qu - jnp.floor(qu), 0.0, 1.0)
            il0 = jnp.clip(iu0 - u0a, 0, RECT_W - 1)
            il1 = jnp.clip(iu1 - u0a, 0, RECT_W - 1)

            # Tent support: only rows in [floor(min qv), ceil(max qv)+1]
            # contribute; whole 8-row blocks outside are skipped.
            qv_min_t = jnp.min(jnp.where(cov, qv, f(1e30)))
            qv_max_t = jnp.max(jnp.where(cov, qv, f(-1e30)))
            r_lo = jnp.floor(qv_min_t).astype(jnp.int32) - 1 - v0a
            r_hi = jnp.ceil(qv_max_t).astype(jnp.int32) + 1 - v0a

            def sample_rows_general(buf):
                """Arbitrary per-pixel (wu, wv): per-row tent accumulation
                (each rect row broadcast to the tile, gathered per pixel)."""
                def row_block(b, acc):
                    def do(acc):
                        a = acc
                        for rr in range(8):
                            r = b * 8 + rr
                            vg = (v0a + r).astype(f)
                            w_hat = jnp.maximum(0.0, 1.0 - jnp.abs(qv - vg))
                            row0 = buf[slot, 0, r, :].astype(jnp.int32).astype(f)
                            row1 = buf[slot, 1, r, :].astype(jnp.int32).astype(f)
                            row = row0 * (1.0 - fp) + row1 * fp  # (RECT_W,)
                            thirds = tuple(
                                jnp.broadcast_to(
                                    row[128 * h:128 * (h + 1)].reshape(1, 128),
                                    (TILE_H, 128))
                                for h in range(RECT_W // 128)
                            )

                            def u_tap(il):
                                g = jnp.take_along_axis(
                                    thirds[0], jnp.minimum(il, 127), axis=1)
                                for h in range(1, RECT_W // 128):
                                    g = jnp.where(
                                        il < 128 * h, g,
                                        jnp.take_along_axis(
                                            thirds[h],
                                            jnp.clip(il - 128 * h, 0, 127),
                                            axis=1),
                                    )
                                return g

                            g0 = u_tap(il0)
                            g1 = u_tap(il1)
                            col = g0 + (g1 - g0) * fu
                            a = a + w_hat * col
                        return a

                    overlap = (r_lo <= b * 8 + 7) & (r_hi >= b * 8)
                    return jax.lax.cond(overlap, do, lambda a: a, acc)

                acc = jnp.zeros((TILE_H, TILE_W), f)
                for b in range(R // 8):
                    acc = row_block(b, acc)
                return acc

            def sample_rows_separable(buf):
                """w-grid sampling: wu constant per column, wv per row, so
                one lane gather serves 8 rect rows at once (sublane batch)
                and the v tent reduces to an (8,R)@(R,128) matmul."""
                blocks = []
                for b in range(R // 8):
                    def do(_, b=b):
                        r0 = buf[slot, 0, b * 8:(b + 1) * 8, :]
                        r1 = buf[slot, 1, b * 8:(b + 1) * 8, :]
                        rows = (r0.astype(jnp.int32).astype(f) * (1.0 - fp)
                                + r1.astype(jnp.int32).astype(f) * fp)
                        halves = tuple(rows[:, 128 * h:128 * (h + 1)]
                                       for h in range(RECT_W // 128))

                        def u_tap(il):
                            g = jnp.take_along_axis(
                                halves[0], jnp.minimum(il, 127), axis=1)
                            for h in range(1, RECT_W // 128):
                                g = jnp.where(
                                    il < 128 * h, g,
                                    jnp.take_along_axis(
                                        halves[h],
                                        jnp.clip(il - 128 * h, 0, 127),
                                        axis=1),
                                )
                            return g

                        g0 = u_tap(il0)
                        g1 = u_tap(il1)
                        return g0 + (g1 - g0) * fu           # (8, TILE_W)

                    overlap = (r_lo <= b * 8 + 7) & (r_hi >= b * 8)
                    blocks.append(jax.lax.cond(
                        overlap, do,
                        lambda _: jnp.zeros((8, TILE_W), f), 0))
                colu = jnp.concatenate(blocks, axis=0)        # (R, TILE_W)
                # Tent weights per tile row (qv is sublane-constant).
                r_glob = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, R), 1)
                          + v0a).astype(f)
                what = jnp.maximum(0.0, 1.0 - jnp.abs(qv[:, 0:1] - r_glob))
                return jax.lax.dot_general(
                    what, colu, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=f,
                )

            sample_rows = (sample_rows_separable if separable
                           else sample_rows_general)

            intensity = sample_rows(scratch) * f(1.0 / 255.0)
            a_tf = jnp.clip((intensity - imin) * iinv, 0.0, 1.0)
            if use_gradient:
                gradient = sample_rows(gscratch) * f(1.0 / 255.0)
                a_g = jnp.clip((gradient - gmin) * ginv, 0.0, 1.0)
                a_tf = a_tf * a_g

            in_rng = cov & (s >= s_lo) & (s <= s_hi)
            if ert:
                in_rng = in_rng & (alpha <= 0.99)
            a_corr = jnp.clip(vaf * (1.0 - jnp.power(1.0 - a_tf, kappa)),
                              0.0, 1.0)
            contrib = in_rng & (a_tf > 0.0)
            one_m = 1.0 - alpha
            lum = jnp.where(contrib, lum + one_m * a_tf * a_corr, lum)
            new_alpha = jnp.where(contrib, alpha + one_m * a_corr, alpha)
            hit = contrib & (a_corr > 0.0) & (firsts > 1.5)
            firsts = jnp.where(hit, s, firsts)
            if ert:
                sat = contrib & (new_alpha > 0.99)
                new_alpha = jnp.where(sat, 1.0, new_alpha)
            if count_samples:
                nsamp = nsamp + in_rng
            return lum, new_alpha, firsts, nsamp

        lum, alpha, firsts, nsamp = jax.lax.cond(
            do_sample, sample_block, lambda c: c,
            (lum, alpha, firsts, nsamp),
        )

        # Refill the pipeline: slot just freed takes the 4th slab ahead.
        k4 = next_valid(k3 + sgn_i)

        @pl.when(in_range(k4))
        def _():
            start_dma(k4, slot)

        return (k1, k2, k3, k4, jax.lax.rem(slot + 1, 4),
                lum, alpha, firsts, nsamp)

    final = jax.lax.while_loop(
        loop_cond, loop_body,
        (k_first, k1_0, k2_0, k3_0, jnp.int32(0),
         init_lum, init_alpha, init_firsts, init_nsamp),
    )
    k_f0, k_f1, k_f2, k_f3, slot_f = final[0], final[1], final[2], final[3], final[4]
    lum, alpha, firsts, nsamp = final[5], final[6], final[7], final[8]

    # Drain: on early exit (ERT / range end) up to four prefetched DMAs may
    # still be in flight; their semaphores must be consumed or they poison
    # the next tile's waits.
    for i, kk in enumerate((k_f0, k_f1, k_f2, k_f3)):
        @pl.when(any_cov & in_range(kk))
        def _(kk=kk, i=i):
            wait_dma(kk, jax.lax.rem(slot_f + i, 4))

    lum_ref[:] = lum
    alpha_ref[:] = alpha
    firsts_ref[:] = firsts
    nsamp_ref[:] = nsamp


@functools.partial(
    jax.jit,
    static_argnames=("p_axis", "R", "ert", "test", "count_samples",
                     "n_slabs", "interpret", "separable", "dist_leap"),
)
def _sweep_pallas_jit(
    vol_t, occupancy_t, tf: TFParams, rays: RaySetup, uniforms: FrameUniforms,
    proj_view_model, grad_t=None,
    *, p_axis, R, ert, test, count_samples, n_slabs, interpret=False,
    separable=False, dist_leap=False,
):
    f = jnp.float32
    H, W = rays.valid.shape
    Np, Sv, Su = vol_t.shape
    v_ax, u_ax = _SLICE_AXES[p_axis]
    # Pad the slice axes so every clamped, aligned DMA base stays aligned.
    Sv_pad = -(-max(Sv, R) // 8) * 8
    Su_pad = -(-max(Su, RECT_W) // 128) * 128
    use_gradient = grad_t is not None and tf.use_gradient
    if (Sv_pad, Su_pad) != (Sv, Su):
        vol_t = jnp.pad(vol_t, ((0, 0), (0, Sv_pad - Sv), (0, Su_pad - Su)))
        if use_gradient:
            grad_t = jnp.pad(
                grad_t, ((0, 0), (0, Sv_pad - Sv), (0, Su_pad - Su))
            )
    if not use_gradient:
        grad_t = jnp.zeros((Np, 8, 128), jnp.uint8)  # placeholder, never read

    d = rays.ray_dir
    d_p = d[..., p_axis]
    o = uniforms.cam_pos_tex
    o_p, o_u, o_v = o[p_axis], o[u_ax], o[v_ax]

    sgn = jnp.sign(jnp.sum(jnp.where(rays.valid, d_p, 0.0)))
    sgn = jnp.where(sgn == 0.0, 1.0, sgn)
    safe_dp = jnp.where(jnp.abs(d_p) < 1e-6,
                        jnp.where(d_p < 0, -1e-6, 1e-6), d_p)
    wu = d[..., u_ax] / safe_dp
    wv = d[..., v_ax] / safe_dp
    s_a = rays.entry[..., p_axis]
    s_b = rays.exit[..., p_axis]
    s_lo = jnp.minimum(s_a, s_b)
    s_hi = jnp.maximum(s_a, s_b)
    covered = rays.valid & (jnp.abs(d_p) > 1e-6)
    ds = 1.0 / n_slabs
    dim_max = max(Np, Sv, Su)
    kappa = f(dim_max) * ds / jnp.abs(safe_dp)

    # ---- coarse 2D map for per-(tile, slab) culling + Chebyshev leaps ----
    # Pooled MIN of the map (0 = occupied): for a plain occupancy map the
    # values are clamped to {0, 1} (leaps degenerate to single steps); for a
    # Chebyshev distance map (dist_leap) the values drive multi-plane leaps.
    # Cell size: >= 8 voxels along v (bounds the in-kernel 16-row window),
    # and mu pooled into <= 128 lanes along u.
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
    # Min with the next plane: slab k interpolates map planes m0 and m0+1.
    coarse = jnp.minimum(coarse, jnp.concatenate([coarse[1:], coarse[-1:]],
                                                 axis=0))
    CVp = max(16, -(-CV // 8) * 8)
    coarse_u8 = jnp.pad(
        coarse, ((0, 0), (0, CVp - CV), (0, 128 - CU)), constant_values=255
    ).astype(jnp.uint8)

    # Globally occupied slab range (slabs outside are empty for every tile).
    nonempty_m = jnp.any(occ, axis=(1, 2))
    ks_i = jnp.arange(n_slabs, dtype=jnp.int32)
    s_ks = (ks_i.astype(f) + 0.5) * ds
    zps = s_ks * Np - 0.5
    k0s = jnp.clip(jnp.floor(zps).astype(jnp.int32), 0, Np - 2)
    m0 = jnp.clip(k0s // bp_p, 0, mp - 1)
    m1 = jnp.clip((k0s + 1) // bp_p, 0, mp - 1)
    ne = nonempty_m[m0] | nonempty_m[m1]
    k_occ_lo = jnp.min(jnp.where(ne, ks_i, jnp.int32(n_slabs)))
    k_occ_hi = jnp.max(jnp.where(ne, ks_i, jnp.int32(-1)))
    meta = jnp.asarray(
        [n_slabs, Np, Sv, Su, 0, Sv_pad, Su_pad, bp_p, CV, CU, 0, 0],
        jnp.int32,
    ).at[4].set(jnp.where(sgn > 0, 1, -1).astype(jnp.int32))
    meta = meta.at[10].set(k_occ_lo).at[11].set(k_occ_hi)
    fpar = jnp.stack([
        o_u.astype(f), o_v.astype(f), o_p.astype(f), jnp.float32(ds),
        tf.intensity_min, tf.intensity_range_inv, tf.voxel_alpha_factor,
        jnp.float32(1.0 / (factor_v * bp_v)),
        jnp.float32(1.0 / (factor_u * bp_u)),
        tf.gradient_min, tf.gradient_range_inv,
        jnp.float32(Su * bp_p / (Np * bp_u)),     # drift_u (cells/plane)
        jnp.float32(Sv * bp_p / (Np * bp_v)),     # drift_v
    ])

    grid = (H // TILE_H, W // TILE_W)
    tile_map = lambda ty, tx, *_: (ty, tx)

    kern = functools.partial(_kernel, R=R, ert=ert,
                             count_samples=count_samples or
                             test == Test.NUM_TEXTURE_SAMPLES,
                             use_gradient=use_gradient,
                             separable=separable)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_H, TILE_W), tile_map),   # wu
            pl.BlockSpec((TILE_H, TILE_W), tile_map),   # wv
            pl.BlockSpec((TILE_H, TILE_W), tile_map),   # s_lo
            pl.BlockSpec((TILE_H, TILE_W), tile_map),   # s_hi
            pl.BlockSpec((TILE_H, TILE_W), tile_map),   # kappa
            pl.BlockSpec((TILE_H, TILE_W), tile_map),   # cov
            pl.BlockSpec(memory_space=pltpu.VMEM),      # coarse occupancy
            pl.BlockSpec(memory_space=pl.ANY),          # volume
            pl.BlockSpec(memory_space=pl.ANY),          # gradient (or dummy)
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), tile_map),
            pl.BlockSpec((TILE_H, TILE_W), tile_map),
            pl.BlockSpec((TILE_H, TILE_W), tile_map),
            pl.BlockSpec((TILE_H, TILE_W), tile_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, 2, R, RECT_W), jnp.uint8),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((4, 2, R, RECT_W) if use_gradient else (1, 1, 8, 128),
                       jnp.uint8),
            pltpu.SemaphoreType.DMA((4,)),
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
        vol_t,
        grad_t,
    )

    color = jnp.stack([lum, lum, lum, alpha], -1)

    # Depth from first contributing slab.
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
    depth = jnp.where(hit, pen_depth, rays.depth_init)

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


class PallasUnsupported(Exception):
    """Raised when the view/volume violates the kernel's constraints; the
    caller falls back to the XLA sweep."""


def supports(rays: RaySetup, uniforms: FrameUniforms, vol_t_shape,
             height: int, width: int, p_axis: int, R: int = 16) -> bool:
    """Host-side feasibility check (see module docstring constraints):
    every 8×128 pixel tile's source footprint must fit a (R-1)×254 texel
    window for every slab in [0, 1]."""
    Np, Sv, Su = vol_t_shape
    if height % TILE_H or width % TILE_W:
        return False
    if Np < 2 or Sv < 2 or Su < 2:
        return False

    v_ax, u_ax = _SLICE_AXES[p_axis]
    d = np.asarray(rays.ray_dir)
    valid = np.asarray(rays.valid)
    if not valid.any():
        return True
    d_p = d[..., p_axis]
    ok = np.abs(d_p) > 1e-6
    safe = np.where(ok, d_p, 1.0)
    wu = np.where(valid & ok, d[..., u_ax] / safe, np.nan)
    wv = np.where(valid & ok, d[..., v_ax] / safe, np.nan)
    o_p = float(np.asarray(uniforms.cam_pos_tex)[p_axis])
    t_max = max(abs(0.0 - o_p), abs(1.0 - o_p))

    def tile_span(w, th, tw):
        a = w.reshape(height // th, th, width // tw, tw)
        a = np.transpose(a, (0, 2, 1, 3)).reshape(-1, th * tw)
        with np.errstate(invalid="ignore"):
            span = np.nanmax(a, axis=1) - np.nanmin(a, axis=1)
        return np.nanmax(np.where(np.isnan(span), 0.0, span))

    # The 128-aligned rect base can waste up to 127 leading texels, the
    # 8-aligned base up to 7 rows; the tent filter needs one extra row.
    span_u = tile_span(wu, TILE_H, TILE_W) * t_max * Su
    span_v = tile_span(wv, TILE_H, TILE_W) * t_max * Sv
    return bool(span_u <= RECT_W - 132 and span_v <= R - 10)


def sweep_pallas(
    vol_t,
    occupancy_t,
    tf: TFParams,
    rays: RaySetup,
    uniforms: FrameUniforms,
    proj_view_model,
    grad_t=None,
    *,
    p_axis: int,
    ert: bool = True,
    test: Test = Test.NONE,
    count_samples: bool = False,
    oversample: float = 1.0,
    R: int = 16,
    interpret: bool = False,
    dist_leap: bool = False,
) -> RenderOutput:
    """Public entry. ``vol_t``/``occupancy_t`` must already be transposed for
    ``p_axis`` (see sweep.transpose_for_axis). Entry/Exit test modes are
    handled by the caller (identical to the XLA sweep). ``dist_leap``
    declares ``occupancy_t`` to be a Chebyshev distance map (0 = occupied),
    enabling multi-plane leaps in the slab skip loop; with a plain occupancy
    map it must stay False."""
    H, W = rays.valid.shape
    Np = vol_t.shape[0]
    # Pick the smallest rect height that fits this view (bigger R costs a
    # proportionally longer row loop).
    for cand in (R, 24, 32, 48):
        if cand >= R and supports(rays, uniforms, vol_t.shape, H, W, p_axis,
                                  cand):
            R = cand
            break
    else:
        raise PallasUnsupported(
            f"vol_t shape {vol_t.shape} image {H}x{W} violates kernel limits"
        )
    n_slabs = int(max(2, round(Np * oversample)))
    if occupancy_t is None:
        # No skipping: a full-volume bbox per slab.
        occupancy_t = jnp.zeros((1, 1, 1), jnp.uint8)  # "occupied everywhere"
    return _sweep_pallas_jit(
        vol_t, occupancy_t, tf, rays, uniforms, proj_view_model, grad_t,
        p_axis=p_axis, R=R, ert=ert, test=test, count_samples=count_samples,
        n_slabs=n_slabs, interpret=interpret, dist_leap=dist_leap,
    )


def principal_axis_from_uniforms(uniforms: FrameUniforms) -> int:
    """Dominant view-direction axis from the central ray (host numpy; avoids
    a device round-trip before the main frame jit)."""
    vpi = np.asarray(uniforms.view_proj_inv, np.float64)
    g2t = np.asarray(uniforms.global_to_tex, np.float64)
    o = np.asarray(uniforms.cam_pos_tex, np.float64)
    clip = np.array([0.0, 0.0, 0.0, 1.0])
    world = vpi @ clip
    world = world[:3] / world[3]
    pt = (g2t @ np.append(world, 1.0))[:3]
    d = pt - o
    return int(np.argmax(np.abs(d)))


@functools.partial(jax.jit, static_argnames=("p_axis", "height", "width"))
def _rays_and_stats_jit(uniforms: FrameUniforms, height: int, width: int,
                        p_axis: int):
    """Fused per-frame prep: pixel rays + the plan statistics (one dispatch)."""
    from .ray_setup import make_rays

    rays = make_rays(uniforms, height, width)
    return rays, _plan_stats_jit(rays, p_axis)


@functools.partial(jax.jit, static_argnames=("p_axis",))
def _plan_stats_jit(rays: RaySetup, p_axis: int):
    """Tiny on-device reductions feeding the host-side frame plan (bounds,
    median footprints, per-tile spans, direction sign) — ~a dozen scalars."""
    f = jnp.float32
    v_ax, u_ax = _SLICE_AXES[p_axis]
    d = rays.ray_dir
    d_p = d[..., p_axis]
    ok = jnp.abs(d_p) > 1e-6
    sel = rays.valid & ok
    safe = jnp.where(ok, d_p, 1.0)
    nan = jnp.float32(jnp.nan)
    wu = jnp.where(sel, d[..., u_ax] / safe, nan)
    wv = jnp.where(sel, d[..., v_ax] / safe, nan)
    H, W = d_p.shape

    def tile_span_max(a):
        t = a.reshape(H // TILE_H, TILE_H, W // TILE_W, TILE_W)
        t = jnp.transpose(t, (0, 2, 1, 3)).reshape(-1, TILE_H * TILE_W)
        sp = jnp.nanmax(t, axis=1) - jnp.nanmin(t, axis=1)
        return jnp.nanmax(jnp.where(jnp.isnan(sp), 0.0, sp))

    # Direction-agnostic pixel footprint (wu can vary along either image
    # axis depending on the camera roll) — matches plan.analyze_view.
    du = jnp.fmax(jnp.abs(jnp.diff(wu, axis=1))[:-1, :],
                  jnp.abs(jnp.diff(wu, axis=0))[:, :-1])
    dv = jnp.fmax(jnp.abs(jnp.diff(wv, axis=1))[:-1, :],
                  jnp.abs(jnp.diff(wv, axis=0))[:, :-1])
    # One stacked vector → a single device-to-host transfer per frame.
    # Medians on a strided subsample: a full-resolution median is a full
    # device sort (hundreds of ms at 2M elements); ~32K keeps the same
    # robust estimate at negligible cost.
    du_s = du[::8, ::8]
    dv_s = dv[::8, ::8]
    dp_s = d_p[::8, ::8]
    sel_s = sel[::8, ::8]
    return jnp.stack([
        jnp.any(sel).astype(jnp.float32),
        jnp.nanmin(wu), jnp.nanmax(wu),
        jnp.nanmin(wv), jnp.nanmax(wv),
        jnp.nanmedian(jnp.where(du_s > 0, du_s, nan)),
        jnp.nanmedian(jnp.where(dv_s > 0, dv_s, nan)),
        tile_span_max(wu),
        tile_span_max(wv),
        jnp.nanmedian(jnp.where(sel_s, dp_s, nan)),
    ])


_STAT_KEYS = ("any_sel", "wu_lo", "wu_hi", "wv_lo", "wv_hi", "du_q", "dv_q",
              "span_wu", "span_wv", "sgn")


def stats_to_dict(stats_vec) -> dict:
    vals = np.asarray(stats_vec, np.float64)
    return dict(zip(_STAT_KEYS, vals.tolist()))


def select_view_plan(uniforms: FrameUniforms, height: int, width: int,
                     shape_for, max_oversample: float = 2.5, axes=None):
    """Cost-based principal-axis selection: plan every single-signed
    candidate axis (``analyze_view``'s ``unmixed_axes``) and keep the
    cheapest. ``axes`` (optional collection) restricts the candidates —
    callers whose volume is PRE-transposed for one axis (the TP sharded
    sweep) must pass ``axes=(p_axis,)`` or a cheaper off-axis win would be
    silently applied to the wrong transposition. Near the axis handover (the orbit's diagonal band) the
    largest-|mean| axis explodes (wu = d_u/d_p → ±∞ as d_p → 0 inside the
    frustum: grids to ~35M cells, XLA-warp tiers) while the runner-up axis
    plans a tame bricked grid — measured 5-30× cheaper.

    ``shape_for(p)`` returns the p-transposed volume shape. Returns
    (view, plan) — view is the analysis for the WINNING axis (callers use
    its p_axis/sgn), plan may be None (no axis feasible). (None, None)
    when no ray hits; (view, None) with view["mixed"] when no axis is
    single-signed (caller falls back to the per-ray marcher)."""
    from . import plan as plan_mod

    view0 = plan_mod.analyze_view(uniforms, height, width)
    if view0 is None or view0.get("mixed"):
        return view0, None

    # Grid cells × kernel factor (see _plan_cost): the brick kernel pays
    # per-tile control work ∝ 1/tile_h (an 8-row-tile plan measured ~1.25×
    # a 16-row plan on the same grid); the per-slab kernel ~4-5× the brick
    # kernel per cell; XLA-gather-warp penalty ~100 ms ≈ the brick sweep
    # of a 16M-cell grid.
    cost = _plan_cost

    def plan_axis(view, ax):
        # Uniform grid first: away from the axis handover it yields taller
        # brick tiles (the Möbius fit's clamped TAIL footprint can force
        # 8-row tiles — measured +25 % sweep on the headline pose). The
        # projective grid is the RESCUE for poses whose uniform grid
        # explodes (handover band: range/median-footprint up to ~31k
        # columns) — engage it only when the uniform plan is infeasible or
        # expensive, and keep the cheaper of the two.
        pl_u = plan_from_stats(view, uniforms, ax, shape_for(ax), height,
                               width, max_oversample, mobius=False)
        if pl_u is not None and cost(pl_u) < 24e6 and not pl_u.get("warp_xla"):
            return pl_u
        pl_m = plan_from_stats(view, uniforms, ax, shape_for(ax), height,
                               width, max_oversample, mobius=True)
        if pl_u is None:
            return pl_m
        if pl_m is None:
            return pl_u
        return pl_m if cost(pl_m) < cost(pl_u) else pl_u

    def proxy(view, ax):
        # Grid-cell estimate (incl. kernel-cap-forced refinement) from the
        # view stats alone — orders candidates WITHOUT planning them (a
        # full plan costs ~20-35 ms host-side; near the handover the
        # largest-|mean| axis is routinely 4-5x the runner-up, so planning
        # in |mean| order wastes the expensive plan).
        est = plan_from_stats(view, uniforms, ax, shape_for(ax), height,
                              width, max_oversample, size_only=True)
        return float("inf") if est is None else est

    cands = []
    for ax, sgn_ax in view0.get("unmixed_axes") or [(view0["p_axis"],
                                                     view0["sgn"])]:
        if axes is not None and ax not in axes:
            continue
        view = (view0 if ax == view0["p_axis"]
                else plan_mod.analyze_view(uniforms, height, width,
                                           restrict=(ax, sgn_ax)))
        if view is None or view.get("mixed"):
            continue
        cands.append((proxy(view, ax), ax, view))
    cands.sort(key=lambda t: t[0])

    best = None
    for _, ax, view in cands:
        pl = plan_axis(view, ax)
        if pl is None:
            continue
        if best is None or cost(pl) < cost(best[1]):
            best = (view, pl)
        # A bricked Pallas-warp plan in this cost class is already near
        # the frame-cost floor — skip the runner-up axes (candidates are
        # smallest-proxy-first, so the first feasible plan is almost
        # always the winner).
        if cost(best[1]) < 24e6 and not best[1].get("warp_xla"):
            break
    if best is None:
        return view0, None
    return best


def select_view_plan_forced(uniforms: FrameUniforms, height: int, width: int,
                            shape_for, forces: dict):
    """Axis + plan selection against pre-frozen envelope tiers ONLY
    (bench/harness.freeze_orbit_statics): skips the unforced grid search,
    so a fresh orbit pose pays analyze + a few forced feasibility
    re-checks (~10-15 ms host) instead of the full search (~25-60 ms) —
    the free-camera orbit rate is host-plan-bound, and the unforced plan
    it would compute is only ever a fallback for poses outside the frozen
    span (docs/orbit_r4*.json; reference free-camera mode
    /root/reference/src/volume_render.cpp:177-183 has no host planning at
    all, so this serial cost is pure overhead vs the baseline).

    Candidate axes are ordered by the size_only proxy exactly like
    ``select_view_plan``; within an axis, tiers are tried in their frozen
    order (smallest grid first) and the first tier giving this pose a
    Pallas warp wins. An XLA-gather-warp tier is kept only as the global
    last resort, mirroring the engine's preference. Deterministic in the
    pose, so the bench warm-up compiles every specialisation the timed
    loop will request.

    Returns (view, plan). plan is None when no forced tier accepts any
    candidate axis — the caller falls back to the unforced search (view
    is then the unrestricted analysis; it may be None or mixed)."""
    from . import plan as plan_mod

    view0 = plan_mod.analyze_view(uniforms, height, width)
    if view0 is None or view0.get("mixed"):
        return view0, None
    cands = []
    for ax, sgn_ax in view0.get("unmixed_axes") or [(view0["p_axis"],
                                                     view0["sgn"])]:
        view = (view0 if ax == view0["p_axis"]
                else plan_mod.analyze_view(uniforms, height, width,
                                           restrict=(ax, sgn_ax)))
        if view is None or view.get("mixed"):
            continue
        tiers = forces.get((ax, 1.0 if view["sgn"] >= 0 else -1.0))
        if not tiers:
            continue
        if isinstance(tiers, dict):
            tiers = [tiers]
        est = plan_from_stats(view, uniforms, ax, shape_for(ax), height,
                              width, size_only=True)
        if est is not None:
            cands.append((est, ax, view, tiers))
    cands.sort(key=lambda t: t[0])
    best = best_xla = None
    for _, ax, view, tiers in cands:
        for force in tiers:
            cand = plan_from_stats(view, uniforms, ax, shape_for(ax),
                                   height, width, force=force)
            if cand is None:
                continue
            if not cand.get("warp_xla"):
                # First feasible tier per axis (tiers are smallest-first);
                # across axes keep the kernel-cost winner like the
                # unforced selector (the proxy can misorder axes whose
                # frozen envelopes differ more than their intrinsic need).
                if best is None or _plan_cost(cand) < _plan_cost(best[1]):
                    best = (view, cand)
                break
            if best_xla is None:
                best_xla = (view, cand)
    if best is not None:
        return best
    if best_xla is not None:
        return best_xla
    return view0, None


def plan_frame(uniforms: FrameUniforms, rays: RaySetup, p_axis: int,
               vol_shape_t, height: int, width: int,
               max_oversample: float = 2.5, max_rect: int | None = None):
    """Host-side frame plan (see plan_from_stats). Prefers the analytic view
    statistics (render/plan.py — no device reductions, enables the two-pass
    warp); falls back to on-device reductions over ``rays`` when the
    analytic analysis is unavailable or disagrees on the principal axis."""
    from . import plan as plan_mod

    view = plan_mod.analyze_view(uniforms, height, width)
    if view is not None and view["mixed"]:
        # Rays disagree on the principal-axis direction sign (camera inside
        # the volume, wide FOV): one global slab order cannot composite
        # every ray front-to-back. The device-stats fallback cannot detect
        # this, so refuse the plan here — callers fall back to the per-ray
        # marcher (the engine) or raise PallasUnsupported (render_frame).
        return None
    if view is not None and view["p_axis"] == p_axis:
        return plan_from_stats(view, uniforms, p_axis, vol_shape_t, height,
                               width, max_oversample, max_rect=max_rect)
    st = stats_to_dict(_plan_stats_jit(rays, p_axis))
    return plan_from_stats(st, uniforms, p_axis, vol_shape_t, height, width,
                           max_oversample, max_rect=max_rect)


def _mobius_grid_params(rng: float, f_lo: float, f_hi: float, N: float):
    """Per-axis Möbius grid parameters: N cells over w-range ``rng`` with
    end footprints (f_lo, f_hi) scaled uniformly to fit exactly —
    s = rng/(N·√(f_lo·f_hi)), w(ξ) = w_lo + s·f_lo·ξ/(1 − c·ξ).

    For a projective view the pixel footprint as a function of w is
    quadratic with a double root at the homography horizon — exactly the
    footprint family of a Möbius grid — so matching the two end footprints
    reproduces the pixel sampling density EVERYWHERE: near-diagonal orbit
    poses whose uniform grid exploded (range/median-footprint up to ~31k
    columns when the homography denominator varies strongly over the
    image) get a grid ~the image size instead. f_lo = f_hi (or the
    device-stats path, which lacks end footprints) degenerates to the
    uniform grid (c = 0).

    Returns (dw, c, dw_max): the ξ=0 footprint, the Möbius coefficient,
    and the max footprint over the grid (the kernel-limit quantity; the
    footprint dw/dξ = dw/(1−c·ξ)² is monotone in ξ, extremal at the
    ends). c·N = 1 − f_lo/√(f_lo·f_hi) < 1 independently of scale, so the
    in-kernel denominator 1 − c·ξ stays positive over the whole grid."""
    gm = math.sqrt(f_lo * f_hi)
    s = rng / (N * gm)
    return s * f_lo, s * (gm - f_lo) / rng, s * max(f_lo, f_hi)


def plan_from_stats(st, uniforms: FrameUniforms, p_axis: int, vol_shape_t,
                    height: int, width: int, max_oversample: float = 2.5,
                    force: dict | None = None, mobius: bool | None = None,
                    size_only: bool = False, max_rect: int | None = None,
                    no_brick: bool = False):
    """Grid sizing + static kernel parameters from the view statistics.

    Searches over a grid-coarsening factor: diagonal views (|wu| → large)
    inflate the per-tile warp windows, and a modestly coarser w-grid shrinks
    them linearly (the sweep's own footprint lower bounds on the grid are
    enforced at every factor). Quality degrades gracefully — up to ~2×
    undersampling of the median pixel footprint — which beats the order-of-
    magnitude cost of the non-Pallas fallback. Returns None when no factor
    satisfies the kernel limits.

    ``force`` pins every jit-static field (Hi/Wi/tile_h/R_brick/span_blks/
    R_sweep/RECT_A/RECT_B/warp_variant) to a pre-computed envelope — ONE
    kernel specialisation covers a whole camera orbit (bench/harness.py:
    freeze_orbit_statics). Only the pose-dependent floats are recomputed;
    feasibility of the forced statics is re-verified per pose (None on
    violation — the caller falls back)."""
    Np, Sv, Su = vol_shape_t
    if not st["any_sel"]:
        return None
    wu_lo, wu_hi = st["wu_lo"], st["wu_hi"]
    wv_lo, wv_hi = st["wv_lo"], st["wv_hi"]
    mu = max(1e-6, (wu_hi - wu_lo) * 0.02)
    mv = max(1e-6, (wv_hi - wv_lo) * 0.02)
    wu_lo -= mu; wu_hi += mu; wv_lo -= mv; wv_hi += mv

    o_p = float(np.asarray(uniforms.cam_pos_tex)[p_axis])
    t_max = max(abs(0.0 - o_p), abs(1.0 - o_p))

    # Quality sizing (median pixel footprint) and the sweep kernel's own
    # LOWER bounds on grid resolution (per-tile source footprint limits).
    # The u bound reserves the brick kernel's per-brick footprint drift
    # (8 slabs ≈ 8 voxel planes; render/sweep_bricks.py) so the brick rect
    # stays feasible — a slightly wider grid, repaid ~8× by the brick loop.
    Np_s = vol_shape_t[0]
    wmax_u = max(abs(wu_lo), abs(wu_hi))
    wmax_v = max(abs(wv_lo), abs(wv_hi))
    drift_bu = wmax_u * (8.0 / max(Np_s, 1)) * Su
    drift_bv = wmax_v * (8.0 / max(Np_s, 1)) * Sv
    brick_env = (not no_brick
                 and os.environ.get("VKV_NO_BRICK", "0") != "1")

    def u_caps(rect_w_c):
        """(brick_wanted, cap_fp_u) under brick-rect width ``rect_w_c``.

        The brick kernel's per-tile u window (128 pixel lanes × the max
        per-cell footprint, plus the 8-slab brick drift and DMA alignment
        margins) must fit the rect; a WIDER static rect (rect_w = 512)
        relaxes the cap ~3× for views whose uniform grid was cap-inflated
        far past the pixel-matched quality size (the headline pose sweeps
        1.9× the quality columns at rect 256). Costs: 2× rect DMA bytes
        and a 4-half gather chain — the plan charges ~1.35×/cell and
        keeps the cheaper rect."""
        bw = brick_env and drift_bu <= (60.0 if rect_w_c == 256 else 240.0)
        denom = (min(rect_w_c - 136.0, rect_w_c - 132.0 - drift_bu)
                 if bw else 120.0)
        return bw, denom / (Su * t_max * TILE_W)

    brick_wanted, cap_fp_u = u_caps(256)
    # End-band footprints (analytic path only) drive the projective grid
    # fit (_mobius_grid_params); missing → uniform grid (f_lo = f_hi).
    q_u = max(st["du_q"], 1e-9)
    q_v = max(st["dv_q"], 1e-9)
    if mobius is None:
        mobius = os.environ.get("VKV_MOBIUS", "1") != "0"
    f_lo_u = (st.get("du_lo_q") or q_u) if mobius else q_u
    f_hi_u = (st.get("du_hi_q") or q_u) if mobius else q_u
    f_lo_v = (st.get("dv_lo_q") or q_v) if mobius else q_v
    f_hi_v = (st.get("dv_hi_q") or q_v) if mobius else q_v
    rng_u = wu_hi - wu_lo
    rng_v = wv_hi - wv_lo
    # Kernel footprint caps: the per-tile source limits bind on the grid's
    # MAX per-cell w-footprint (the Möbius footprint is monotone along the
    # grid, extremal at the range ends), so a grid whose END footprints
    # respect the caps is kernel-feasible everywhere. Clamping the fitted
    # end footprints at the caps (instead of scaling the whole grid finer)
    # keeps the dense end pixel-matched while the projective tail runs at
    # the kernel limit — the handover-band poses whose uniform grids
    # exploded to ~30k columns get image-scale grids.
    cap_fp_v = 38.0 / (8.0 * Sv * t_max)
    # Quality size (s = 1: the grid matches the local pixel footprint
    # everywhere; its cell count is range/geomean of the end footprints).
    Wi_q = rng_u / math.sqrt(f_lo_u * f_hi_u)
    Hi_q = rng_v / math.sqrt(f_lo_v * f_hi_v)
    if not all(np.isfinite(v) and v > 0
               for v in (Wi_q, Hi_q, cap_fp_u, cap_fp_v)):
        return None
    if size_only:
        # Cheap grid-cell estimate for candidate-axis ordering
        # (select_view_plan): the kernel footprint caps can force a grid
        # far FINER than the pixel-matched quality size — near the axis
        # handover that refinement, not quality, is what explodes the cost.
        return (max(Wi_q, rng_u / cap_fp_u)
                * max(Hi_q, rng_v / cap_fp_v))

    def _capped_ends(rng, f_lo, f_hi, fs, cap):
        """End footprints scaled by coarsening ``fs`` and clamped at the
        kernel cap; None when even the uniform-at-cap grid (both ends =
        cap) cannot exist (rng non-finite)."""
        fl = min(f_lo * fs, cap)
        fh = min(f_hi * fs, cap)
        n = rng / math.sqrt(fl * fh)
        return (fl, fh, n) if np.isfinite(n) else None

    def _fit_forced(rng, f_lo, f_hi, N, cap):
        """Möbius params for a FORCED cell count N: the pixel-matched
        curve shape rescaled to N cells, ends re-clamped at the kernel
        cap (trading tail match for feasibility — the clamped curve still
        covers the range in N cells with the other end denser). None when
        even both-ends-at-cap cannot cover the range in N cells."""
        s = rng / (N * math.sqrt(f_lo * f_hi))
        fl, fh = s * f_lo, s * f_hi
        if max(fl, fh) > cap:
            lo_end = (rng / N) ** 2 / cap
            if lo_end > cap * (1.0 + 1e-9):
                return None
            fl, fh = (lo_end, cap) if fh >= fl else (cap, lo_end)
        return _mobius_grid_params(rng, fl, fh, N)

    from . import plan as plan_mod
    from . import warp_pallas as _wp

    sgn_p = 1.0 if st["sgn"] >= 0 else -1.0

    if force is not None:
        Hi, Wi = force["Hi"], force["Wi"]
        # Quality floor: the unforced search tolerates at most ~2.2×
        # undersampling of the local pixel footprint — a pose must reject
        # an envelope tier that would undersample it harder (the banded
        # tiers of freeze_orbit_statics are tried smallest-first).
        if Wi < Wi_q / 2.2 - 1e-6 or Hi < Hi_q / 2.2 - 1e-6:
            return None
        R_sweep = force["R_sweep"]
        tile_h = force["tile_h"]
        R_brick = force["R_brick"]
        span_blks = force["span_blks"]
        rect_w_f = force.get("rect_w", 256)
        brick_wanted, cap_fp_u = u_caps(rect_w_f)
        cap_v_f = (R_sweep - 10.0) / (8.0 * Sv * t_max)
        if R_brick is not None:
            # Clamp the v-curve's tail to the FORCED brick geometry so the
            # brick feasibility below holds whenever the pose can fit it
            # at all (the dense end absorbs the density).
            cap_v_f = min(cap_v_f, max(
                1e-12,
                min(R_brick - 11.0 - drift_bv, 8.0 * span_blks - 10.0)
                / (tile_h * Sv * t_max)))
        mu_fit = _fit_forced(rng_u, f_lo_u, f_hi_u, Wi, cap_fp_u)
        mv_fit = _fit_forced(rng_v, f_lo_v, f_hi_v, Hi,
                             min(cap_fp_v, cap_v_f))
        if mu_fit is None or mv_fit is None:
            return None
        dwu, cu_g, dwu_max = mu_fit
        dwv, cv_g, dwv_max = mv_fit
        if R_brick is not None:
            span = tile_h * dwv_max * Sv * t_max
            sb_need = -(-int(span + 10.0) // 8)
            # 1e-3 slack: _fit_forced clamps the end footprint exactly AT
            # the kernel cap, so this check's left side lands exactly on
            # the designed limit — float association order must not reject
            # the boundary (a pose rejecting its OWN unforced dims
            # escalates 1-2 envelope bands up: 1.8-2.9× kernel cost).
            if (max(8 * span_blks, int(span + drift_bv + 11.0)) > R_brick
                    or sb_need > span_blks
                    or 128.0 * dwu_max * Su * t_max + drift_bu
                    > rect_w_f - 132 + 1e-3):
                return None
        plan = dict(Hi=Hi, Wi=Wi, R_sweep=R_sweep, R_warp=None,
                    wu0=wu_lo, dwu=dwu, wv0=wv_lo, dwv=dwv,
                    cu=cu_g, cv=cv_g, sgn_p=sgn_p,
                    tile_h=tile_h, R_brick=R_brick, span_blks=span_blks,
                    rect_w=rect_w_f,
                    RECT_A=None, RECT_B=None, hcoef=None)
        # Per-tile pixel→grid spans, exact under the (projective) grid map
        # when the analysis lattices are available.
        gus = plan_mod.grid_unit_spans(st, plan)
        if gus is not None:
            span_gx, span_gy, _ = gus
        else:
            span_gx = st.get("span_wu", np.nan) / dwu
            span_gy = st.get("span_wv", np.nan) / dwv
        # Forced single-pass warp rect: re-verify THIS pose's per-tile
        # pixel→grid spans against the frozen rect (an undersized rect
        # would silently drop source rows).
        R_warp_f = force.get("R_warp")
        if R_warp_f is not None:
            if (not np.isfinite(span_gx)
                    or span_gx > _wp.RECT_W - 132
                    or Wi < _wp.RECT_W
                    or span_gy > R_warp_f - 10):
                R_warp_f = None
        plan["R_warp"] = R_warp_f
        if force.get("RECT_A") is not None and "span_wv_t" in st:
            tp = plan_mod.two_pass_warp_plan(
                uniforms, p_axis, height, width, plan, st,
                only_variant=force.get("warp_variant", "A"),
                allow_full_src=True)
            if (tp is not None and tp["RECT_A"] <= force["RECT_A"]
                    and tp["RECT_B"] <= force["RECT_B"]):
                plan.update(tp)
                plan["RECT_A"] = force["RECT_A"]
                plan["RECT_B"] = force["RECT_B"]
                # The two-pass warp renders the frame; drop the unused
                # single-pass static so it doesn't split the jit cache.
                plan["R_warp"] = None
        if plan["RECT_A"] is None and plan["R_warp"] is None:
            plan["warp_xla"] = True
        return plan

    # Grid-size allowance: proportional for big images, with an absolute
    # floor so small images can still host the range-driven grid the sweep
    # footprint limits demand (grid size is range-driven, not image-driven).
    # The final tier (f = inf) is UNCAPPED at the kernel minimum (Wi_k,
    # Hi_k): a zoomed-out view of a large volume (texel < pixel) needs a
    # grid finer than the image, and even a 2× oversampled Pallas sweep
    # beats the order-of-magnitude slower XLA fallback.
    cap_w = max(width * max_oversample, 2304.0)
    cap_h = max(height * max_oversample, 1536.0)

    def _attempt(rect_w_c, brick_wanted, cap_fp_u):
      for f in (1.0, 1.3, 1.7, 2.2, float("inf")):
        fs = 1e12 if f == float("inf") else f
        eu = _capped_ends(rng_u, f_lo_u, f_hi_u, fs, cap_fp_u)
        ev = _capped_ends(rng_v, f_lo_v, f_hi_v, fs, cap_fp_v)
        if eu is None or ev is None:
            return None
        fl_u_t, fh_u_t, Wi = eu
        # v-cap preference: a tail clamped at the per-slab-kernel cap can
        # block the ≥16-row brick tiles (span = tile_h·dwv_max·Sv·t_max
        # must fit the brick rect), falling to 8-row tiles that pay 2-4×
        # the per-brick control work. Try tile-32/16-friendly caps first
        # and keep the tallest whose grid stays within 25 % of the
        # free-cap height.
        fl_v_t, fh_v_t, Hi = ev
        if brick_wanted:
            span_cap = min(47.0, 53.0 - drift_bv)
            for th_pref, grow in ((32, 1.25), (16, 1.25), (8, 1.6)):
                cap_th = span_cap / (th_pref * Sv * t_max)
                if cap_th <= 0:
                    continue
                ev_t = _capped_ends(rng_v, f_lo_v, f_hi_v, fs,
                                    min(cap_fp_v, cap_th))
                if ev_t is not None and ev_t[2] <= grow * ev[2] + 1e-6:
                    fl_v_t, fh_v_t, Hi = ev_t
                    break
        Wi = max(Wi, 128.0)
        Hi = max(Hi, 8.0)
        if f != float("inf") and (Wi > cap_w or Hi > cap_h):
            continue
        # Quantize grid dims coarsely: every distinct (Hi, Wi) is a separate
        # jit specialization, and a moving camera would otherwise recompile
        # every few frames.
        Wi = -(-int(Wi) // 256) * 256
        Hi = -(-int(Hi) // 64) * 64
        dwu, cu_g, dwu_max = _mobius_grid_params(rng_u, fl_u_t, fh_u_t, Wi)
        dwv, cv_g, dwv_max = _mobius_grid_params(rng_v, fl_v_t, fh_v_t, Hi)

        # Sweep kernel rect height (analytic; the grid's max footprint).
        span_v = 8.0 * dwv_max * Sv * t_max
        R_sweep = None
        for cand in (16, 24, 32, 48):
            if span_v <= cand - 10:
                R_sweep = cand
                break
        if R_sweep is None:
            continue

        plan = dict(Hi=Hi, Wi=Wi, R_sweep=R_sweep, R_warp=None,
                    wu0=wu_lo, dwu=dwu, wv0=wv_lo, dwv=dwv,
                    cu=cu_g, cv=cv_g, sgn_p=sgn_p,
                    tile_h=8, R_brick=None, span_blks=2, rect_w=rect_w_c,
                    RECT_A=None, RECT_B=None, hcoef=None)

        # Single-pass warp rect height from per-tile pixel→grid spans
        # (exact under the projective grid map when lattices available).
        # (Wi must hold the fixed 640-lane rect — an undersized source
        # would make the rect DMA read out of bounds: a device fault.)
        gus = plan_mod.grid_unit_spans(st, plan)
        if gus is not None:
            span_gx, span_gy, _ = gus
        else:
            span_gx = st["span_wu"] / dwu
            span_gy = st["span_wv"] / dwv
        R_warp = None
        if span_gx <= _wp.RECT_W - 132 and Wi >= _wp.RECT_W:
            for cand in (16, 24, 32, 48, 64, 96, 128, 192):
                if span_gy <= cand - 10:
                    R_warp = cand
                    break
        plan["R_warp"] = R_warp

        # Brick-kernel feasibility (render/sweep_bricks.py): the rect must
        # additionally cover the footprint drift across one 8-slab brick
        # (assuming ≥1 slab per voxel plane; _frame_body falls back to the
        # per-slab kernel when n_slabs < Np). Prefer 16-row tiles (per-brick
        # control work amortised over 2× the pixels).
        tile_h, R_brick, span_blks = 8, None, 2
        if brick_wanted \
                and 128.0 * dwu_max * Su * t_max + drift_bu \
                <= rect_w_c - 132:
            # Rect heights: 96 rows only up to 384-lane rects — the
            # (NSLOT, PLANES, R, rect) scratch must stay under the
            # degraded compile helper's ~2 MB/array ceiling (CLAUDE.md);
            # 4·9·96·384 = 1.33 MB, 4·9·96·512 would be 1.77 MB and the
            # 64-row cap already admits every 512-rect plan seen.
            # VKV_MAX_BRICK_R: device-smoke safety knob (r3_smoke_kernels).
            max_r = int(os.environ.get("VKV_MAX_BRICK_R", "96"))
            r_cands = tuple(
                c for c in (16, 24, 32, 48, 64, 96)
                if c <= max_r and (c <= 64 or rect_w_c <= 384))
            # VKV_TILE_H: ESS-granularity A/B knob — smaller tiles leap
            # with tighter footprints (fewer over-marched slabs) at more
            # per-brick control work; the default ladder prefers the
            # biggest fitting tile.
            th_env = os.environ.get("VKV_TILE_H")
            for th in ((int(th_env),) if th_env else (32, 16, 8)):
                span = th * dwv_max * Sv * t_max
                sb = -(-int(span + 10.0) // 8)   # per-slab tent window blocks
                need = max(8 * sb, int(span + drift_bv + 11.0))
                fit = [c for c in r_cands if need <= c]
                if fit and Hi % th == 0:
                    tile_h, R_brick, span_blks = th, fit[0], sb
                    break
        plan["tile_h"], plan["R_brick"], plan["span_blks"] = \
            tile_h, R_brick, span_blks

        # Two-pass projective warp (render/plan.py): available when the
        # caller provided the host-analytic view stats (span_wv_t) and the
        # homography passes feasibility; preferred over single-pass.
        if uniforms is not None and "span_wv_t" in st:
            tp = plan_mod.two_pass_warp_plan(uniforms, p_axis, height,
                                             width, plan, st)
            if tp is not None:
                plan.update(tp)
        if plan["RECT_A"] is not None or R_warp is not None:
            return plan
        if f >= 2.0:
            # Last tier: the Pallas sweep is feasible by construction
            # (Hi >= Hi_k, Wi >= Wi_k bound the per-tile footprints), so
            # keep it and warp via XLA gather (~4 taps/pixel) — an order of
            # magnitude cheaper than abandoning the grid pipeline. Happens
            # in the near-45°-azimuth band where the warp homography's
            # horizon enters the image and both Pallas warps degenerate.
            plan["warp_xla"] = True
            return plan
      return None

    plan = _attempt(256, brick_wanted, cap_fp_u)
    # Cap-relief rescue (rect_w = 384/512): when the 256-rect grid is
    # kernel-cap-inflated well past the pixel-matched quality size (the
    # fitted far-end footprint exceeds the cap — e.g. the headline pose
    # sweeps 1.9× the quality columns), a wider static brick rect relaxes
    # the u cap ~2-3×. Keep whichever plan the kernel cost model prefers;
    # the wider rect only applies to the BRICK kernel (the per-slab
    # fallback keeps its 256-lane assumptions — _frame_body refuses the
    # mismatch).
    if max_rect is None:
        max_rect = int(os.environ.get("VKV_MAX_RECT", "512"))
    if brick_env and Su >= 384 and f_hi_u * 1.05 > cap_fp_u:
        for rect_c in (384, 512):
            if Su < rect_c or rect_c > max_rect:
                continue
            bw_c, cap_c = u_caps(rect_c)
            if not bw_c:
                continue
            p_c = _attempt(rect_c, bw_c, cap_c)
            if p_c is not None and p_c.get("R_brick") is not None and (
                    plan is None or _plan_cost(p_c) < _plan_cost(plan)):
                plan = p_c
    return plan


def _plan_cost(pl):
    """Relative frame cost of a plan: grid cells × a kernel factor (the
    brick kernel pays per-tile control work ∝ 1/tile_h; the per-slab
    kernel ~4-5× the brick kernel per cell; the 512-lane brick rect pays
    ~1.35×/cell in DMA + gather-chain width; the XLA-gather warp ~100 ms ≈
    a 16M-cell brick sweep)."""
    if pl.get("R_brick"):
        c = pl["Hi"] * pl["Wi"] * (1.0 + 6.0 / pl["tile_h"])
    else:
        c = 4.0 * pl["Hi"] * pl["Wi"]
    c *= 1.0 + 0.35 * (pl.get("rect_w", 256) / 256.0 - 1.0)
    if pl.get("warp_xla"):
        c += 16e6
    return c


# ---------------------------------------------------------------------------
# Packed per-pose scalars: every per-pose float the frame jit consumes
# (uniform leaves + proj_view_model + grid params + homography coeffs) in
# ONE flat f32 array, so a fresh camera pose costs ONE host→device transfer
# instead of ~14 (each small transfer is a ~0.9 ms dispatch on the tunneled
# transport — the dominant per-pose cost after the host plan).
# ---------------------------------------------------------------------------

_UNIFORM_FIELDS = (
    ("view", 16), ("proj", 16), ("view_proj_inv", 16), ("model", 16),
    ("model_inv", 16), ("global_to_tex", 16), ("plane", 4),
    ("plane_tex", 4), ("cam_pos_tex", 3), ("block_size", 3),
    ("front_index", 1),
)
_N_UNIFORM = sum(n for _, n in _UNIFORM_FIELDS)            # 111
N_PACKED = _N_UNIFORM + 16 + 6 + 9                          # + pvm, gp, hcoef


def pack_frame_scalars(uniforms: FrameUniforms, pvm, gp,
                       hcoef=None) -> np.ndarray:
    """Host-side: flatten (uniforms, proj_view_model, grid_params, hcoef)
    into one (N_PACKED,) float32 array (hcoef None → zeros; the RECT_A
    static gates its use)."""
    parts = [np.asarray(getattr(uniforms, name), np.float32).ravel()
             for name, _ in _UNIFORM_FIELDS]
    parts.append(np.asarray(pvm, np.float32).ravel())
    parts.append(np.asarray(gp, np.float32).ravel())
    parts.append(np.zeros(9, np.float32) if hcoef is None
                 else np.asarray(hcoef, np.float32).ravel())
    out = np.concatenate(parts)
    assert out.shape == (N_PACKED,), out.shape
    return out


def unpack_frame_scalars(arr):
    """Inverse of pack_frame_scalars; works on traced jnp arrays (inside
    jit) and host numpy alike. Returns (uniforms, pvm, gp, hcoef)."""
    vals = {}
    off = 0
    for name, n in _UNIFORM_FIELDS:
        v = arr[off:off + n]
        off += n
        vals[name] = v.reshape(4, 4) if n == 16 else v
    vals["front_index"] = vals["front_index"][0].astype(jnp.int32)
    u = FrameUniforms(**vals)
    pvm = arr[off:off + 16].reshape(4, 4)
    off += 16
    gp = arr[off:off + 6]
    off += 6
    hcoef = arr[off:off + 9]
    return u, pvm, gp, hcoef


def _mob_fwd(w0, dw, c, x):
    """Traced Möbius grid forward map w(ξ) (denominator positive over the
    grid by construction — _mobius_grid_params)."""
    return w0 + dw * x / (1.0 - c * x)


def _mob_inv(w0, dw, c, w):
    """Traced Möbius grid inverse map ξ(w). The denominator's zero is the
    homography horizon — outside the grid's w-range for every in-range w;
    out-of-range w (invalid pixels, masked later) get a sign-preserving
    clamp so the division never produces inf/nan garbage that could
    poison a min/max."""
    den = dw + c * (w - w0)
    den = jnp.where(jnp.abs(den) < 1e-20,
                    jnp.where(den < 0, -1e-20, 1e-20), den)
    return (w - w0) / den


def _frame_body(
    vol_t, occupancy_t, tf: TFParams, rays: RaySetup,
    uniforms: FrameUniforms, proj_view_model, grid_params, grad_t=None,
    hcoef=None,
    *, p_axis, Hi, Wi, R_sweep, R_warp, ert, test, n_slabs, sgn_p,
    interpret=False, dist_leap=False, RECT_A=None, RECT_B=None,
    n_shards=1, axis_name=None, return_chans=False,
    tile_h=8, R_brick=None, span_blks=2, texture_tf=False,
    height=None, width=None, warp_variant="A", rect_w=256,
    tent_prec=None,
):
    """One fused frame: w-grid field construction → Pallas sweep → channel
    stack → Pallas warp → pixel-space outputs. Everything per-frame lives
    inside one jit; only the tiny plan runs on the host.

    Multi-chip (``axis_name`` set, called under shard_map — see
    parallel/mesh.py:render_frame_sharded): each device sweeps its Hi/n
    contiguous w-grid rows (volume replicated), one tiled ``all_gather``
    rebuilds the full grid, and the warp runs on the device's local pixel
    rows — the only collective in the frame.

    ``rays`` may be None with ``height``/``width`` statics set: the pixel
    ray setup is then built INSIDE the jit (a fresh camera pose costs only
    the host plan — no separate ray-setup dispatch, the orbit/free-camera
    steady state)."""
    from .frustum import rays_from_dirs

    f = jnp.float32
    if not isinstance(uniforms, FrameUniforms):
        # Packed per-pose scalars (see pack_frame_scalars): the caller
        # passed one flat array; proj_view_model/grid_params/hcoef args are
        # None placeholders.
        uniforms, proj_view_model, grid_params, hcoef = \
            unpack_frame_scalars(uniforms)
    if rays is None:
        from .ray_setup import make_rays

        rays = make_rays(uniforms, height, width)
    H, W = rays.valid.shape
    v_ax, u_ax = _SLICE_AXES[p_axis]
    wu0, dwu, cu_g, wv0, dwv, cv_g = (
        grid_params[0], grid_params[1], grid_params[2],
        grid_params[3], grid_params[4], grid_params[5])

    Hi_loc = Hi // n_shards
    gyi = jax.lax.broadcasted_iota(f, (Hi_loc, Wi), 0)
    if axis_name is not None:
        gyi = gyi + jax.lax.axis_index(axis_name).astype(f) * f(Hi_loc)
    gxi = jax.lax.broadcasted_iota(f, (Hi_loc, Wi), 1)
    # Möbius (projective) grid: w(ξ) = w0 + dw·ξ/(1 − c·ξ); c = 0 is the
    # uniform grid (see _mobius_grid_params; 1 − c·ξ > 0 over the grid).
    wu_g = _mob_fwd(wu0, dwu, cu_g, gxi + 0.5)
    wv_g = _mob_fwd(wv0, dwv, cv_g, gyi + 0.5)

    # Brick kernel (sweep_bricks.py) whenever the plan proved its rect
    # feasible and every voxel plane gets ≥1 slab (the plan's drift margins
    # assume it); otherwise the round-2 per-slab kernel.
    if R_brick is not None and n_slabs >= vol_t.shape[0] \
            and Hi_loc % tile_h == 0:
        from . import sweep_bricks

        s_lo_g, s_hi_g, cov_g, kappa_g = sweep_bricks.grid_fields(
            uniforms, wu_g, wv_g, 1 if sgn_p > 0 else -1, p_axis,
            max(vol_t.shape), n_slabs)
        grid_out = sweep_bricks._sweep_bricks_jit(
            vol_t, occupancy_t, tf, None, uniforms, proj_view_model,
            grad_t, (wu_g, wv_g, s_lo_g, s_hi_g, kappa_g, cov_g),
            p_axis=p_axis, R=R_brick, ert=ert, test=test,
            count_samples=test == Test.NUM_TEXTURE_SAMPLES,
            n_slabs=n_slabs, sgn=1 if sgn_p > 0 else -1, tile_h=tile_h,
            span_blks=span_blks, rect_w=rect_w, tent_prec=tent_prec,
            interpret=interpret, dist_leap=dist_leap, texture_tf=texture_tf,
        )
    else:
        if rect_w > 256:
            # The grid was cap-sized for a wide brick rect; the per-slab
            # kernel's 256-lane windows cannot cover it — refuse rather
            # than sample the wrong texels (engine falls back cleanly).
            raise PallasUnsupported(
                "wide-rect plan requires the brick kernel")
        dir_xyz = [None, None, None]
        dir_xyz[p_axis] = jnp.full((Hi_loc, Wi), f(sgn_p))
        dir_xyz[u_ax] = wu_g * f(sgn_p)
        dir_xyz[v_ax] = wv_g * f(sgn_p)
        dirs = jnp.stack(dir_xyz, -1)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        rays_g = rays_from_dirs(uniforms, dirs)
        if texture_tf:
            # Only the brick kernel implements the texture-TF variant; the
            # engine routes texture-TF frames here only when the plan
            # proved the brick kernel feasible.
            raise PallasUnsupported("texture TF requires the brick kernel")
        grid_out = _sweep_pallas_jit(
            vol_t, occupancy_t, tf, rays_g, uniforms, proj_view_model,
            grad_t,
            p_axis=p_axis, R=R_sweep, ert=ert, test=test,
            count_samples=test == Test.NUM_TEXTURE_SAMPLES,
            n_slabs=n_slabs, interpret=interpret,
            separable=True, dist_leap=dist_leap,
        )

    num_test = test == Test.NUM_TEXTURE_SAMPLES
    if num_test:
        chans = jnp.stack([
            grid_out.color[..., 0], grid_out.color[..., 3], grid_out.depth,
            grid_out.num_volume_samples.astype(f),
        ])
    else:
        chans = jnp.stack([
            grid_out.color[..., 0], grid_out.color[..., 3], grid_out.depth,
        ])
    if axis_name is not None:
        # Rebuild the full w-grid from the per-device row strips (the
        # frame's only collective; a few MB over ICI).
        chans = jax.lax.all_gather(chans, axis_name, axis=1, tiled=True)
    if return_chans:
        return chans, grid_out.iterations   # grid-stage timing entry
    Np, Sv, Su = vol_t.shape
    return _pixel_stage(
        chans, rays, grid_params, hcoef, tf, grid_out.iterations,
        p_axis=p_axis, Hi=Hi, R_warp=R_warp, test=test, RECT_A=RECT_A,
        RECT_B=RECT_B, interpret=interpret, dim_max=max(Np, Sv, Su),
        H_total=H * n_shards, warp_variant=warp_variant,
    )


def _pixel_stage(
    chans, rays: RaySetup, grid_params, hcoef, tf: TFParams, iterations,
    *, p_axis, Hi, R_warp, test, RECT_A, RECT_B, interpret, dim_max,
    H_total=None, warp_variant="A", warp_pipe=None,
):
    """Warp + pixel-space outputs (the frame's second half — split out so
    the benchmark can time the grid and pixel stages separately).
    ``H_total``: full image height (differs from the local row count under
    shard_map — the homography's validity window is global)."""
    f = jnp.float32
    H, W = rays.valid.shape
    H_img = H if H_total is None else H_total
    v_ax, u_ax = _SLICE_AXES[p_axis]
    wu0, dwu, cu_g, wv0, dwv, cv_g = (
        grid_params[0], grid_params[1], grid_params[2],
        grid_params[3], grid_params[4], grid_params[5])
    num_test = test == Test.NUM_TEXTURE_SAMPLES

    d = rays.ray_dir
    d_p = d[..., p_axis]
    okp = jnp.abs(d_p) > 1e-6
    safe = jnp.where(okp, d_p, 1.0)
    wu_pix = d[..., u_ax] / safe
    wv_pix = d[..., v_ax] / safe
    gx = _mob_inv(wu0, dwu, cu_g, wu_pix) - 0.5
    gy = _mob_inv(wv0, dwv, cv_g, wv_pix) - 0.5
    pix_ok = rays.valid & okp
    gx = jnp.where(pix_ok, gx, -10.0)
    gy = jnp.where(pix_ok, gy, -10.0)

    if RECT_A is not None and hcoef is not None:
        # Two-pass projective warp (see warp_pallas.warp_two_pass /
        # warp_two_pass_b): the pixel→grid map is an exact homography, so
        # the resample factors into two row-aligned 1-D rational passes;
        # the plan picked the better-conditioned factorisation order.
        from . import warp_pallas

        au, bu, cu_ = hcoef[0], hcoef[1], hcoef[2]
        av, bv, cv_ = hcoef[3], hcoef[4], hcoef[5]
        ap, bp_, cp_ = hcoef[6], hcoef[7], hcoef[8]
        # u16-encoded warp: lum/alpha/depth live in [0, 1] (depth is
        # reverse-Z clip depth; no-hit pixels are overwritten below), the
        # sample-count channel is an integer ≤ ~13k — all exactly
        # representable / sub-LSB in 16 bits for an 8-bit output.
        scales = [65535.0, 65535.0, 65535.0] + ([1.0] if num_test else [])
        scales = scales[:chans.shape[0]]
        Hp = -(-H // 128) * 128
        Wi_g = chans.shape[2]
        if warp_variant == "B":
            # Column-first order: pass 1 resamples each grid COLUMN at the
            # grid rows YB(xg, i); pass 2 resamples rows at gx.
            xgi = jax.lax.broadcasted_iota(jnp.int32, (Wi_g, Hp), 0
                                           ).astype(f)
            iir = jax.lax.broadcasted_iota(jnp.int32, (Wi_g, Hp), 1
                                           ).astype(f)
            wu_c = _mob_fwd(wu0, dwu, cu_g, xgi + 0.5)
            den = bu - wu_c * bp_
            den = jnp.where(jnp.abs(den) < 1e-20,
                            jnp.where(den < 0, -1e-20, 1e-20), den)
            jhat = (wu_c * cp_ - cu_ - (au - wu_c * ap) * iir) / den
            dd = ap * iir + bp_ * jhat + cp_
            dd = jnp.where(jnp.abs(dd) < 1e-20,
                           jnp.where(dd < 0, -1e-20, 1e-20), dd)
            wv_b = (av * iir + bv * jhat + cv_) / dd
            yb = _mob_inv(wv0, dwv, cv_g, wv_b) - 0.5
            # Same masking rationale as variant A: no valid pixel consumes
            # a pass-1 column entry whose solved pixel column Ĵ is outside
            # the image + margin (the plan's feasibility window).
            ok_b = (jnp.isfinite(yb) & (jhat >= f(-16.0))
                    & (jhat <= f(W) + f(15.0)) & (iir < f(H_img)))
            yb = jnp.where(ok_b, yb, f(-10.0))
            gx_p = jnp.pad(gx, ((0, Hp - H), (0, 0)), constant_values=-10.0)
            warped_p = warp_pallas.warp_two_pass_b(
                chans, yb, gx_p, RECT_A=RECT_A, RECT_B=RECT_B,
                scales=scales, interpret=interpret, pipeline=warp_pipe)
        else:
            ygi = jax.lax.broadcasted_iota(jnp.int32, (Hi, W), 0).astype(f)
            jj = jax.lax.broadcasted_iota(jnp.int32, (Hi, W), 1).astype(f)
            wv_t = _mob_fwd(wv0, dwv, cv_g, ygi + 0.5)
            den = av - wv_t * ap
            den = jnp.where(jnp.abs(den) < 1e-20,
                            jnp.where(den < 0, -1e-20, 1e-20), den)
            ihat = (wv_t * (bp_ * jj + cp_) - (bv * jj + cv_)) / den
            dd = ap * ihat + bp_ * jj + cp_
            dd = jnp.where(jnp.abs(dd) < 1e-20,
                           jnp.where(dd < 0, -1e-20, 1e-20), dd)
            wu_a = (au * ihat + bu * jj + cu_) / dd
            xa = _mob_inv(wu0, dwu, cu_g, wu_a) - 0.5
            # Mask pass-A positions outside the solved-image-row validity
            # window — the SAME window the plan's feasibility span used
            # (render/plan.py:two_pass_warp_plan). Past the homography
            # horizon ihat blows up while xa tends to a finite limit;
            # unmasked, those lanes drag the tile's aligned DMA base away
            # from the valid lanes (wrong texels for the whole tile). No
            # valid pixel consumes a pass-A row whose ihat is outside the
            # image + margin, so masking to the -10 sentinel is exact.
            ok_a = (jnp.isfinite(xa) & (ihat >= f(-16.0))
                    & (ihat <= f(H_img) + f(15.0)))
            xa = jnp.where(ok_a, xa, f(-10.0))
            gy_t = jnp.pad(jnp.swapaxes(gy, 0, 1), ((0, 0), (0, Hp - H)),
                           constant_values=-10.0)
            warped_p = warp_pallas.warp_two_pass(
                chans, xa, gy_t, RECT_A=RECT_A, RECT_B=RECT_B,
                scales=scales, interpret=interpret, pipeline=warp_pipe)
        warped = warped_p[:, :H, :]
    elif interpret or R_warp is None:
        # XLA-gather warp: interpret/test mode, or the last-tier plan for
        # views where both Pallas warps degenerate (see plan_from_stats).
        warped = _warp_reference(chans, gx, gy)
    else:
        from . import warp_pallas

        warped = warp_pallas.warp_to_pixels(chans, gx, gy, R=R_warp)

    lum, alpha, depth = warped[0], warped[1], warped[2]
    covered = gx > -5.0
    depth = jnp.where(covered & (alpha > 0.0), depth, rays.depth_init)
    color = jnp.stack([lum, lum, lum, alpha], -1)
    nsamp = (warped[3].astype(jnp.int32) if num_test
             else jnp.zeros((H, W), jnp.int32))
    if num_test:
        n_steps_max = jnp.floor(
            jnp.ceil(f(dim_max) * jnp.sqrt(f(3.0))) * tf.sampling_factor
        )
        val = warped[3] / n_steps_max
        color = jnp.concatenate(
            [jnp.stack([val, val, val], -1), jnp.ones((H, W, 1), f)], -1
        )
        color = jnp.where(covered[..., None], color, 0.0)

    zi = jnp.zeros((H, W), jnp.int32)
    return RenderOutput(color=color, depth=depth, num_volume_samples=nsamp,
                        num_distance_samples=zi, num_empty_samples=zi,
                        iterations=iterations)


_frame_jit = functools.partial(
    jax.jit,
    static_argnames=("p_axis", "Hi", "Wi", "R_sweep", "R_warp", "ert",
                     "test", "n_slabs", "interpret", "sgn_p", "dist_leap",
                     "RECT_A", "RECT_B", "return_chans", "tile_h",
                     "R_brick", "span_blks", "texture_tf", "height",
                     "width", "warp_variant", "rect_w", "tent_prec"),
)(_frame_body)

_pixel_stage_jit = functools.partial(
    jax.jit,
    static_argnames=("p_axis", "Hi", "R_warp", "test", "RECT_A", "RECT_B",
                     "interpret", "dim_max", "H_total", "warp_variant",
                     "warp_pipe"),
)(_pixel_stage)


def render_frame(
    vol_t,
    occupancy_t,
    tf: TFParams,
    rays: RaySetup,
    uniforms: FrameUniforms,
    proj_view_model,
    grad_t=None,
    *,
    p_axis: int,
    ert: bool = True,
    test: Test = Test.NONE,
    oversample: float = 1.0,
    interpret: bool = False,
    dist_leap: bool = False,
    texture_tf: bool = False,
) -> RenderOutput:
    """General-camera production path: plan on the host (tiny, subsampled),
    then run the fused w-grid sweep + warp jit (see _frame_jit)."""
    H, W = rays.valid.shape
    if H % TILE_H or W % TILE_W:
        raise PallasUnsupported(f"image {H}x{W} not tile-aligned")
    Np = vol_t.shape[0]
    plan = plan_frame(uniforms, rays, p_axis, vol_t.shape, H, W)
    if plan is None:
        raise PallasUnsupported("view exceeds w-grid kernel limits")
    n_slabs = int(max(2, round(Np * oversample)))
    grid_params = jnp.asarray(
        [plan["wu0"], plan["dwu"], plan.get("cu", 0.0),
         plan["wv0"], plan["dwv"], plan.get("cv", 0.0)], jnp.float32
    )
    hcoef = (jnp.asarray(plan["hcoef"], jnp.float32)
             if plan.get("hcoef") is not None else None)
    return _frame_jit(
        vol_t, occupancy_t, tf, rays, uniforms, proj_view_model, grid_params,
        grad_t, hcoef,
        p_axis=p_axis, Hi=plan["Hi"], Wi=plan["Wi"],
        R_sweep=plan["R_sweep"], R_warp=plan["R_warp"], ert=ert, test=test,
        n_slabs=n_slabs, sgn_p=plan["sgn_p"], interpret=interpret,
        dist_leap=dist_leap,
        RECT_A=plan["RECT_A"], RECT_B=plan["RECT_B"],
        tile_h=plan.get("tile_h", 8), R_brick=plan.get("R_brick"),
        span_blks=plan.get("span_blks", 2),
        rect_w=plan.get("rect_w", 256),
        texture_tf=texture_tf,
        warp_variant=plan.get("warp_variant", "A"),
    )


def _warp_reference(chans: jax.Array, gx: jax.Array, gy: jax.Array):
    """XLA bilinear warp (slow on TPU; used in interpret/test mode)."""
    C, Hi, Wi = chans.shape
    gxc = jnp.clip(gx, 0.0, Wi - 1.0)
    gyc = jnp.clip(gy, 0.0, Hi - 1.0)
    x0 = jnp.clip(jnp.floor(gxc).astype(jnp.int32), 0, Wi - 1)
    y0 = jnp.clip(jnp.floor(gyc).astype(jnp.int32), 0, Hi - 1)
    x1 = jnp.minimum(x0 + 1, Wi - 1)
    y1 = jnp.minimum(y0 + 1, Hi - 1)
    fx = gxc - jnp.floor(gxc)
    fy = gyc - jnp.floor(gyc)
    flat = chans.reshape(C, -1)

    def tap(y, x):
        return flat[:, (y * Wi + x).reshape(-1)].reshape((C,) + gx.shape)

    c00 = tap(y0, x0); c01 = tap(y0, x1)
    c10 = tap(y1, x0); c11 = tap(y1, x1)
    c0 = c00 + (c01 - c00) * fx
    c1 = c10 + (c11 - c10) * fx
    out = c0 + (c1 - c0) * fy
    inside = (gx > -5.0)[None]
    return jnp.where(inside, out, 0.0)
