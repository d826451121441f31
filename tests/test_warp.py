"""Two-pass projective warp: both Catmull-Smith factorisation orders against
the direct bilinear warp on a synthetic homography."""

import numpy as np
import jax.numpy as jnp
import pytest

from vkvolume_tpu.render import plan as plan_mod
from vkvolume_tpu.render import warp_pallas as wp
from vkvolume_tpu.render.sweep_pallas import _warp_reference


def _setup_homography():
    """Mildly projective pixel→(wu, wv) map + a grid covering its range."""
    H, W = 32, 128
    hc = np.array([
        0.010, 0.004, -0.20,      # wu = (au i + bu j + cu) / den
        0.006, -0.009, 0.30,      # wv
        2e-4, 1e-4, 1.0,          # den = ap i + bp j + cp
    ], np.float64)
    au, bu, cu, av, bv, cv, ap, bp, cp = hc
    i, j = np.meshgrid(np.arange(H, dtype=np.float64),
                       np.arange(W, dtype=np.float64), indexing="ij")
    den = ap * i + bp * j + cp
    wu = (au * i + bu * j + cu) / den
    wv = (av * i + bv * j + cv) / den
    Hi, Wi = 64, 256
    wu0 = wu.min() - 0.02
    wv0 = wv.min() - 0.02
    dwu = (wu.max() - wu.min() + 0.04) / Wi
    dwv = (wv.max() - wv.min() + 0.04) / Hi
    gx = (wu - wu0) / dwu - 0.5
    gy = (wv - wv0) / dwv - 0.5
    plan = dict(wu0=wu0, dwu=dwu, wv0=wv0, dwv=dwv, Hi=Hi, Wi=Wi)
    # SMOOTH content: the factored warp equals the direct bilinear warp up
    # to second-order interpolation terms (exact only for smooth images —
    # which grid images are; white noise would differ at O(1)).
    yy, xx = np.meshgrid(np.linspace(0, 3, Hi), np.linspace(0, 3, Wi),
                         indexing="ij")
    chans = jnp.asarray(np.stack([
        np.sin(yy + 2 * xx), np.cos(2 * yy - xx), yy * 0.2 + xx * 0.1,
    ]).astype(np.float32))
    return hc, plan, chans, gx, gy, H, W


def test_two_pass_variant_b_matches_direct_warp():
    hc, plan, chans, gx, gy, H, W = _setup_homography()
    Hi, Wi = plan["Hi"], plan["Wi"]
    ref = np.asarray(_warp_reference(
        chans, jnp.asarray(gx, jnp.float32), jnp.asarray(gy, jnp.float32)))

    Hp = -(-H // 128) * 128
    xg, ii = np.meshgrid(np.arange(Wi, dtype=np.float64),
                         np.arange(Hp, dtype=np.float64), indexing="ij")
    yb, jhat = plan_mod.pass_b1_positions_np(hc, plan, xg, ii)
    ok = (np.isfinite(yb) & (jhat >= -16.0) & (jhat <= W + 15.0)
          & (ii < H))
    yb = np.where(ok, yb, -10.0)
    gx_p = np.full((Hp, W), -10.0, np.float32)
    gx_p[:H] = gx
    out = np.asarray(wp.warp_two_pass_b(
        chans, jnp.asarray(yb, jnp.float32), jnp.asarray(gx_p, jnp.float32),
        RECT_A=256, RECT_B=256, interpret=True))[:, :H, :]

    # Compare away from grid borders (the direct warp clamps, the factored
    # warp masks — both conventions only differ outside the grid interior).
    interior = ((gx > 1) & (gx < Wi - 2) & (gy > 1) & (gy < Hi - 2))
    d = np.abs(out - ref)[:, interior]
    assert d.max() < 2e-3, d.max()


def test_two_pass_variant_a_matches_direct_warp():
    hc, plan, chans, gx, gy, H, W = _setup_homography()
    Hi, Wi = plan["Hi"], plan["Wi"]
    ref = np.asarray(_warp_reference(
        chans, jnp.asarray(gx, jnp.float32), jnp.asarray(gy, jnp.float32)))

    yg, j = np.meshgrid(np.arange(Hi, dtype=np.float64),
                        np.arange(W, dtype=np.float64), indexing="ij")
    xa, ihat = plan_mod.pass_a_positions_np(hc, plan, yg, j)
    ok = np.isfinite(xa) & (ihat >= -16.0) & (ihat <= H + 15.0)
    xa = np.where(ok, xa, -10.0)
    Hp = -(-H // 128) * 128
    gy_t = np.full((W, Hp), -10.0, np.float32)
    gy_t[:, :H] = gy.T
    out = np.asarray(wp.warp_two_pass(
        chans, jnp.asarray(xa, jnp.float32), jnp.asarray(gy_t, jnp.float32),
        RECT_A=256, RECT_B=256, interpret=True))[:, :H, :]

    interior = ((gx > 1) & (gx < Wi - 2) & (gy > 1) & (gy < Hi - 2))
    d = np.abs(out - ref)[:, interior]
    # Variant A is the stretched order for this synthetic map (larger
    # second-order interpolation term); the bound still catches any
    # indexing/solve bug (those are O(0.5) on this content).
    assert d.max() < 0.03, d.max()


def test_plan_prefers_better_conditioned_variant():
    """Over a full orbit of the bench pose class, the plan must keep the
    slow XLA-gather warp fallback rare (< 20 % of poses) now that both
    factorisation orders are available (round 2: 39 % XLA-warp poses)."""
    from vkvolume_tpu.bench.harness import benchmark_camera
    from vkvolume_tpu.engine import VolumeOptions, from_array
    from vkvolume_tpu.render import make_uniforms
    from vkvolume_tpu.render import sweep_pallas as sp

    vol = np.zeros((494, 832, 832), np.uint8)
    v = from_array(vol, VolumeOptions(intensity_min=0.1), block_size=4)
    v.set_scale((100.0 / 832,) * 3)
    H, W = 1080, 1920
    counts = {"xla": 0, "two": 0, "one": 0, "none": 0}
    variants = set()
    for az in range(0, 360, 10):
        cam = benchmark_camera(aspect=W / H, azimuth=float(az))
        u = make_uniforms(cam, v.node_transform, v.image_transform, 50.0,
                          (4, 4, 4))
        view = plan_mod.analyze_view(u, H, W)
        if view is None or view["mixed"]:
            counts["none"] += 1
            continue
        plan = sp.plan_from_stats(view, u, view["p_axis"], vol.shape, H, W)
        if plan is None:
            counts["none"] += 1
        elif plan.get("RECT_A"):
            counts["two"] += 1
            variants.add(plan.get("warp_variant"))
        elif plan.get("warp_xla"):
            counts["xla"] += 1
        else:
            counts["one"] += 1
    total = sum(counts.values())
    assert counts["xla"] / total < 0.2, counts
    assert "B" in variants, counts


@pytest.mark.parametrize("shape,W,H,bound", [
    ((795, 1024, 1024), 1200, 1200, 14e6),   # snake, CSV protocol size
    ((442, 492, 492), 1200, 1200, 10e6),     # present
])
def test_plan_cost_bounded_other_datasets(shape, W, H, bound):
    """The cap-relief rescue must hold for the non-beetle benchmark
    shapes too (snake is the largest volume; its pre-rescue handover
    plans were the worst offenders)."""
    from vkvolume_tpu.bench.harness import benchmark_camera
    from vkvolume_tpu.engine import VolumeOptions, from_array
    from vkvolume_tpu.render import make_uniforms
    from vkvolume_tpu.render import sweep_pallas as sp

    d, h, w = shape
    v = from_array(np.zeros(shape, np.uint8),
                   VolumeOptions(intensity_min=0.1), block_size=4)
    v.set_scale((100.0 / max(shape),) * 3)

    def vshape(p):
        return {2: (d, h, w), 1: (h, d, w), 0: (w, d, h)}[p]

    for az in (30, 50, 70, 90):
        cam = benchmark_camera(aspect=W / H, azimuth=float(az))
        u = make_uniforms(cam, v.node_transform, v.image_transform, 50.0,
                          (4, 4, 4))
        view, plan = sp.select_view_plan(u, H, W, vshape)
        assert plan is not None, az
        assert sp._plan_cost(plan) < bound, (az, sp._plan_cost(plan))


def test_plan_cost_stays_rescued_over_orbit():
    """Regression lock for the cap-relief rescue (wide brick rects): no
    benchmark-class pose may fall back to a kernel-cap-inflated grid.
    Before the rescue, handover poses planned per-slab 832×6144 grids
    (~20M cost units) and the headline pose swept 1.9× its quality
    columns; after it every pose stays under ~10M and the headline pose
    under ~5M."""
    from vkvolume_tpu.bench.harness import benchmark_camera
    from vkvolume_tpu.engine import VolumeOptions, from_array
    from vkvolume_tpu.render import make_uniforms
    from vkvolume_tpu.render import sweep_pallas as sp

    d, h, w = 494, 832, 832
    v = from_array(np.zeros((d, h, w), np.uint8),
                   VolumeOptions(intensity_min=0.1), block_size=4)
    v.set_scale((100.0 / 832,) * 3)
    H, W = 1080, 1920

    def vshape(p):
        return {2: (d, h, w), 1: (h, d, w), 0: (w, d, h)}[p]

    worst = 0.0
    for az in range(30, 131, 10):
        cam = benchmark_camera(aspect=W / H, azimuth=float(az))
        u = make_uniforms(cam, v.node_transform, v.image_transform, 50.0,
                          (4, 4, 4))
        view, plan = sp.select_view_plan(u, H, W, vshape)
        assert plan is not None, az
        c = sp._plan_cost(plan)
        worst = max(worst, c)
        if az == 30:
            assert c < 5e6, (az, c, plan["Hi"], plan["Wi"])
            assert plan["R_brick"] is not None
    assert worst < 10e6, worst


def test_full_source_rect_covers_any_span():
    """resample_rows at RECT == Ws (plan._pick_rect's frozen-orbit rescue):
    the aligned DMA base is pinned at 0 and the window covers every source
    column, so positions spanning the WHOLE source inside one tile — far
    beyond the usual RECT - 132 feasibility bound — must still resample
    exactly. Runs the real kernel under the Pallas interpreter."""
    rng = np.random.default_rng(7)
    C, Hs, Ws = 3, 16, 384
    src = rng.random((C, Hs, Ws), np.float32)
    # Per-tile spans ~Ws: positions jump across the full source width
    # within every 8x128 tile.
    pos = rng.uniform(0.0, Ws - 1.0, (Hs, 128)).astype(np.float32)
    pos[3, 40:60] = -10.0                      # masked pixels → 0
    out = np.asarray(wp.resample_rows(
        jnp.asarray(src), jnp.asarray(pos), RECT=Ws, interpret=True))
    ref = np.asarray(wp._resample_rows_reference(
        jnp.asarray(src), jnp.asarray(pos)))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_pick_rect_full_source_rescue():
    """_pick_rect: spans past cap - 132 are infeasible unforced, but the
    frozen-orbit path may use the full (lane-aligned) source width, which
    covers any span."""
    # Ordinary sizing: 128-quantised (tight rects halve the DMA-bound
    # warp's traffic), 132-lane alignment+tent margin, 256 floor.
    assert plan_mod._pick_rect(500.0, 5376) == 640
    assert plan_mod._pick_rect(100.0, 5376) == 256
    # Unforced: over-cap span → infeasible.
    assert plan_mod._pick_rect(5000.0, 5376) is None
    assert plan_mod._pick_rect(3900.0, 5376) == 4096
    assert plan_mod._pick_rect(3950.0, 5376) == 4096
    # Forced (frozen orbit): full-source rect accepts any span when the
    # width is lane-aligned; quantised sizing still applies below it.
    assert plan_mod._pick_rect(5000.0, 5376, allow_full_src=True) == 5248
    assert plan_mod._pick_rect(5300.0, 5376, allow_full_src=True) == 5376
    # Non-lane-aligned width: no full-source rect, over-cap span stays
    # infeasible.
    assert plan_mod._pick_rect(5300.0, 5390, allow_full_src=True) is None
    assert plan_mod._pick_rect(1747.0, 1152, allow_full_src=True) == 1152
    assert plan_mod._pick_rect(4000.0, 5376, allow_full_src=True) == 4224


def test_pipelined_resample_matches_inline():
    """resample_rows(pipeline=True): the cross-grid-step double-buffered
    rect DMA (bases precomputed into the scalar-prefetch array) must
    resample identically to the inline-DMA kernel, including masked
    pixels, u16 encoding, and full-source rects."""
    rng = np.random.default_rng(3)
    C, Hs, Ws = 3, 32, 1024
    src = jnp.asarray(rng.random((C, Hs, Ws), np.float32))
    pos = rng.uniform(0.0, 300.0, (Hs, 256)).astype(np.float32)
    pos[5, 10:30] = -10.0
    pos = jnp.asarray(pos)
    ref = np.asarray(wp.resample_rows(src, pos, RECT=512, interpret=True,
                                      pipeline=False))
    out = np.asarray(wp.resample_rows(src, pos, RECT=512, interpret=True,
                                      pipeline=True))
    np.testing.assert_allclose(out, ref, atol=1e-6)
    # u16-encoded + full-source rect through the pipelined path.
    enc = jnp.asarray((np.asarray(src) * 60000).astype(np.uint16))
    pos_w = jnp.asarray(
        rng.uniform(0.0, Ws - 1.0, (Hs, 256)).astype(np.float32))
    r2 = np.asarray(wp.resample_rows(enc, pos_w, RECT=Ws, interpret=True,
                                     pipeline=False, encode_out=True))
    o2 = np.asarray(wp.resample_rows(enc, pos_w, RECT=Ws, interpret=True,
                                     pipeline=True, encode_out=True))
    np.testing.assert_array_equal(o2, r2)
