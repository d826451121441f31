"""Device smoke test for the round-3 kernel variants BEFORE they carry a
benchmark artifact: compiles and runs, on tiny shapes, every new Mosaic
specialisation class the refreshed plans can emit — wide brick rects
(384/512), reduced tent precision, and the full-source warp rect. Mosaic
compile failures on the tunneled compile helper surface as opaque HTTP
500s (CLAUDE.md), so a 2-minute smoke here beats a wrecked 45-minute
bench step. Writes /tmp/r3_smoke.json: {variant: "ok" | error string}.

The artifact chain reads the verdict: if a wide rect fails to compile it
exports VKV_MAX_RECT=256 so the plans fall back to the proven geometry.
"""

import json
import sys
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from vkvolume_tpu.utils import enable_compile_cache

enable_compile_cache()

RESULTS = {}


# Transport-class failures (relay flapping / device half-up) say nothing
# about whether a kernel class compiles — a run dominated by them must not
# count as a smoke verdict (round 4: a flapping relay once recorded ALL
# classes as FAILED_PRECONDITION and the chain pinned conservative
# geometry off pure noise).
_TRANSPORT = ("FAILED_PRECONDITION", "DEADLINE_EXCEEDED", "UNAVAILABLE",
              "TPU worker", "Socket closed")
_transport_failures = 0


def step(name, fn):
    global _transport_failures
    t0 = time.time()
    try:
        fn()
        RESULTS[name] = "ok"
    except Exception as e:  # noqa: BLE001 - verdict file, not control flow
        RESULTS[name] = f"{type(e).__name__}: {e}"[:300]
        if any(t in RESULTS[name] for t in _TRANSPORT):
            _transport_failures += 1
    print(f"[{time.time() - t0:7.1f}s] {name}: {RESULTS[name][:80]}",
          flush=True)
    with open(os.environ.get("SMOKE_OUT", "/tmp/r3_smoke.json"), "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    if _transport_failures >= 3:
        print("aborting: transport failures, not kernel verdicts",
              flush=True)
        sys.exit(1)


def _brick_inputs():
    """Tiny separable-grid brick-kernel inputs (Su >= 512 so the wide rect
    needs no in-jit volume pad)."""
    from vkvolume_tpu.render import sweep_bricks as sb
    from vkvolume_tpu.render.ray_setup import FrameUniforms
    from vkvolume_tpu.tf.transfer_function import TFParams

    rng = np.random.default_rng(0)
    Np, Sv, Su = 32, 64, 640
    vol_t = jnp.asarray(rng.integers(0, 255, (Np, Sv, Su), np.uint8))
    occ_t = jnp.asarray(
        rng.integers(0, 2, (-(-Np // 4), -(-Sv // 4), -(-Su // 4)),
                     np.uint8) * 3)
    f32 = np.float32
    ident = np.eye(4, dtype=f32)
    u = FrameUniforms(
        view=jnp.asarray(ident), proj=jnp.asarray(ident),
        view_proj_inv=jnp.asarray(ident), model=jnp.asarray(ident),
        model_inv=jnp.asarray(ident), global_to_tex=jnp.asarray(ident),
        plane=jnp.zeros(4, f32), plane_tex=jnp.zeros(4, f32),
        cam_pos_tex=jnp.asarray([0.5, 0.5, -2.0], f32),
        block_size=jnp.asarray([4.0, 4.0, 4.0], f32),
        front_index=jnp.asarray(0, jnp.int32),
    )
    tf = TFParams(
        intensity_min=jnp.asarray(0.1, f32),
        intensity_range_inv=jnp.asarray(1.0 / 0.9, f32),
        gradient_min=jnp.asarray(0.0, f32),
        gradient_range_inv=jnp.asarray(0.0, f32),
        voxel_alpha_factor=jnp.asarray(1.0, f32),
        sampling_factor=jnp.asarray(1.0, f32),
        grad_magnitude_modifier=jnp.asarray(1.0, f32),
        use_gradient=False,
    )
    H, W = 32, 256
    gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    wu = (gx / W - 0.5) * 0.4          # column-only
    wv = (gy / H - 0.5) * 0.4          # row-only
    s_lo = jnp.full((H, W), 0.05, jnp.float32)
    s_hi = jnp.full((H, W), 0.95, jnp.float32)
    kappa = jnp.full((H, W), 1.0, jnp.float32)
    cov = jnp.ones((H, W), jnp.float32)
    grid = (wu, wv, s_lo, s_hi, kappa, cov)
    pvm = jnp.asarray(ident)
    return sb, vol_t, occ_t, tf, u, pvm, grid, Np


def brick(rect_w, tent_prec="highest", tile_h=16, R=24, span_blks=2):
    sb, vol_t, occ_t, tf, u, pvm, grid, Np = _brick_inputs()
    out = sb._sweep_bricks_jit(
        vol_t, occ_t, tf, None, u, pvm, None, grid,
        p_axis=2, R=R, ert=True, test=None, count_samples=False,
        n_slabs=Np, sgn=1, tile_h=tile_h, span_blks=span_blks,
        dist_leap=True,
        rect_w=rect_w, tent_prec=tent_prec,
        interpret=os.environ.get("SMOKE_INTERPRET") == "1")
    v = float(np.asarray(out.color).sum())
    assert np.isfinite(v)


def brick_grad_unaligned():
    """The -grad production class after the round-4 slab-density fix
    (RenderOptions.slab_density="auto"): n_slabs = dim_max·sf > Np (the
    unaligned plane-lerp path) WITH the gradient-modulated TF. New Mosaic
    specialisation — must compile before the -grad parity/bench steps."""
    import dataclasses as _dc

    sb, vol_t, occ_t, tf, u, pvm, grid, Np = _brick_inputs()
    rng = np.random.default_rng(3)
    grad_t = jnp.asarray(rng.integers(0, 255, vol_t.shape, np.uint8))
    f32 = np.float32
    tf = _dc.replace(tf, use_gradient=True,
                     gradient_min=jnp.asarray(0.1, f32),
                     gradient_range_inv=jnp.asarray(1.0 / 0.2, f32))
    out = sb._sweep_bricks_jit(
        vol_t, occ_t, tf, None, u, pvm, grad_t, grid,
        p_axis=2, R=24, ert=True, test=None, count_samples=False,
        n_slabs=int(Np * 1.68), sgn=1, tile_h=16, span_blks=2,
        dist_leap=True, rect_w=256,
        interpret=os.environ.get("SMOKE_INTERPRET") == "1")
    assert np.isfinite(float(np.asarray(out.color).sum()))


def warp_full_src(pipeline=False):
    from vkvolume_tpu.render import warp_pallas as wp

    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.random((3, 16, 1152), np.float32))
    pos = jnp.asarray(
        rng.uniform(0.0, 1151.0, (16, 128)).astype(np.float32))
    out = wp.resample_rows(
        src, pos, RECT=1152, pipeline=pipeline,
        interpret=os.environ.get("SMOKE_INTERPRET") == "1")
    assert np.isfinite(float(np.asarray(out).sum()))


def warp_pipelined_prod():
    """The PRODUCTION pipelined-warp class: RECT < Ws, a multi-step grid
    and per-tile DYNAMIC nonzero 128-aligned rect bases prefetched from
    SMEM (the full-source case above degenerates to base 0 everywhere —
    dynamic-offset DMA is this build's known device-fault class,
    CLAUDE.md). Verdict also checks equality against the inline kernel."""
    from vkvolume_tpu.render import warp_pallas as wp

    rng = np.random.default_rng(2)
    Ws, Wo, H = 1152, 512, 16
    src = jnp.asarray(rng.random((3, H, Ws), np.float32))
    # Column tile k samples around base ~240·k: spans fit RECT-132 but the
    # aligned bases differ per tile (0/128/384/640). Tile 2 is fully
    # masked (pos = -10) — exercises the base = -1 DMA-skip sentinel.
    cols = [rng.uniform(240.0 * k, 240.0 * k + 200.0, (H, 128))
            for k in range(Wo // 128)]
    cols[2][:] = -10.0
    pos = jnp.asarray(np.concatenate(cols, axis=1).astype(np.float32))
    interp = os.environ.get("SMOKE_INTERPRET") == "1"
    out = np.asarray(wp.resample_rows(src, pos, RECT=384, pipeline=True,
                                      interpret=interp))
    ref = np.asarray(wp.resample_rows(src, pos, RECT=384, pipeline=False,
                                      interpret=interp))
    assert np.isfinite(out.sum())
    np.testing.assert_allclose(out, ref, atol=1e-5)


def main():
    step("brick_rect256", lambda: brick(256))
    step("brick_rect384", lambda: brick(384))
    step("brick_rect512", lambda: brick(512))
    step("brick_rect384_r96", lambda: brick(384, R=96))
    # The headline pose's exact kernel class (plan az=30: 32-row tiles,
    # 6-block tent windows, 64-row rect, 384-lane rect).
    step("brick_headline_class",
         lambda: brick(384, tile_h=32, R=64, span_blks=6))
    step("brick_rect512_tent_high", lambda: brick(512, tent_prec="high"))
    step("brick_tent_default", lambda: brick(256, tent_prec="default"))
    # split3 = manual 3-pass bf16 emulation of the rejected HIGH enum
    # (sweep_bricks.tent_dot) — smoke BOTH the generic class and the
    # headline pose's exact geometry before any bench flips the default.
    step("brick_tent_split3", lambda: brick(256, tent_prec="split3"))
    step("brick_headline_split3",
         lambda: brick(384, tile_h=32, R=64, span_blks=6,
                       tent_prec="split3"))
    step("brick_grad_unaligned", brick_grad_unaligned)
    step("warp_full_src_rect", warp_full_src)
    step("warp_pipelined", lambda: warp_full_src(pipeline=True))
    step("warp_pipelined_prod", warp_pipelined_prod)
    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
