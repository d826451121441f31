#!/usr/bin/env python3
"""Round-5: separate the two remaining candidate causes of the production
two-pass-warp divergence (r5_warp_isolate: prod 8.78 % vs XLA warp 0.85 %
against the oracle on the SAME device grid image) WITHOUT device time:

  (a) f32 position precision — production computes the pass-1/2 homography
      SOLVE positions in f32 on device (sweep_pallas._pixel_stage); the
      device bisect that exonerated the kernel at RECT=512 fed it f64 host
      positions;
  (b) the separable Catmull-Smith filter itself on sharp gradient-TF
      content (two 1-D linear resamples != one bilinear resample).

Runs on CPU over the device-captured grid image (warpiso npz):
  A. exact separable filter + production-f32 positions
     (_pixel_stage(..., interpret=True) — routes warp_two_pass_b to the
     XLA reference resample chain with the production position math);
  B. exact separable filter + f64 host positions (numpy homography);
  C. the saved device XLA single-pass warp (npz 'b');
  D. the saved device production two-pass warp (npz 'a').

A≈D: precision is the cause.  A≈C but D bad: the device kernel itself.
B≈D: the separable filter cannot represent this content.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from vkvolume_tpu.bench.datasets import DATASETS, synthesize
    from vkvolume_tpu.bench.harness import benchmark_camera
    from vkvolume_tpu.engine.engine import Engine
    from vkvolume_tpu.engine.volume import from_array
    from vkvolume_tpu.options import (RenderOptions, SkippingType,
                                      VolumeOptions)
    from vkvolume_tpu.render import sweep as sweep_mod
    from vkvolume_tpu.render import sweep_pallas as sp
    from vkvolume_tpu.render import warp_pallas as wp
    from vkvolume_tpu.render.ray_setup import make_rays, make_uniforms

    dataset = os.environ.get("WP_DATASET", "present-grad")
    skipmode = int(os.environ.get("WP_SKIPMODE", "2"))
    W, H = 1920, 1080
    D = np.load(f"/tmp/warpiso_{dataset}_{skipmode}.npz")
    chans, dev_a, dev_b = D["chans"], D["a"], D["b"]
    ref = np.load(f"/tmp/parity_{dataset}_{skipmode}.npz")["ref"]

    t0 = time.time()
    ds = DATASETS[dataset]
    vol_u8 = synthesize(ds, seed=0, scale=1.0)
    opts = VolumeOptions(intensity_min=ds.imin, intensity_max=ds.imax,
                         gradient_min=ds.gmin, gradient_max=ds.gmax)
    eng = Engine(RenderOptions(skipping_type=SkippingType(skipmode)),
                 benchmark_mode=False, renderer="pallas")
    volume = from_array(vol_u8, opts, block_size=4, name=ds.filename)
    d, h, w = vol_u8.shape
    volume.set_scale((100.0 / max(d, h, w),) * 3)
    # No add_volume: the probe never touches accel maps (CPU map builds at
    # full scale cost minutes); only transforms / TF / plan are needed.
    cam = benchmark_camera(aspect=W / H)
    uniforms = make_uniforms(
        cam, volume.node_transform, volume.image_transform,
        eng.options.clip_distance,
        np.asarray(volume.effective_block_size_xyz, np.float32))
    dsh = volume.density.shape
    view, plan = sp.select_view_plan(
        uniforms, H, W,
        lambda q: {2: dsh, 1: (dsh[1], dsh[0], dsh[2]),
                   0: (dsh[2], dsh[0], dsh[1])}[q])
    p = view["p_axis"]
    tf = eng._tf(volume)
    rays = make_rays(uniforms, H, W)
    grid_params = jnp.asarray(
        [plan["wu0"], plan["dwu"], plan.get("cu", 0.0),
         plan["wv0"], plan["dwv"], plan.get("cv", 0.0)], jnp.float32)
    hcoef = jnp.asarray(plan["hcoef"], jnp.float32)
    Np, Sv, Su = {2: dsh, 1: (dsh[1], dsh[0], dsh[2]),
                  0: (dsh[2], dsh[0], dsh[1])}[p]
    print("plan:", {k: plan.get(k) for k in (
        "Hi", "Wi", "RECT_A", "RECT_B", "warp_variant")},
        f"p_axis={p} setup {time.time()-t0:.0f}s", flush=True)
    assert plan.get("warp_variant") == "B", "probe assumes variant B"

    stage_kw = dict(p_axis=p, Hi=plan["Hi"], test=eng.options.test,
                    dim_max=max(Np, Sv, Su))
    iters = jnp.zeros((), jnp.int32)

    # A: production position math (f32, XLA-CPU) + exact separable filter.
    out_a = sp._pixel_stage(
        chans, rays, grid_params, hcoef, tf, iters,
        R_warp=plan["R_warp"], RECT_A=plan["RECT_A"], RECT_B=plan["RECT_B"],
        interpret=True, warp_variant="B", **stage_kw)
    a = np.asarray(out_a.color)
    print(f"A done {time.time()-t0:.0f}s", flush=True)

    # B: f64 host positions + exact separable filter (the bisect's math).
    C, Hi, Wi = chans.shape
    Hp = -(-H // 128) * 128
    hc = np.asarray(plan["hcoef"], np.float64)
    au, bu, cu_, av, bv, cv_, ap, bp_, cp_ = hc
    wu0, dwu = plan["wu0"], plan["dwu"]
    wv0, dwv = plan["wv0"], plan["dwv"]
    cug = plan.get("cu", 0.0) or 0.0
    cvg = plan.get("cv", 0.0) or 0.0
    xgi, iir = np.meshgrid(np.arange(Wi, dtype=np.float64),
                           np.arange(Hp, dtype=np.float64), indexing="ij")
    xg5 = xgi + 0.5
    wu_c = wu0 + dwu * xg5 / (1.0 - cug * xg5)
    den = bu - wu_c * bp_
    jhat = (wu_c * cp_ - cu_ - (au - wu_c * ap) * iir) / den
    ddn = ap * iir + bp_ * jhat + cp_
    wv_b = (av * iir + bv * jhat + cv_) / ddn
    yb = (wv_b - wv0) / (dwv + cvg * (wv_b - wv0)) - 0.5
    ok = np.isfinite(yb) & (jhat >= -16.0) & (jhat <= W + 15.0) & (iir < H)
    yb64 = np.where(ok, yb, -10.0).astype(np.float32)
    # gx in f64: forward Möbius of per-pixel ray dirs (as _pixel_stage).
    dvec = np.asarray(rays.ray_dir, np.float64)
    v_ax, u_ax = sp._SLICE_AXES[p]
    d_p = dvec[..., p]
    okp = np.abs(d_p) > 1e-6
    wu_pix = dvec[..., u_ax] / np.where(okp, d_p, 1.0)
    gx64 = (wu_pix - wu0) / (dwu + cug * (wu_pix - wu0)) - 0.5
    gx64 = np.where(np.asarray(rays.valid) & okp, gx64, -10.0
                    ).astype(np.float32)
    gx_p64 = np.pad(gx64, ((0, Hp - H), (0, 0)), constant_values=-10.0)
    src = jnp.swapaxes(jnp.asarray(chans), 1, 2)
    t1 = wp._resample_rows_reference(src, jnp.asarray(yb64))
    out_b = wp._resample_rows_reference(
        jnp.swapaxes(t1, 1, 2), jnp.asarray(gx_p64))
    b_img = np.asarray(out_b)[:, :H, :]
    lum, alpha = b_img[0], b_img[1]
    b = np.stack([lum, lum, lum, alpha], -1)
    print(f"B done {time.time()-t0:.0f}s", flush=True)

    def stats(img):
        dd = np.abs(img - ref).max(-1)
        return dict(pct_gt8=round(100.0 * float((dd > 8 / 255).mean()), 4),
                    mean=round(float(dd.mean()), 6))

    res = dict(
        A_f32pos_exact_filter=stats(a),
        B_f64pos_exact_filter=stats(b),
        C_device_xla_warp=stats(dev_b),
        D_device_prod_warp=stats(dev_a),
        A_vs_D=round(100.0 * float(
            (np.abs(a - dev_a).max(-1) > 8 / 255).mean()), 4),
        A_vs_C=round(100.0 * float(
            (np.abs(a - dev_b).max(-1) > 8 / 255).mean()), 4),
        B_vs_C=round(100.0 * float(
            (np.abs(b - dev_b).max(-1) > 8 / 255).mean()), 4),
        wall_s=round(time.time() - t0, 1),
    )
    with open("/tmp/warp_cpu_probe.json", "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    main()
