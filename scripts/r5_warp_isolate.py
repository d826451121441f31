#!/usr/bin/env python3
"""Round-5: isolate the full-scale gradient-TF parity gap WITHIN the
production frame — grid-image content (brick sweep kernel) vs the
grid→pixel warp (two-pass u16 Pallas kernels).

Renders the production w-grid ONCE on device (sp._frame_jit with
return_chans=True — the exact kernel + plan the engine uses), then warps
the same grid image to pixels two ways:

  A. the production two-pass u16 Pallas warp (_pixel_stage with the plan's
     RECT_A/RECT_B/warp_variant) — what the engine ships;
  B. the XLA reference warp (_warp_reference: float single-pass bilinear
     at the exact pixel→grid homography positions) — same grid content,
     bit-clean resample.

Against the oracle (scripts/tpu_parity.py npz): if A ≈ B ≈ bad, the grid
IMAGE is wrong (brick kernel at full-scale statics); if B clean and A bad,
the warp kernels are wrong (u16 encode / rect windows / masking at
full-scale RECT sizes).

Env: WI_DATASET (present-grad), WI_SKIPMODE (2), WI_W/H (1920/1080),
WI_REF_NPZ, WI_OUT (/tmp/warp_isolate.json).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vkvolume_tpu.utils import enable_compile_cache


def main():
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from vkvolume_tpu.bench.datasets import DATASETS, synthesize
    from vkvolume_tpu.bench.harness import benchmark_camera, make_engine
    from vkvolume_tpu.options import SkippingType
    from vkvolume_tpu.render import sweep as sweep_mod
    from vkvolume_tpu.render import sweep_pallas as sp
    from vkvolume_tpu.render.ray_setup import make_rays, make_uniforms

    dataset = os.environ.get("WI_DATASET", "present-grad")
    skipmode = int(os.environ.get("WI_SKIPMODE", "2"))
    width = int(os.environ.get("WI_W", "1920"))
    height = int(os.environ.get("WI_H", "1080"))
    out_path = os.environ.get("WI_OUT", "/tmp/warp_isolate.json")
    ref = np.load(os.environ.get(
        "WI_REF_NPZ", f"/tmp/parity_{dataset}_{skipmode}.npz"))["ref"]

    t0 = time.time()
    vol = synthesize(DATASETS[dataset], seed=0, scale=1.0)
    eng, _, _, _ = make_engine(dataset, skipmode, 4, scale=1.0,
                               volume_u8=vol, renderer="pallas",
                               benchmark_mode=False)
    volume = eng.volumes[0]
    cam = benchmark_camera(aspect=width / height)

    uniforms = make_uniforms(
        cam, volume.node_transform, volume.image_transform,
        eng.options.clip_distance,
        np.asarray(volume.effective_block_size_xyz, np.float32))
    dsh = volume.density.shape
    shape_for = lambda q: {2: dsh, 1: (dsh[1], dsh[0], dsh[2]),
                           0: (dsh[2], dsh[0], dsh[1])}[q]
    view, plan = sp.select_view_plan(uniforms, height, width, shape_for)
    p = view["p_axis"]
    vol_t = sweep_mod.transpose_for_axis(volume.density, p)
    grad_t = sweep_mod.transpose_for_axis(volume.gradient, p)
    maps = volume.dist_maps
    src = maps[0]
    for i in range(1, maps.shape[0]):
        src = jnp.minimum(src, maps[i])
    occ_t = sweep_mod.transpose_for_axis(src, p)
    tf = eng._tf(volume)
    n_slabs = int(max(2, round(
        vol_t.shape[0] * eng._slab_oversample(volume, vol_t.shape, tf))))
    pvm = jnp.asarray((cam.proj.astype(np.float64)
                       @ cam.view.astype(np.float64)
                       @ volume.model_matrix).astype(np.float32))
    rays = make_rays(uniforms, height, width)
    grid_params = jnp.asarray(
        [plan["wu0"], plan["dwu"], plan.get("cu", 0.0),
         plan["wv0"], plan["dwv"], plan.get("cv", 0.0)], jnp.float32)
    hcoef = (jnp.asarray(plan["hcoef"], jnp.float32)
             if plan.get("hcoef") is not None else None)
    dist_leap = eng.options.skipping_type in (
        SkippingType.DISTANCE, SkippingType.ANISOTROPIC_DISTANCE)
    print("plan:", {k: plan.get(k) for k in (
        "Hi", "Wi", "R_sweep", "R_brick", "tile_h", "rect_w", "RECT_A",
        "RECT_B", "warp_variant", "sgn_p")}, "n_slabs", n_slabs, flush=True)

    kw = dict(p_axis=p, Hi=plan["Hi"], Wi=plan["Wi"],
              R_sweep=plan["R_sweep"], R_warp=plan["R_warp"],
              ert=eng.options.early_ray_termination, test=eng.options.test,
              n_slabs=n_slabs, sgn_p=plan["sgn_p"], dist_leap=dist_leap,
              RECT_A=plan["RECT_A"], RECT_B=plan["RECT_B"],
              tile_h=plan.get("tile_h", 8), R_brick=plan.get("R_brick"),
              span_blks=plan.get("span_blks", 2),
              rect_w=plan.get("rect_w", 256),
              warp_variant=plan.get("warp_variant", "A"))

    chans, iters = sp._frame_jit(
        vol_t, occ_t, tf, rays, uniforms, pvm, grid_params, grad_t, hcoef,
        return_chans=True, **kw)
    chans.block_until_ready()
    print(f"grid stage done {time.time()-t0:.0f}s chans {chans.shape}",
          flush=True)

    Np, Sv, Su = vol_t.shape
    stage_kw = dict(p_axis=p, Hi=plan["Hi"], test=eng.options.test,
                    dim_max=max(Np, Sv, Su))
    out_a = sp._pixel_stage_jit(
        chans, rays, grid_params, hcoef, tf, iters,
        R_warp=plan["R_warp"], RECT_A=plan["RECT_A"], RECT_B=plan["RECT_B"],
        interpret=False, warp_variant=plan.get("warp_variant", "A"),
        **stage_kw)
    a = np.asarray(out_a.color)
    # B: XLA reference warp on the SAME grid image (RECT_A=None, R_warp
    # None routes _pixel_stage to _warp_reference).
    out_b = sp._pixel_stage_jit(
        chans, rays, grid_params, None, tf, iters,
        R_warp=None, RECT_A=None, RECT_B=None, interpret=False,
        warp_variant="A", **stage_kw)
    b = np.asarray(out_b.color)

    def stats(img):
        d = np.abs(img - ref).max(-1)
        return dict(pct_gt8=round(100.0 * float((d > 8 / 255).mean()), 4),
                    mean=round(float(d.mean()), 6))

    res = dict(
        dataset=dataset, skipmode=skipmode,
        plan={k: plan.get(k) for k in (
            "Hi", "Wi", "R_brick", "tile_h", "rect_w", "RECT_A", "RECT_B",
            "warp_variant")},
        n_slabs=n_slabs,
        prod_warp_vs_oracle=stats(a),
        xla_warp_vs_oracle=stats(b),
        warp_a_vs_b=round(100.0 * float(
            (np.abs(a - b).max(-1) > 8 / 255).mean()), 4),
        wall_s=round(time.time() - t0, 1),
    )
    np.savez(f"/tmp/warpiso_{dataset}_{skipmode}.npz", a=a, b=b,
             chans=np.asarray(chans))
    existing = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            existing = json.load(fh)
    existing[f"{dataset}:{skipmode}"] = res
    with open(out_path, "w") as fh:
        json.dump(existing, fh, indent=1)
    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    main()
