#!/usr/bin/env python3
"""Round-5 probe: decompose the gradient-TF parity gap into its two error
classes on device at full scale (VERDICT r4 missing #2 / next-round #1).

The production frame = separable w-grid sweep + projective warp. Its pixel
error vs the reference-exact marcher oracle has two independent sources:

  (a) warp resampling  — bilinear mixing of neighbouring grid rays at
      content silhouettes (each pixel's value is not its own ray);
  (b) slab quadrature  — fixed-phase plane-aligned sample positions vs the
      reference's per-ray uniform-in-t positions
      (volume_render.frag:176-179), visible on voxel-scale alpha shells.

The per-pixel (non-separable) Pallas kernel (sweep_pallas._kernel,
separable=False — the round-2 production path) shares (b) but eliminates
(a): every pixel marches its own ray. Rendering the SAME frame three ways
(production, per-pixel kernel, oracle) therefore splits the error classes
and answers whether suspect-tile re-rendering with the per-pixel kernel can
replace the 10-27 s oracle edge-repair (docs/parity_r4.json edge_repair
frame_ms) at production speed.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_perpixel_probe.py
Env: PROBE_DATASET (present-grad), PROBE_SKIPMODE (2), PROBE_W/H
     (1920/1080), PROBE_SCALE (1.0), PROBE_OUT (docs/perpixel_probe_r5.json)
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

    dataset = os.environ.get("PROBE_DATASET", "present-grad")
    skipmode = int(os.environ.get("PROBE_SKIPMODE", "2"))
    width = int(os.environ.get("PROBE_W", "1920"))
    height = int(os.environ.get("PROBE_H", "1080"))
    scale = float(os.environ.get("PROBE_SCALE", "1.0"))
    out_path = os.environ.get("PROBE_OUT", "docs/perpixel_probe_r5.json")

    t0 = time.time()
    vol_u8 = synthesize(DATASETS[dataset], seed=0, scale=scale)
    print(f"synth done {time.time()-t0:.0f}s", flush=True)
    cam = benchmark_camera(aspect=width / height)

    # --- oracle (reference-exact marcher; reuse the parity run's npz) -----
    npz = f"/tmp/parity_{dataset}_{skipmode}.npz"
    if os.path.exists(npz):
        ref = np.load(npz)["ref"]
        print("oracle: loaded from", npz, flush=True)
    else:
        eng_m, _, _, _ = make_engine(dataset, 2, 4, scale=scale,
                                     volume_u8=vol_u8, renderer="marcher",
                                     benchmark_mode=False)
        ref = np.asarray(eng_m.render(cam, width, height).color)
        del eng_m
        print(f"oracle rendered {time.time()-t0:.0f}s", flush=True)

    # --- production frame (separable sweep + warp) ------------------------
    eng, _, _, _ = make_engine(dataset, skipmode, 4, scale=scale,
                               volume_u8=vol_u8, renderer="pallas",
                               benchmark_mode=False)
    volume = eng.volumes[0]
    out = eng.render(cam, width, height)
    got = np.asarray(out.color)
    assert eng.last_renderer == "pallas", eng.last_renderer
    print(f"production rendered {time.time()-t0:.0f}s", flush=True)

    # --- per-pixel kernel frame (same quadrature, own ray per pixel) ------
    uniforms = make_uniforms(
        cam, volume.node_transform, volume.image_transform,
        eng.options.clip_distance,
        np.asarray(volume.effective_block_size_xyz, np.float32))
    view, _ = sp.select_view_plan(
        uniforms, height, width,
        lambda q: {2: volume.density.shape,
                   1: (volume.density.shape[1], volume.density.shape[0],
                       volume.density.shape[2]),
                   0: (volume.density.shape[2], volume.density.shape[0],
                       volume.density.shape[1])}[q])
    p = view["p_axis"]
    vol_t = sweep_mod.transpose_for_axis(volume.density, p)
    grad_t = (sweep_mod.transpose_for_axis(volume.gradient, p)
              if volume.gradient is not None else None)
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
    # Pad the viewport like the engine does (1080 % 8 == 0, 1920 % 128 == 0
    # already for the default probe size).
    assert height % 8 == 0 and width % 128 == 0
    rays = make_rays(uniforms, height, width)
    dist_leap = eng.options.skipping_type in (
        SkippingType.DISTANCE, SkippingType.ANISOTROPIC_DISTANCE)

    t1 = time.time()
    pp_out = sp.sweep_pallas(
        vol_t, occ_t, tf, rays, uniforms, pvm, grad_t,
        p_axis=p, ert=eng.options.early_ray_termination,
        test=eng.options.test, oversample=n_slabs / vol_t.shape[0],
        dist_leap=dist_leap)
    perpix = np.asarray(pp_out.color)
    print(f"per-pixel rendered {time.time()-t1:.1f}s", flush=True)

    # Warm per-frame cost, amortised over queued executions.
    n = 10
    t1 = time.time()
    for _ in range(n):
        pp_out = sp.sweep_pallas(
            vol_t, occ_t, tf, rays, uniforms, pvm, grad_t,
            p_axis=p, ert=eng.options.early_ray_termination,
            test=eng.options.test, oversample=n_slabs / vol_t.shape[0],
            dist_leap=dist_leap)
    pp_out.color.block_until_ready()
    float(np.asarray(pp_out.color.ravel()[0]))
    pp_ms = (time.time() - t1) * 1e3 / n

    # --- decomposition -----------------------------------------------------
    def stats(a, b, sel=None):
        d = np.abs(a - b).max(-1)
        if sel is not None:
            d = d[sel]
        return dict(
            pct_gt8=round(100.0 * float((d > 8 / 255).mean()), 5),
            mean=round(float(d.mean()), 6),
            max=round(float(d.max()), 5),
        )

    bad_prod = np.abs(got - ref).max(-1) > 8 / 255
    bad_pp = np.abs(perpix - ref).max(-1) > 8 / 255

    # Suspect detector (engine._edge_repair's): where do production's bad
    # pixels fall relative to it, and how many 8x128 tiles does it touch?
    a = got[..., 3]
    dep = np.asarray(out.depth)

    def rng3(x):
        from scipy.ndimage import maximum_filter, minimum_filter
        return maximum_filter(x, 3) - minimum_filter(x, 3)

    try:
        c3 = got[..., :3]
        m = ((rng3(a) > 0.04) | (rng3(dep) > 0.01)
             | (np.stack([rng3(c3[..., i]) for i in range(3)], -1).max(-1)
                > 0.08))
        from scipy.ndimage import maximum_filter
        mask = maximum_filter(m.astype(np.float32), 3) > 0.5
    except ImportError:
        mask = None

    res = dict(
        dataset=dataset, skipmode=skipmode, image=f"{width}x{height}",
        n_slabs=n_slabs, perpix_frame_ms=round(pp_ms, 2),
        prod_vs_oracle=stats(got, ref),
        perpix_vs_oracle=stats(perpix, ref),
        prod_vs_perpix=stats(got, perpix),
        perpix_at_prod_bad=stats(perpix, ref, bad_prod),
        n_bad_prod=int(bad_prod.sum()), n_bad_perpix=int(bad_pp.sum()),
    )
    if mask is not None:
        nty, ntx = height // 8, width // 128
        tmask = mask.reshape(nty, 8, ntx, 128).any((1, 3))
        res.update(
            suspect_px=int(mask.sum()),
            suspect_tiles=int(tmask.sum()), total_tiles=nty * ntx,
            bad_prod_in_mask=int((bad_prod & mask).sum()),
            bad_prod_outside_mask=int((bad_prod & ~mask).sum()),
        )
    res["wall_s"] = round(time.time() - t0, 1)
    np.savez(f"/tmp/probe_{dataset}_{skipmode}.npz", got=got, ref=ref,
             perpix=perpix)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
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
