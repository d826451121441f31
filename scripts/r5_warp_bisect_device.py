#!/usr/bin/env python3
"""Round-5: bisect the device two-pass warp divergence (r5_warp_isolate
showed prod-warp 8.78 % vs XLA-warp 0.85 % on the SAME grid image, while
every piece is exact on CPU/interpret). Runs the REAL resample_rows kernel
on device over the captured full-scale inputs at several RECT widths and
compares against the float reference resample — isolating whether the
Mosaic-compiled kernel itself diverges, and at which rect class.

Env: WB_NPZ (/tmp/warpiso_present-grad_2.npz), WB_RECTS (1024,512).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vkvolume_tpu.utils import enable_compile_cache


def main():
    enable_compile_cache()
    import jax.numpy as jnp

    from vkvolume_tpu.bench.datasets import DATASETS, synthesize
    from vkvolume_tpu.bench.harness import benchmark_camera, make_engine
    from vkvolume_tpu.render import sweep_pallas as sp
    from vkvolume_tpu.render import warp_pallas as wp
    from vkvolume_tpu.render.ray_setup import make_uniforms

    D = np.load(os.environ.get("WB_NPZ", "/tmp/warpiso_present-grad_2.npz"))
    chans = D["chans"]
    C, Hi, Wi = chans.shape
    vol = synthesize(DATASETS["present-grad"], seed=0, scale=1.0)
    eng, _, _, _ = make_engine("present-grad", 2, 4, scale=1.0,
                               volume_u8=vol, renderer="pallas",
                               benchmark_mode=False)
    v = eng.volumes[0]
    cam = benchmark_camera(aspect=1920 / 1080)
    uni = make_uniforms(cam, v.node_transform, v.image_transform,
                        eng.options.clip_distance,
                        np.asarray(v.effective_block_size_xyz, np.float32))
    dsh = v.density.shape
    view, plan = sp.select_view_plan(
        uni, 1080, 1920,
        lambda q: {2: dsh, 1: (dsh[1], dsh[0], dsh[2]),
                   0: (dsh[2], dsh[0], dsh[1])}[q])
    W, H, Hp = 1920, 1080, 1152
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
    yb = np.where(ok, yb, -10.0).astype(np.float32)

    src = np.swapaxes(chans, 1, 2)                        # (C, Wi, Hi)
    enc = np.round(np.clip(src * 65535.0, 0, 65535)).astype(np.uint16)
    ref1 = np.asarray(wp._resample_rows_reference(
        jnp.asarray(src), jnp.asarray(yb)))
    ref1 = np.where(yb[None] > -5.0, ref1, 0.0)

    rects = [int(r) for r in os.environ.get(
        "WB_RECTS", "1024,512").split(",")]
    for RECT in rects:
        t0 = time.time()
        out = wp.resample_rows(jnp.asarray(enc), jnp.asarray(yb),
                               RECT=RECT, encode_out=True)
        k1 = np.asarray(out).astype(np.float32) / 65535.0
        d = np.abs(k1 - ref1)
        per_tile = d.max(0).reshape(Wi // 8, 8, Hp // 128, 128).max((1, 3))
        nbad = int((per_tile > 4 / 255).sum())
        print(f"RECT={RECT}: max={d.max():.5f} mean={d.mean():.7f} "
              f"pct>8/255={100.0 * float((d.max(0) > 8 / 255).mean()):.4f} "
              f"bad tiles {nbad}/{per_tile.size} wall={time.time()-t0:.0f}s",
              flush=True)
        if nbad:
            ys, xs = np.nonzero(per_tile > 4 / 255)
            print("  first bad tiles (row_blk, col_blk):",
                  list(zip(ys[:10].tolist(), xs[:10].tolist())), flush=True)
            np.save(f"/tmp/warp_bisect_per_tile_{RECT}.npy", per_tile)


if __name__ == "__main__":
    main()
