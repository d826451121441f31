#!/usr/bin/env python3
"""Discriminate the full-scale gradient-TF parity gap: w-grid+warp
resampling vs slab quadrature.

Renders one full-scale frame per renderer — "sweep" (per-pixel XLA plane
sweep: same slab quadrature as the pallas path, NO w-grid warp) and
"pallas" (production brick sweep + projective warp) — against the
reference-exact marcher oracle. If the XLA sweep is clean and the pallas
frame is not, the gap lives in the grid/warp resampling
(render/warp_pallas.py taps / render/plan.py grid density); if both are
dirty, it is quadrature (slab density/phase).

Env: WQ_DATASET (present-grad), WQ_SKIPMODE (2), WQ_SCALE (1.0),
WQ_W/H (1920/1080), WQ_RENDERERS (sweep,pallas), WQ_OUT
(docs/warp_vs_quadrature_r5.json).
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
    from vkvolume_tpu.bench.datasets import DATASETS, synthesize
    from vkvolume_tpu.bench.harness import benchmark_camera, make_engine

    dataset = os.environ.get("WQ_DATASET", "present-grad")
    skipmode = int(os.environ.get("WQ_SKIPMODE", "2"))
    scale = float(os.environ.get("WQ_SCALE", "1.0"))
    width = int(os.environ.get("WQ_W", "1920"))
    height = int(os.environ.get("WQ_H", "1080"))
    renderers = os.environ.get("WQ_RENDERERS", "sweep,pallas").split(",")
    out_path = os.environ.get("WQ_OUT", "docs/warp_vs_quadrature_r5.json")

    vol = synthesize(DATASETS[dataset], scale=scale)
    cam = benchmark_camera(aspect=width / height)

    def render(renderer):
        t0 = time.time()
        eng, _, _, _ = make_engine(dataset, skipmode, 4, scale=scale,
                                   volume_u8=vol, renderer=renderer,
                                   benchmark_mode=False)
        out = eng.render(cam, width, height)
        col = np.asarray(out.color)
        print(f"{renderer}: used={eng.last_renderer} "
              f"wall={time.time()-t0:.0f}s", flush=True)
        return col, eng.last_renderer

    results = {}
    ref, _ = render("marcher")
    np.save("/tmp/wq_ref.npy", ref)
    cov = ref[..., 3] > 1e-6
    for r in renderers:
        got, used = render(r)
        np.save(f"/tmp/wq_{r}.npy", got)
        d = np.abs(got - ref)
        bad = d.max(-1) > 8.0 / 255.0
        results[r] = dict(
            renderer_used=used,
            pct_all=round(100.0 * float(bad.mean()), 4),
            pct_covered=round(100.0 * float(bad[cov].mean()), 4),
            max_abs=round(float(d.max()), 4),
            mean_abs=round(float(d.mean()), 6),
            alpha_mean_got=round(float(got[..., 3].mean()), 5),
        )
        print(f"{r}: {results[r]}", flush=True)
    results["config"] = dict(dataset=dataset, skipmode=skipmode, scale=scale,
                             image=f"{width}x{height}",
                             alpha_mean_ref=round(float(ref[..., 3].mean()), 5))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
