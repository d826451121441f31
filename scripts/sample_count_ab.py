#!/usr/bin/env python3
"""Per-ray texture-sample parity: production brick sweep vs the
reference-exact marcher at the benchmark pose (the reference's own
NumTextureSamples diagnostic, volume_render.frag:323-335).

Quantifies WHERE the sweep over-marches relative to per-ray ESS: the
sweep's empty-space windows are computed per (tile, brick) — rays in a
tile share the union window — so tiles straddling occupancy boundaries
sample slabs a per-ray march would leap over. The resulting
sample-count ratio is the headroom estimate for VERDICT r4 item 3
(frame 17.8 -> <=16.7 ms is sweep-bound).

Env: AB_DATASET (beetle), AB_SKIPMODE (2), AB_SCALE (1.0), AB_W/H
(1920/1080), AB_OUT (docs/sample_ab_r5.json).
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
    from vkvolume_tpu.bench.harness import benchmark_camera, make_engine
    from vkvolume_tpu.options import Test

    dataset = os.environ.get("AB_DATASET", "beetle")
    skipmode = int(os.environ.get("AB_SKIPMODE", "2"))
    scale = float(os.environ.get("AB_SCALE", "1.0"))
    width = int(os.environ.get("AB_W", "1920"))
    height = int(os.environ.get("AB_H", "1080"))
    out_path = os.environ.get("AB_OUT", "docs/sample_ab_r5.json")

    results = {}
    cams = {}
    for renderer in ("pallas", "marcher"):
        t0 = time.time()
        eng, _, _, _ = make_engine(dataset, skipmode, 4, scale=scale,
                                   renderer=renderer, benchmark_mode=False,
                                   test=Test.NUM_TEXTURE_SAMPLES)
        # Benchmark protocol forces ERT off with the samples output
        # (src/volume_render.cpp:177-183).
        eng.options.early_ray_termination = False
        cam = benchmark_camera(aspect=width / height)
        out = eng.render(cam, width, height)
        col = np.asarray(out.color)
        # color = count / n_steps_max (volume_render.frag:324); recover
        # absolute counts for readability.
        d = eng.volumes[0].density.shape
        dim_max = max(d)
        sf = eng.volumes[0].options.sampling_factor
        n_steps_max = float(np.floor(np.ceil(dim_max * np.sqrt(3.0)) * sf))
        counts = col[..., 0] * n_steps_max
        covered = col[..., 3] > 0
        results[renderer] = dict(
            renderer_used=getattr(eng, "last_renderer", renderer),
            mean_per_covered=float(counts[covered].mean()),
            p50=float(np.percentile(counts[covered], 50)),
            p90=float(np.percentile(counts[covered], 90)),
            p99=float(np.percentile(counts[covered], 99)),
            total_msamples=float(counts.sum() / 1e6),
            covered_px=int(covered.sum()),
            wall_s=round(time.time() - t0, 1),
        )
        cams[renderer] = counts
        print(f"{renderer}: {results[renderer]}", flush=True)

    if "pallas" in cams and "marcher" in cams:
        p, m = cams["pallas"], cams["marcher"]
        both = (p > 0) & (m > 0)
        ratio = p[both] / np.maximum(m[both], 1.0)
        results["ratio"] = dict(
            total=float(p.sum() / max(m.sum(), 1.0)),
            p50=float(np.percentile(ratio, 50)),
            p90=float(np.percentile(ratio, 90)),
            p99=float(np.percentile(ratio, 99)),
        )
        print(f"ratio: {results['ratio']}", flush=True)
        np.savez("/tmp/sample_ab.npz", pallas=p, marcher=m)

    results["config"] = dict(dataset=dataset, skipmode=skipmode, scale=scale,
                             image=f"{width}x{height}", ert=False)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
