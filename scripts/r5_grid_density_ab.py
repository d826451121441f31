#!/usr/bin/env python3
"""Round-5 A/B: production-frame parity vs the oracle as a function of the
LATERAL w-grid density (VERDICT r4 next-round #1).

The gradient-TF parity residual (present-grad 8.78 % of pixels >8/255 at
the r5 default) is anisotropic: the production image loses ~42 % of the
oracle's high-frequency energy along image y but only ~10 % along x
(uniform_filter1d study on /tmp/parity_present-grad_2.npz). The y chain is
volume→grid (1-texel tent, same as the reference's trilinear v-term) THEN
grid→pixel (pass-B bilinear at grid pitch ≈ 1 px): re-approximating the
piecewise-linear texel reconstruction with knots at grid pitch. Error is
O(pitch²) ⇒ densifying the grid should collapse the class. This script
measures it: renders the same frame at several grid densities (via
VKV_FOOTPRINT_Q → analyze_view's footprint quantile) against the oracle
image captured by scripts/tpu_parity.py (PARITY_SAVE_NPZ).

Usage: for q in 0.5 0.25 0.1; do VKV_FOOTPRINT_Q=$q python scripts/r5_grid_density_ab.py; done
Env: AB_DATASET/AB_SKIPMODE/AB_W/AB_H, AB_REF_NPZ, AB_OUT.
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
    dataset = os.environ.get("AB_DATASET", "present-grad")
    skipmode = int(os.environ.get("AB_SKIPMODE", "2"))
    width = int(os.environ.get("AB_W", "1920"))
    height = int(os.environ.get("AB_H", "1080"))
    out_path = os.environ.get("AB_OUT", "/tmp/grid_density_ab.json")
    npz = os.environ.get(
        "AB_REF_NPZ", f"/tmp/parity_{dataset}_{skipmode}.npz")
    q = os.environ.get("VKV_FOOTPRINT_Q", "0.5")

    ref = np.load(npz)["ref"]
    t0 = time.time()

    from vkvolume_tpu.bench.datasets import DATASETS, synthesize
    from vkvolume_tpu.bench.harness import benchmark_camera, make_engine

    vol = synthesize(DATASETS[dataset], seed=0, scale=1.0)
    eng, _, _, _ = make_engine(dataset, skipmode, 4, scale=1.0,
                               volume_u8=vol, renderer="pallas",
                               benchmark_mode=False)
    cam = benchmark_camera(aspect=width / height)
    out = eng.render(cam, width, height)
    got = np.asarray(out.color)
    plan = None
    for v in eng.volumes[0]._sweep_cache.values():
        if isinstance(v, dict) and "plan" in v:
            plan = v["plan"]
    n = 10
    t1 = time.time()
    for _ in range(n):
        out = eng.render(cam, width, height)
    out.color.block_until_ready()
    float(np.asarray(out.color.ravel()[0]))
    frame_ms = (time.time() - t1) * 1e3 / n

    d = np.abs(got - ref).max(-1)
    res = dict(
        q=float(q), renderer=eng.last_renderer,
        grid=None if plan is None else [plan.get("Hi"), plan.get("Wi")],
        pct_gt8=round(100.0 * float((d > 8 / 255).mean()), 5),
        mean=round(float(d.mean()), 6),
        frame_ms=round(frame_ms, 2),
        wall_s=round(time.time() - t0, 1),
    )
    existing = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            existing = json.load(fh)
    existing[f"{dataset}:{skipmode}:q{q}"] = res
    with open(out_path, "w") as fh:
        json.dump(existing, fh, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
