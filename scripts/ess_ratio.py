#!/usr/bin/env python3
"""Per-stage breakdown of skipmode 0 (none) vs 2 (distance) on the CSV
protocol — explains the beetle dist/none ratio (ours 4.1x vs reference
8.3x, VERDICT round-3 item 9): is the "none" tier artificially fast
(different kernel class / fallback renderer) or is the dist tier
leap-limited?  Writes ESS_OUT (default docs/ess_ratio_r4.json):

    {config: {skipmode: {frame_ms, renderer_counts, stages:
        {plan_ms, sweep_ms, warp_ms, transport_ms}}}}

CSV protocol: 1200x1200, NumTextureSamples test output, ERT off,
fit-to-viewport (scripts/benchmark.py:38-64 of the reference).
Env: ESS_DATASETS (comma list, default beetle), ESS_SKIPMODES
(default 0,2,3), ESS_FRAMES (default 10), ESS_OUT, SCALE.
"""

import json
import os
import sys
import time


def main():
    out_path = os.environ.get("ESS_OUT", "docs/ess_ratio_r4.json")
    datasets = os.environ.get("ESS_DATASETS", "beetle").split(",")
    skipmodes = [int(s) for s in
                 os.environ.get("ESS_SKIPMODES", "0,2,3").split(",")]
    frames = int(os.environ.get("ESS_FRAMES", "10"))
    scale = float(os.environ.get("SCALE", "1.0"))

    import jax  # noqa: F401

    from vkvolume_tpu.utils import enable_compile_cache
    enable_compile_cache()
    print(f"devices: {jax.devices()}", file=sys.stderr)

    from vkvolume_tpu.bench.datasets import DATASETS, synthesize
    from vkvolume_tpu.bench.harness import (benchmark_camera, run_config,
                                            stage_breakdown)

    results = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            results = json.load(fh)

    for key in datasets:
        vol = synthesize(DATASETS[key], scale=scale)
        for sm in skipmodes:
            tag = f"{key}:{sm}"
            if tag in results:
                print(f"{tag}: already done", file=sys.stderr)
                continue
            t0 = time.time()
            r = run_config(key, sm, 4, width=1200, height=1200,
                           frames=frames, scale=scale, volume_u8=vol,
                           keep_engine=True)
            stages = None
            if r.engine is not None:
                stages = stage_breakdown(
                    r.engine, benchmark_camera(aspect=1.0), 1200, 1200)
            results[tag] = {
                "frame_ms": round(r.frame_ms, 3),
                "fps": round(r.framerate, 2),
                "update_ms": round(r.update, 3),
                "occupancy_pct": round(r.occupancy, 3),
                "rep_ms": list(r.rep_ms),
                "renderer_counts": r.renderer_counts,
                "stages": stages,
                "wall_s": round(time.time() - t0, 1),
            }
            with open(out_path, "w") as fh:
                json.dump(results, fh, indent=1)
            print(f"{tag}: {r.frame_ms:.1f} ms/frame stages={stages}",
                  file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
