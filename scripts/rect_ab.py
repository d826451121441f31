#!/usr/bin/env python3
"""A/B the static headline pose across brick-rect plan classes.

The round-3 tail introduced wide brick rects (384/512) with an ESTIMATED
1.35x/cell cost factor (sweep_pallas._plan_cost) that was never
device-calibrated; round-4's first bench measured 53.4 ms/frame vs the
pre-wide-rect 18.6 ms — the plan class is the prime suspect. This script
measures the SAME pose under VKV_MAX_RECT in {512, 384, 256} (one
subprocess each: the knob is read at plan time) and prints one JSON line
per arm with the plan geometry actually chosen plus the measured ms.

Usage: python scripts/rect_ab.py            # all three arms
       RECT_ARMS=256,512 python scripts/rect_ab.py
Output also appended to docs/rect_ab_r4.json (one JSON line per arm).
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(rect):
    os.environ["VKV_MAX_RECT"] = str(rect)
    import numpy as np  # noqa: F401

    from vkvolume_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from vkvolume_tpu.bench.datasets import DATASETS, synthesize
    from vkvolume_tpu.bench.harness import benchmark_camera, make_engine
    from vkvolume_tpu.options import Test

    t0 = time.time()
    vol = synthesize(DATASETS["beetle"], seed=0, scale=1.0)
    eng, stats, _, _ = make_engine(
        "beetle", 2, 4, scale=1.0, volume_u8=vol,
        renderer="pallas", test=Test.NONE, ert=True)
    cam = benchmark_camera(aspect=1920 / 1080)

    def sync(o):
        o.color.block_until_ready()
        float(o.color.ravel()[0])

    out = eng.render(cam, 1920, 1080)
    sync(out)
    # plan introspection: the pose cache holds the chosen plan
    v = eng.volumes[0]
    plan = None
    for k, pose in getattr(v, "_sweep_cache", {}).items():
        if isinstance(k, tuple) and k and k[0] == "pose" \
                and isinstance(pose, dict) and pose.get("plan"):
            plan = pose["plan"]
    geom = None
    if plan:
        geom = {f: plan.get(f) for f in
                ("Hi", "Wi", "rect_w", "R_brick", "tile_h", "span_blks",
                 "R_sweep", "R_warp", "warp_xla", "warp_variant")}
    reps = []
    for _ in range(3):
        t = time.perf_counter()
        for _ in range(10):
            out = eng.render(cam, 1920, 1080)
        sync(out)
        reps.append((time.perf_counter() - t) / 10 * 1e3)
    reps_s = sorted(reps)
    med = reps_s[len(reps_s) // 2]
    rec = {"arm": rect, "frame_ms": round(med, 2),
           "rep_ms": [round(r, 2) for r in reps],
           "map_update_ms": round(stats.map_update_ms or 0, 2),
           "renderer": dict(eng.renderer_counts),
           "plan": geom, "wall_s": round(time.time() - t0, 1)}
    print("RECT_AB " + json.dumps(rec), flush=True)


def main():
    arms = [int(a) for a in
            os.environ.get("RECT_ARMS", "512,384,256").split(",")]
    out_path = os.path.join(REPO, "docs", "rect_ab_r4.json")
    for rect in arms:
        env = dict(os.environ, VKV_MAX_RECT=str(rect),
                   PYTHONPATH=f"{REPO}:/root/.axon_site")
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(rect)], env=env, cwd=REPO, capture_output=True, text=True,
            timeout=1800)
        line = [l for l in p.stdout.splitlines()
                if l.startswith("RECT_AB ")]
        if line:
            rec = line[-1][len("RECT_AB "):]
            print(rec, flush=True)
            with open(out_path, "a") as fh:
                fh.write(rec + "\n")
        else:
            err = (p.stderr or "")[-2000:]
            print(json.dumps({"arm": rect, "error": p.returncode,
                              "tail": err}), flush=True)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker(int(sys.argv[-1]))
    else:
        main()
