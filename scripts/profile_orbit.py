#!/usr/bin/env python3
"""Decompose the per-fresh-pose cost of an orbiting camera.

Static pose ~18.6 ms/frame; orbit reps measured 170-6300 ms/frame. This
script isolates where a fresh pose spends time:
  * host plan (make_uniforms + analyze_view + plan_from_stats)
  * per-pose device-scalar dispatches (gp / hcoef / pvm / uniform leaves)
  * jit dispatch + device execution
  * mid-run Mosaic compiles (spec-bucket misses)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from vkvolume_tpu.utils import enable_compile_cache
enable_compile_cache()

import jax

from vkvolume_tpu.bench.harness import (benchmark_camera, freeze_orbit_statics,
                                        make_engine)

W, H = 1920, 1080
FRAMES = 10
ORBIT = 2.0

eng, stats, vol_u8, _ = make_engine("beetle", 2, 4, scale=1.0)
aspect = W / H
vol = eng.volumes[0]


def cam_for(i):
    return benchmark_camera(aspect, azimuth=30.0 + ORBIT * i)


t0 = time.perf_counter()
span = [cam_for(i) for i in np.arange(-0.5, FRAMES * 5 + 1.0, 0.5)]
force = freeze_orbit_statics(eng, vol, span, W, H)
print(f"freeze: {time.perf_counter()-t0:.2f}s  groups={list(force)}",
      flush=True)

# Warm-up: render each timed pose ONCE (exact pose, so the spec bucket AND
# pose cache entries exist), then clear the pose cache so timed poses are
# cache-misses again.
t0 = time.perf_counter()
for i in range(FRAMES * 5):
    out = eng.render(cam_for(i), W, H)
    if i % 10 == 9:
        out.color.block_until_ready()
out.color.block_until_ready()
float(out.color.ravel()[0])
print(f"warm {FRAMES*5} poses: {time.perf_counter()-t0:.1f}s "
      f"counts={eng.renderer_counts}", flush=True)

# --- host-plan-only cost per fresh pose -------------------------------
from vkvolume_tpu.render import plan as plan_mod
from vkvolume_tpu.render import sweep_pallas as sp
from vkvolume_tpu.render.ray_setup import make_uniforms

cams = [cam_for(i + 0.25) for i in range(20)]
t0 = time.perf_counter()
us = [make_uniforms(c, vol.node_transform, vol.image_transform,
                    eng.options.clip_distance,
                    np.asarray(vol.effective_block_size_xyz, np.float32))
      for c in cams]
t_uni = (time.perf_counter() - t0) / len(cams) * 1e3
t0 = time.perf_counter()
views = [plan_mod.analyze_view(u, H, W) for u in us]
t_view = (time.perf_counter() - t0) / len(cams) * 1e3
d, h, w = vol.density.shape
shp = {2: (d, h, w), 1: (h, d, w), 0: (w, d, h)}
t0 = time.perf_counter()
plans = []
for u, v in zip(us, views):
    p = v["p_axis"]
    fs = eng.plan_force.get((p, 1.0 if v["sgn"] >= 0 else -1.0)) or [None]
    pl = None
    for f in fs:
        pl = sp.plan_from_stats(v, u, p, shp[p], H, W, force=f)
        if pl is not None:
            break
    plans.append(pl)
t_plan = (time.perf_counter() - t0) / len(cams) * 1e3
print(f"host: uniforms {t_uni:.2f} ms  analyze {t_view:.2f} ms  "
      f"plan {t_plan:.2f} ms  per pose", flush=True)

# Spec-key diversity over the timed poses (bucket misses = fresh compiles).
specs = set()
for u, v, pl in zip(us, views, plans):
    if pl is None:
        specs.add(("NONE",))
        continue
    specs.add((pl["Hi"], pl["Wi"], pl["R_sweep"], pl["R_warp"],
               pl.get("tile_h"), pl.get("R_brick"), pl.get("span_blks"),
               pl["RECT_A"], pl["RECT_B"], pl.get("warp_variant"),
               v["p_axis"], pl["sgn_p"]))
print(f"distinct specs over 20 fresh poses: {len(specs)}", flush=True)

# --- timed loops -------------------------------------------------------
def run_loop(tag, cam_fn, n=FRAMES, reps=3):
    res = []
    for r in range(reps):
        t0 = time.perf_counter()
        for i in range(n):
            out = eng.render(cam_fn(r * n + i), W, H)
        out.color.block_until_ready()
        float(out.color.ravel()[0])
        res.append((time.perf_counter() - t0) / n * 1e3)
    print(f"{tag}: {[round(x,1) for x in res]} ms/frame  "
          f"counts={eng.renderer_counts}", flush=True)
    return res

# static (pose cache hit after first)
run_loop("static", lambda i: cam_for(0))
# fresh poses, warmed buckets (render exact warmed poses again, but pose
# cache only holds 64 so early ones evicted -> true fresh-pose cost)
run_loop("orbit-warmed-poses", lambda i: cam_for(i))
# fresh poses NEVER seen (bucket should still be frozen-covered)
run_loop("orbit-novel-poses", lambda i: cam_for(i + 0.13))
print("done", flush=True)
