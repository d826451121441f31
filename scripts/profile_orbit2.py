#!/usr/bin/env python3
"""Instrument one novel-pose render end to end: which phase costs seconds?"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from vkvolume_tpu.utils import enable_compile_cache
enable_compile_cache()

from vkvolume_tpu.bench.harness import (benchmark_camera, freeze_orbit_statics,
                                        make_engine)

import os

W, H = 1920, 1080
# VOL_NPY: profile against a specific cached volume (the per-pose host cost
# is content-independent; this avoids triggering a fresh full-scale synth).
_npy = os.environ.get("VOL_NPY")
eng, *_ = make_engine("beetle", 2, 4, scale=1.0,
                      volume_u8=np.load(_npy) if _npy else None)
aspect = W / H
vol = eng.volumes[0]
cam_for = lambda i: benchmark_camera(aspect, azimuth=30.0 + 2.0 * i)

span = [cam_for(i) for i in np.arange(-0.5, 51.0, 0.5)]
force = freeze_orbit_statics(eng, vol, span, W, H)
print("groups:", {k: [{kk: t[kk] for kk in ("Hi", "Wi", "R_brick", "RECT_A",
                                            "RECT_B", "warp_variant")}
                       for t in tiers]
                  for k, tiers in force.items()}, flush=True)

# Warm two bucket representatives.
for i in (0, 25):
    out = eng.render(cam_for(i), W, H)
out.color.block_until_ready()
float(out.color.ravel()[0])
print("warmed", eng.renderer_counts, flush=True)

from vkvolume_tpu.render import plan as plan_mod
from vkvolume_tpu.render import sweep_pallas as sp

orig_analyze = plan_mod.analyze_view
orig_plan = sp.plan_from_stats
orig_frame = sp._frame_jit
orig_tp = plan_mod.two_pass_warp_plan


def wrap(name, fn):
    def inner(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        dt = (time.perf_counter() - t0) * 1e3
        if dt > 1.0:
            print(f"  {name}: {dt:.1f} ms", flush=True)
        return r
    return inner

plan_mod.analyze_view = wrap("analyze_view", orig_analyze)
sp.plan_from_stats = wrap("plan_from_stats", orig_plan)
sp._frame_jit = wrap("_frame_jit(call)", orig_frame)
plan_mod.two_pass_warp_plan = wrap("two_pass_warp_plan", orig_tp)

for nudge in (0.13, 1.13, 2.13, 25.13, 26.13):
    t0 = time.perf_counter()
    out = eng.render(cam_for(nudge), W, H)
    t_disp = (time.perf_counter() - t0) * 1e3
    out.color.block_until_ready()
    float(out.color.ravel()[0])
    t_tot = (time.perf_counter() - t0) * 1e3
    pose = vol._sweep_cache
    print(f"pose {nudge}: dispatch {t_disp:.0f} ms total {t_tot:.0f} ms "
          f"counts={eng.renderer_counts}", flush=True)
print("cache sizes: frame", orig_frame._cache_size(), flush=True)
