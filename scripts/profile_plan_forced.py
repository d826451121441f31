#!/usr/bin/env python3
"""Measure the per-pose host planning cost of the frozen-tier fast path
(select_view_plan_forced) vs the full unforced search — CPU only."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from vkvolume_tpu.bench.harness import (benchmark_camera,
                                        freeze_orbit_statics, make_engine)

W, H = 1920, 1080
vol_u8 = np.zeros((995, 1024, 337), np.uint8)
vol_u8[100:-100, 100:-100, 50:-50] = 80
eng, *_ = make_engine("beetle", 2, 4, scale=1.0, volume_u8=vol_u8)
aspect = W / H
vol = eng.volumes[0]

from vkvolume_tpu.render import sweep_pallas as sp
from vkvolume_tpu.render.ray_setup import make_uniforms


def vol_t_shape(p):
    d, h, w = vol.density.shape
    return {2: (d, h, w), 1: (h, d, w), 0: (w, d, h)}[p]


cam_for = lambda a: benchmark_camera(aspect, azimuth=a)
span = [cam_for(30.0 + 2.0 * i) for i in np.arange(-0.5, 51.0, 0.5)]
t0 = time.perf_counter()
force = freeze_orbit_statics(eng, vol, span, W, H)
print(f"freeze: {(time.perf_counter()-t0)*1e3:.0f} ms, groups "
      f"{[(k, len(v)) for k, v in force.items()]}")


def u_for(az):
    return make_uniforms(cam_for(az), vol.node_transform,
                         vol.image_transform, eng.options.clip_distance,
                         np.asarray(vol.effective_block_size_xyz,
                                    np.float32))


azs = [30.0 + 2.0 * i + 0.13 for i in range(25)]
us = [u_for(az) for az in azs]

# Warm
sp.select_view_plan_forced(us[0], H, W, vol_t_shape, force)

t0 = time.perf_counter()
res = [sp.select_view_plan_forced(u, H, W, vol_t_shape, force) for u in us]
dt_f = (time.perf_counter() - t0) * 1e3 / len(us)
n_ok = sum(1 for v, p in res if p is not None)
n_xla = sum(1 for v, p in res if p is not None and p.get("warp_xla"))
print(f"forced path: {dt_f:.1f} ms/pose  (plans {n_ok}/{len(us)}, "
      f"xla {n_xla})")

t0 = time.perf_counter()
res_u = [sp.select_view_plan(u, H, W, vol_t_shape) for u in us]
dt_u = (time.perf_counter() - t0) * 1e3 / len(us)
print(f"unforced path: {dt_u:.1f} ms/pose")

# Sanity: forced plans' grid areas vs the unforced choice
for i in (0, 7, 12, 24):
    vf, pf = res[i]
    vu, pu = res_u[i]
    fmt = lambda p: (None if p is None else
                     (p["Hi"], p["Wi"], p.get("R_brick"),
                      bool(p.get("warp_xla"))))
    print(f"  pose {azs[i]:.2f}: forced {fmt(pf)} unforced {fmt(pu)}")
