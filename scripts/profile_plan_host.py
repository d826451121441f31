#!/usr/bin/env python3
"""cProfile the host planning path (analyze_view / plan_from_stats /
two_pass_warp_plan) for novel orbit poses — CPU only, no device work.
This is the per-frame serial host cost that bounds the free-camera orbit
rate (the device render itself pipelines behind it)."""
import cProfile
import io
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from vkvolume_tpu.bench.harness import benchmark_camera, make_engine

W, H = 1920, 1080
# Small volume is fine: planning cost scales with the IMAGE grid, not the
# volume; but use full-scale beetle dims via a zeros volume to be faithful.
vol_u8 = np.zeros((995, 1024, 337), np.uint8)
vol_u8[100:-100, 100:-100, 50:-50] = 80
eng, *_ = make_engine("beetle", 2, 4, scale=1.0, volume_u8=vol_u8)
aspect = W / H
vol = eng.volumes[0]

from vkvolume_tpu.render import plan as plan_mod
from vkvolume_tpu.render import sweep_pallas as sp
from vkvolume_tpu.render.ray_setup import make_uniforms


def vol_t_shape(p):
    d, h, w = vol.density.shape
    return {2: (d, h, w), 1: (h, d, w), 0: (w, d, h)}[p]


def plan_pose(az):
    cam = benchmark_camera(aspect, azimuth=az)
    u = make_uniforms(cam, vol.node_transform, vol.image_transform,
                      eng.options.clip_distance,
                      np.asarray(vol.effective_block_size_xyz, np.float32))
    view, plan = sp.select_view_plan(u, H, W, vol_t_shape)
    if view is None or plan is None:
        return None
    p = view["p_axis"]
    tp = plan_mod.two_pass_warp_plan(u, p, H, W, plan, view)
    return plan, tp


# Warm numpy/jax import paths
plan_pose(30.0)

azs = [30.0 + 2.0 * i + 0.13 for i in range(25)]
t0 = time.perf_counter()
for az in azs:
    plan_pose(az)
dt = (time.perf_counter() - t0) * 1e3 / len(azs)
print(f"mean plan cost: {dt:.1f} ms/pose over {len(azs)} poses")

pr = cProfile.Profile()
pr.enable()
for az in azs:
    plan_pose(az)
pr.disable()
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(28)
print(s.getvalue())
