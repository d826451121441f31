#!/usr/bin/env python3
"""Parity-vs-slab-density convergence curve for a gradient-TF config (CPU,
interpret mode, small scale): measures bad-pixel %, alpha deficit, and the
compositing cost factor at oversample multipliers over the engine's "ref"
density. Drives the round-5 gradient-TF parity fix (VERDICT r4 item 1)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from vkvolume_tpu.bench.harness import benchmark_camera, make_engine
from vkvolume_tpu.options import Test
from vkvolume_tpu.render import sweep as sweep_mod
from vkvolume_tpu.render import sweep_pallas as sp
from vkvolume_tpu.render.plan import analyze_view
from vkvolume_tpu.render.ray_setup import make_rays, make_uniforms

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
DS = sys.argv[2] if len(sys.argv) > 2 else "present-grad"
MULTS = [float(x) for x in (sys.argv[3].split(",") if len(sys.argv) > 3
                            else ("1,1.5,2,3",))]
W, H = (512, 288)

eng, stats, vol_u8, _ = make_engine(DS, 2, 4, scale=SCALE,
                                    renderer="marcher", benchmark_mode=False)
vol = eng.volumes[0]
cam = benchmark_camera(aspect=W / H)
t0 = time.time()
ref = np.asarray(eng.render(cam, W, H).color)
print(f"marcher: {time.time()-t0:.1f}s alpha_mean={ref[...,3].mean():.5f}",
      flush=True)

u = make_uniforms(cam, vol.node_transform, vol.image_transform,
                  eng.options.clip_distance,
                  np.asarray(vol.effective_block_size_xyz, np.float32))
rays = make_rays(u, H, W)
tf = eng._tf(vol)
pvm = jnp.asarray((cam.proj.astype(np.float64) @ cam.view.astype(np.float64)
                   @ vol.model_matrix).astype(np.float32))
view = analyze_view(u, H, W)
p = view["p_axis"]
vol_t = sweep_mod.transpose_for_axis(vol.density, p)
grad_t = (sweep_mod.transpose_for_axis(vol.gradient, p)
          if vol.gradient is not None else None)
occ_t = sweep_mod.transpose_for_axis(vol.dist_maps[0], p)
base_over = (max(vol_t.shape) / vol_t.shape[0]) if tf.use_gradient else 1.0
for mult in MULTS:
    over = base_over * mult
    t0 = time.time()
    out = sp.render_frame(vol_t, occ_t, tf, rays, u, pvm,
                          grad_t if tf.use_gradient else None,
                          p_axis=p, ert=True, test=Test.NONE,
                          oversample=over, interpret=True, dist_leap=True)
    got = np.asarray(out.color)
    dt = time.time() - t0
    diff = np.abs(got - ref)
    bad = diff.max(-1) > 8.0 / 255.0
    print(f"mult={mult:.2f} over={over:.3f} n_slabs={round(vol_t.shape[0]*over)} "
          f"bad={100*bad.mean():.3f}% max={diff.max():.4f} "
          f"alpha_got={got[...,3].mean():.5f} wall={dt:.0f}s", flush=True)
