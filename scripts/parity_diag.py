#!/usr/bin/env python3
"""Classify Pallas-path parity errors vs the marcher oracle (CPU, small
scale): coverage disagreements (exact ray hits cube / grid says no, or
vice versa) vs content-edge interpolation errors (both covered, values
differ). Drives the fix choice for VERDICT item 3."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from vkvolume_tpu.bench.datasets import DATASETS, synthesize
from vkvolume_tpu.bench.harness import benchmark_camera, make_engine
from vkvolume_tpu.options import SkippingType, Test
from vkvolume_tpu.render import sweep as sweep_mod
from vkvolume_tpu.render import sweep_pallas as sp
from vkvolume_tpu.render.ray_setup import make_rays, make_uniforms

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
W, H = (512, 288)
DS = sys.argv[2] if len(sys.argv) > 2 else "beetle"

eng, stats, vol_u8, _ = make_engine(DS, 2, 4, scale=SCALE,
                                    renderer="marcher", benchmark_mode=False)
vol = eng.volumes[0]
cam = benchmark_camera(aspect=W / H)
t0 = time.time()
ref = np.asarray(eng.render(cam, W, H).color)
print(f"marcher: {time.time()-t0:.1f}s  alpha_mean={ref[...,3].mean():.4f}",
      flush=True)

# Pallas path via render_frame in interpret mode (the production kernel
# semantics minus Mosaic compilation).
u = make_uniforms(cam, vol.node_transform, vol.image_transform,
                  eng.options.clip_distance,
                  np.asarray(vol.effective_block_size_xyz, np.float32))
rays = make_rays(u, H, W)
tf = eng._tf(vol)
pvm = jnp.asarray((cam.proj.astype(np.float64) @ cam.view.astype(np.float64)
                   @ vol.model_matrix).astype(np.float32))
from vkvolume_tpu.render.plan import analyze_view

view = analyze_view(u, H, W)
p = view["p_axis"]
_shape_t = {2: vol.density.shape,
            1: (vol.density.shape[1], vol.density.shape[0],
                vol.density.shape[2]),
            0: (vol.density.shape[2], vol.density.shape[0],
                vol.density.shape[1])}[p]
_pl = sp.plan_from_stats(view, u, p, _shape_t, H, W)
print(f"plan: Hi={_pl['Hi']} Wi={_pl['Wi']} (grid area "
      f"{_pl['Hi']*_pl['Wi']/1e6:.2f} Mpx vs image {H*W/1e6:.2f})", flush=True)
vol_t = sweep_mod.transpose_for_axis(vol.density, p)
grad_t = (sweep_mod.transpose_for_axis(vol.gradient, p)
          if vol.gradient is not None else None)
occ_t = sweep_mod.transpose_for_axis(vol.dist_maps[0], p)
t0 = time.time()
# Engine-matched slab density (engine._slab_oversample): gradient TFs
# pay the reference's dim_max·sf step density, intensity TFs the
# plane-aligned Np·sf (docs/PERF.md round-4 quadrature section).
over = (max(vol_t.shape) / vol_t.shape[0]) if tf.use_gradient else 1.0
out = sp.render_frame(vol_t, occ_t, tf, rays, u, pvm,
                      grad_t if tf.use_gradient else None,
                      p_axis=p, ert=True, test=Test.NONE,
                      oversample=over, interpret=True, dist_leap=True)
got = np.asarray(out.color)
print(f"pallas-interpret: {time.time()-t0:.1f}s "
      f"alpha_mean={got[...,3].mean():.4f}", flush=True)

diff = np.abs(got - ref)
dmax = diff.max(-1)
bad = dmax > 8.0 / 255.0
ra, ga = ref[..., 3], got[..., 3]
cov_ref = ra > 1e-6
cov_got = ga > 1e-6
bleed_in = bad & ~cov_ref & cov_got    # oracle says empty, we say color
bleed_out = bad & cov_ref & ~cov_got
content = bad & cov_ref & cov_got
print(f"pixels: {bad.size}  bad(>8/255): {bad.sum()} "
      f"({100*bad.mean():.3f}%)  max={dmax.max():.4f}")
print(f"  bleed_in:  {bleed_in.sum()}  max={dmax[bleed_in].max() if bleed_in.any() else 0:.4f}")
print(f"  bleed_out: {bleed_out.sum()}  max={dmax[bleed_out].max() if bleed_out.any() else 0:.4f}")
print(f"  content:   {content.sum()}  max={dmax[content].max() if content.any() else 0:.4f}")
# where along alpha gradient?  |∇alpha| of the ORACLE at bad pixels
gy, gx = np.gradient(ra)
grad_mag = np.hypot(gy, gx)
print(f"  oracle |∇α| at bad px: median={np.median(grad_mag[bad]) if bad.any() else 0:.4f} "
      f"vs global median={np.median(grad_mag):.4f}")
# valid-ray mask correspondence
valid = np.asarray(rays.valid)
print(f"  bad px with invalid exact ray: {(bad & ~valid).sum()}")
# Distribution of bad-pixel diffs
if bad.any():
    q = np.quantile(dmax[bad], [0.5, 0.9, 0.99, 1.0])
    print(f"  bad diff quantiles 50/90/99/100: {np.round(q, 4)}")
    n32 = (dmax > 32 / 255.0).sum()
    print(f"  pixels >32/255: {n32} ({100*n32/bad.size:.4f}%)")
np.savez("/tmp/parity_diag.npz", ref=ref, got=got)
print("saved /tmp/parity_diag.npz")
