#!/usr/bin/env python3
"""Characterise the residual gradient-TF parity class and A/B a
grazing-gated suspect detector (CPU, interpret mode, small scale).

Round-5 state: after the precision/alignment fixes the present-grad
default path is ~0.84 % bad on device (docs/parity_r5.json) but the
edge-repair suspect detector flags ~92 % of covered pixels (shell
content makes EVERY pixel an alpha/color edge), so repair degenerates
to an oracle re-render. Hypothesis (docs/PERF.md round-4 note): the
residual class is grazing incidence — rays with small |dir_p| get an
effective per-ray step ds_slab/|dir_p| that no fixed slab density can
match. If bad pixels concentrate at small |dir_p|, the grad-TF suspect
mask can gate on it and shrink the repair march 10-100x.

Prints, for a threshold ladder: suspect %, bad-pixel catch rate, and
the residual bad % after a hypothetical exact repair of the suspects.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
over = base_over * float(eng.options.grad_density_mult)

t0 = time.time()
out = sp.render_frame(vol_t, occ_t, tf, rays, u, pvm,
                      grad_t if tf.use_gradient else None,
                      p_axis=p, ert=True, test=Test.NONE,
                      oversample=over, interpret=True, dist_leap=True)
got = np.asarray(out.color)
dep = np.asarray(out.depth)
print(f"sweep (mult={eng.options.grad_density_mult}): "
      f"{time.time()-t0:.0f}s", flush=True)

diff = np.abs(got - ref)
bad = diff.max(-1) > 8.0 / 255.0
covered = (ref[..., 3] > 0) | (got[..., 3] > 0)
n_cov = covered.sum()
print(f"covered={n_cov} bad={bad.sum()} ({100*bad.sum()/n_cov:.3f}% of covered)")

# --- current detector (engine._edge_repair), replicated on host ---
from scipy.ndimage import grey_dilation, grey_erosion  # noqa: E402


def rng3(x):
    return (grey_dilation(x, size=(3, 3)) - grey_erosion(x, size=(3, 3)))


a = got[..., 3]
crng = np.stack([rng3(got[..., c]) for c in range(3)], -1).max(-1)
mask0 = (rng3(a) > 0.04) | (rng3(dep) > 0.01) | (crng > 0.08)
mask0 = grey_dilation(mask0.astype(np.float32), size=(3, 3)) > 0.5

# --- grazing measure ---
dp = np.abs(np.asarray(rays.ray_dir)[..., p])
dpb = dp[bad]
dpc = dp[covered]
print("|dir_p| quantiles  covered:",
      np.round(np.quantile(dpc, [0.05, 0.25, 0.5, 0.75, 0.95]), 3),
      " bad:", np.round(np.quantile(dpb, [0.05, 0.25, 0.5, 0.75, 0.95]), 3)
      if bad.sum() else "n/a", flush=True)


def report(name, m):
    catch = (m & bad).sum() / max(1, bad.sum())
    resid = (bad & ~m).sum() / max(1, n_cov)
    print(f"{name:28s} suspects={100*m.sum()/n_cov:6.2f}%cov "
          f"catch={100*catch:6.2f}% residual_bad={100*resid:.4f}%")


report("current (edges only)", mask0)
for thr in (0.3, 0.4, 0.5, 0.6, 0.7):
    gate = grey_dilation((dp < thr).astype(np.float32), size=(3, 3)) > 0.5
    report(f"edges & |dir_p|<{thr}", mask0 & gate)
# Amplitude floor: bad pixels need a visible diff — do tiny-alpha pixels
# ever go bad? (if not, an alpha floor can also shrink the set)
for thr in (0.4, 0.5, 0.6):
    gate = grey_dilation((dp < thr).astype(np.float32), size=(3, 3)) > 0.5
    report(f"|dir_p|<{thr} alone", gate & covered)
