"""vkvolume_tpu — TPU-native accelerated volume renderer.

A ground-up JAX/XLA/Pallas re-design of the capabilities of LDeakin/VkVolume
(*Accelerated Volume Rendering with Chebyshev Distance Maps*, Deakin &
Knackstedt, SIGGRAPH Asia 2019): ray-casting with empty-space skipping via
occupancy / Chebyshev-distance maps, early ray termination, 2D
intensity×gradient transfer functions, camera-inside-volume and depth-buffer
clipping — with volumes and acceleration structures as HBM-resident arrays,
the acceleration pipeline as jitted scan/stencil passes, and the ray march as
masked lock-step XLA / Pallas kernels over ray tiles.
"""

__version__ = "0.1.0"

import jax as _jax

# TPU dot_general at DEFAULT precision truncates f32 inputs to bfloat16
# (~4e-3 relative error). Every camera projection in the frame path is a
# tiny (N,4)@(4,4) matmul, so bf16 buys nothing — but it bends ray
# directions by ~1e-3, which shifted warp positions by ±0.5 grid rows and
# broke pixel parity on sharp (gradient-TF) content: the two-pass warp's
# pass-1 positions come from the f64 HOST homography while gx/gy come from
# device rays, and the two sources must agree to sub-cell precision
# (measured round 5: present-grad 8.8 % of pixels >8/255 from exactly this
# mismatch). Force true-f32 matmuls package-wide; the hot compute path is
# hand-written Pallas (unaffected), so this costs nothing measurable.
_jax.config.update("jax_default_matmul_precision", "highest")
