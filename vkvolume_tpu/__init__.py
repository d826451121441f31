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
