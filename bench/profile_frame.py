#!/usr/bin/env python3
"""Per-stage profile of the production frame at the headline config.

Times each stage with a forced host round trip (block_until_ready lies on
this transport — CLAUDE.md). Run: python bench/profile_frame.py [scale]
"""
import os
import sys
import time

import numpy as np


def sync(x):
    """Force device completion with a ONE-element host fetch (np.asarray
    would drag the whole array through the ~30 MB/s tunnel and dominate
    every measurement)."""
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(x)
    arr = x
    while isinstance(arr, (tuple, list)):
        arr = arr[0]
    float(jnp.ravel(arr)[0])


def timeit(fn, n=5):
    fn()  # warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    width, height = 1920, 1080

    import jax
    import jax.numpy as jnp

    from vkvolume_tpu.bench.datasets import DATASETS, synthesize
    from vkvolume_tpu.bench.harness import benchmark_camera
    from vkvolume_tpu.engine import Engine, RenderOptions, from_array
    from vkvolume_tpu.options import SkippingType, Test, VolumeOptions
    from vkvolume_tpu.render import make_rays, make_uniforms
    from vkvolume_tpu.render import sweep as sweep_mod
    from vkvolume_tpu.render import sweep_pallas as sp
    from vkvolume_tpu.render.frustum import rays_from_dirs

    ds = DATASETS[os.environ.get("BENCH_DATASET", "beetle")]
    volume_u8 = synthesize(ds, scale=scale)
    opts = VolumeOptions(intensity_min=ds.imin, intensity_max=ds.imax,
                         gradient_min=ds.gmin, gradient_max=ds.gmax)
    eng = Engine(RenderOptions(skipping_type=SkippingType.DISTANCE),
                 renderer="pallas")
    vol = from_array(volume_u8, opts, block_size=4, name=ds.filename)
    d, h, w = volume_u8.shape
    vol.set_scale((100.0 / max(d, h, w),) * 3)
    eng.add_volume(vol)
    cam = benchmark_camera(aspect=width / height)

    # End-to-end first (fills caches).
    out = eng.render(cam, width, height)
    sync(out.color)
    t_frame = timeit(lambda: sync(eng.render(cam, width, height).color))
    print(f"engine.render end-to-end:  {t_frame:9.1f} ms")

    uniforms = make_uniforms(cam, vol.node_transform, vol.image_transform,
                             eng.options.clip_distance,
                             np.asarray(vol.effective_block_size_xyz,
                                        np.float32))
    t_rays = timeit(lambda: sync(make_rays(uniforms, height, width).ray_dir))
    print(f"make_rays (jit+sync):      {t_rays:9.1f} ms")

    rays = make_rays(uniforms, height, width)
    t_pax = timeit(lambda: sweep_mod.principal_axis(rays))
    print(f"principal_axis (host xfer):{t_pax:9.1f} ms")
    t_mix = timeit(lambda: sweep_mod.mixed_principal_signs(rays, 2))
    print(f"mixed_signs (host xfer):   {t_mix:9.1f} ms")

    p = sweep_mod.principal_axis(rays)
    t_stats = timeit(lambda: sync(sp._plan_stats_jit(rays, p)))
    print(f"plan stats (jit+sync):     {t_stats:9.1f} ms")

    vol_t, _ = vol._sweep_cache[p]
    occ_key = [k for k in vol._sweep_cache if isinstance(k, tuple)
               and k[0] == "occ"]
    occ_t = vol._sweep_cache[occ_key[0]]
    plan = sp.plan_frame(uniforms, rays, p, vol_t.shape, height, width)
    print(f"plan: {plan}")
    tf = eng._tf(vol)
    pvm = jnp.asarray(
        (cam.proj.astype(np.float64) @ cam.view.astype(np.float64)
         @ vol.model_matrix).astype(np.float32))
    n_slabs = vol_t.shape[0]

    gp = jnp.asarray([plan["wu0"], plan["dwu"], plan.get("cu", 0.0),
                      plan["wv0"], plan["dwv"], plan.get("cv", 0.0)],
                     jnp.float32)
    kw = dict(p_axis=p, Hi=plan["Hi"], Wi=plan["Wi"],
              R_sweep=plan["R_sweep"], R_warp=plan["R_warp"], ert=True,
              test=Test.NONE, n_slabs=n_slabs, sgn_p=plan["sgn_p"],
              dist_leap=True)
    t_fj = timeit(lambda: sync(sp._frame_jit(
        vol_t, occ_t, tf, rays, uniforms, pvm, gp, None, **kw).color))
    print(f"_frame_jit (sweep+warp):   {t_fj:9.1f} ms")

    # Sweep kernel alone on the grid rays.
    f = jnp.float32
    Hi, Wi = plan["Hi"], plan["Wi"]
    v_ax, u_ax = sweep_mod._SLICE_AXES[p]
    gyi = jax.lax.broadcasted_iota(f, (Hi, Wi), 0)
    gxi = jax.lax.broadcasted_iota(f, (Hi, Wi), 1)
    wu_g = sp._mob_fwd(plan["wu0"], plan["dwu"], plan.get("cu", 0.0),
                       gxi + 0.5)
    wv_g = sp._mob_fwd(plan["wv0"], plan["dwv"], plan.get("cv", 0.0),
                       gyi + 0.5)
    dir_xyz = [None, None, None]
    dir_xyz[p] = jnp.full((Hi, Wi), f(plan["sgn_p"]))
    dir_xyz[u_ax] = wu_g * f(plan["sgn_p"])
    dir_xyz[v_ax] = wv_g * f(plan["sgn_p"])
    dirs = jnp.stack(dir_xyz, -1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_g = rays_from_dirs(uniforms, dirs)
    rays_g = jax.tree.map(lambda x: jax.block_until_ready(x), rays_g)

    def sweep_only(separable=True, leap=True):
        return sp._sweep_pallas_jit(
            vol_t, occ_t, tf, rays_g, uniforms, pvm, None,
            p_axis=p, R=plan["R_sweep"], ert=True, test=Test.NONE,
            count_samples=False, n_slabs=n_slabs,
            separable=separable, dist_leap=leap)

    t_sw = timeit(lambda: sync(sweep_only().color))
    print(f"sweep kernel (sep,leap):   {t_sw:9.1f} ms   grid {Hi}x{Wi}")
    t_sw_nl = timeit(lambda: sync(sweep_only(leap=False).color))
    print(f"sweep kernel (sep,occ):    {t_sw_nl:9.1f} ms")
    t_sw_gen = timeit(lambda: sync(sweep_only(separable=False).color))
    print(f"sweep kernel (gen,leap):   {t_sw_gen:9.1f} ms")

    # Warp alone.
    from vkvolume_tpu.render import warp_pallas

    grid_out = sweep_only()
    chans = jnp.stack([grid_out.color[..., 0], grid_out.color[..., 3],
                       grid_out.depth])
    chans = jax.block_until_ready(chans)
    d_ = rays.ray_dir
    d_p = d_[..., p]
    okp = jnp.abs(d_p) > 1e-6
    safe = jnp.where(okp, d_p, 1.0)
    gx = sp._mob_inv(plan["wu0"], plan["dwu"], plan.get("cu", 0.0),
                     d_[..., u_ax] / safe) - 0.5
    gy = sp._mob_inv(plan["wv0"], plan["dwv"], plan.get("cv", 0.0),
                     d_[..., v_ax] / safe) - 0.5
    pix_ok = rays.valid & okp
    gx = jnp.where(pix_ok, gx, -10.0)
    gy = jnp.where(pix_ok, gy, -10.0)
    gx, gy = jax.block_until_ready((gx, gy))
    t_warp = timeit(lambda: sync(
        warp_pallas.warp_to_pixels(chans, gx, gy, R=plan["R_warp"])))
    print(f"warp kernel (R={plan['R_warp']:3d}):      {t_warp:9.1f} ms")


if __name__ == "__main__":
    main()
