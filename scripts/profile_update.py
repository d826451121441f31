#!/usr/bin/env python3
"""Profile the TF-edit map-update path stage by stage on the real TPU.

Stages (engine.update_transfer_function → build_maps):
  occupancy_map → isotropic_distance (= x-scan, y-relax, z-relax)
plus the anisotropic variant. Each stage timed with a forced host round
trip (block_until_ready lies on this transport — CLAUDE.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vkvolume_tpu.accel.distance import (anisotropic_distance, axis_scan,
                                         isotropic_distance, relax)
from vkvolume_tpu.accel.occupancy import occupancy_map
from vkvolume_tpu.bench.datasets import DATASETS, synthesize
from vkvolume_tpu.tf.transfer_function import tf_params


def timed(fn, *args, n=3, inner=20, **kw):
    """Median per-call ms over `inner` queued device executions per sync:
    the ~34 ms forced-sync transport cost (CLAUDE.md) amortises to ~1.7 ms.
    The device executes queued programs serially, so no data dependency is
    needed between the calls."""
    fn = jax.jit(fn)

    def sync(o):
        jax.block_until_ready(o)
        leaf = jax.tree_util.tree_leaves(o)[0]
        float(leaf.ravel()[0])  # one-scalar host round trip (forced sync)

    out = fn(*args, **kw)
    sync(out)
    ts = []
    for _i in range(n):
        t0 = time.perf_counter()
        for _j in range(inner):
            out = fn(*args, **kw)
        sync(out)
        ts.append((time.perf_counter() - t0) * 1e3 / inner)
    return float(np.median(ts)), out


def main():
    key = os.environ.get("DS", "beetle")
    b = int(os.environ.get("B", "4"))
    scale = float(os.environ.get("SCALE", "1.0"))
    ds = DATASETS[key]
    vol = jnp.asarray(synthesize(ds, scale=scale))
    print(f"{key} scale={scale} b={b} shape={vol.shape}", file=sys.stderr)
    tf = tf_params(intensity_min=ds.imin, intensity_max=ds.imax,
                   gradient_min=ds.gmin, gradient_max=ds.gmax)
    d, h, w = vol.shape
    ms = (-(-d // b), -(-h // b), -(-w // b))

    t_occ, occ = timed(lambda v: occupancy_map(v, None, tf, ms), vol)
    print(f"occupancy_map ({occ.shape}): {t_occ:.2f} ms")

    t_x, g = timed(lambda o: axis_scan(o, axis=2, direction=0), occ)
    print(f"x-scan: {t_x:.2f} ms")
    t_y, gy = timed(lambda a: relax(a, axis=1, direction=0), g)
    print(f"y-relax: {t_y:.2f} ms")
    t_z, gz = timed(lambda a: relax(a, axis=0, direction=0), gy)
    print(f"z-relax: {t_z:.2f} ms")
    print(f"max distance in final map: {int(jnp.max(gz))}")

    t_iso, _ = timed(isotropic_distance, occ)
    print(f"isotropic_distance total: {t_iso:.2f} ms")
    if os.environ.get("ANISO", "0") == "1":
        t_aniso, _ = timed(anisotropic_distance, occ, n=3)
        print(f"anisotropic_distance total: {t_aniso:.2f} ms")




def profile_pallas():
    """Append-mode entry: compare Pallas DT vs XLA DT on the same map."""
    key = os.environ.get("DS", "beetle")
    b = int(os.environ.get("B", "4"))
    scale = float(os.environ.get("SCALE", "1.0"))
    ds = DATASETS[key]
    vol = jnp.asarray(synthesize(ds, scale=scale))
    tf = tf_params(intensity_min=ds.imin, intensity_max=ds.imax,
                   gradient_min=ds.gmin, gradient_max=ds.gmax)
    d, h, w = vol.shape
    ms = (-(-d // b), -(-h // b), -(-w // b))
    occ = occupancy_map(vol, None, tf, ms)
    occ.block_until_ready()

    from vkvolume_tpu.accel.distance_pallas import (
        anisotropic_distance_pallas, isotropic_distance_pallas)

    t, out_p = timed(isotropic_distance_pallas, occ)
    print(f"isotropic_distance_pallas: {t:.2f} ms")
    out_x = isotropic_distance(occ)
    eq = bool(jnp.all(out_p == out_x))
    print(f"iso pallas == xla: {eq}")
    t, a_p = timed(anisotropic_distance_pallas, occ, n=3, inner=5)
    print(f"anisotropic_distance_pallas: {t:.2f} ms")
    a_x = anisotropic_distance(occ)
    print(f"aniso pallas == xla: {bool(jnp.all(a_p == a_x))}")


if os.environ.get("PALLAS_ONLY") == "1":
    main = profile_pallas


if __name__ == "__main__":
    main()
