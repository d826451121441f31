#!/usr/bin/env python3
"""Per-pose orbit cost split on device: host plan ms, device ms (solo
sync), and the forced tier's grid size — is the orbit gap envelope
over-sweep (device ∝ tier cells) or host/serial overhead?"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from vkvolume_tpu.utils import enable_compile_cache

enable_compile_cache()

import numpy as np

from vkvolume_tpu.bench.harness import (benchmark_camera,
                                        freeze_orbit_statics, make_engine)

W, H = 1920, 1080
vol_npy = os.environ.get(
    "VOL_NPY", "/root/repo/.cache/beetle_v5_s0_x1.0.npy")
eng, *_ = make_engine("beetle", 2, 4, scale=1.0,
                      volume_u8=np.load(vol_npy))
aspect = W / H
vol = eng.volumes[0]
cam_for = lambda i: benchmark_camera(aspect, azimuth=30.0 + 2.0 * i)

span = [cam_for(i) for i in np.arange(-0.5, 51.0, 0.5)]
freeze_orbit_statics(eng, vol, span, W, H)

# Warm every pose (compiles should hit the persistent cache from the
# orbit bench run).
for i in range(0, 50, 1):
    out = eng.render(cam_for(i), W, H)
    if i % 10 == 9:
        out.color.block_until_ready()
out.color.block_until_ready()
float(np.asarray(out.color.ravel()[0]))
print("warmed", eng.renderer_counts, flush=True)

rows = []
for i in list(range(0, 50, 4)):
    # Purge the pose cache so the pose is fresh (host plan included).
    c = vol._sweep_cache
    for k in [k for k in c if isinstance(k, tuple) and k[0] == "pose"]:
        del c[k]
    t0 = time.perf_counter()
    out = eng.render(cam_for(i), W, H)
    t_disp = (time.perf_counter() - t0) * 1e3
    out.color.block_until_ready()
    float(np.asarray(out.color.ravel()[0]))
    t_tot = (time.perf_counter() - t0) * 1e3
    pose = next(v for k, v in c.items()
                if isinstance(k, tuple) and k[0] == "pose")
    pl = pose.get("plan")
    cells = (pl["Hi"] * pl["Wi"] / 1e6) if pl else float("nan")
    rows.append((i, t_disp, t_tot, cells,
                 None if pl is None else (pl["Hi"], pl["Wi"],
                                          bool(pl.get("warp_xla")))))
    print(f"pose {i:2d}: dispatch {t_disp:6.1f} ms  total {t_tot:6.1f} ms"
          f"  grid {cells:5.2f} Mcells  {rows[-1][4]}", flush=True)

d = np.array([r[1] for r in rows])
t = np.array([r[2] for r in rows])
c = np.array([r[3] for r in rows])
print(f"\nmedian dispatch {np.median(d):.1f} ms, device-incl total "
      f"{np.median(t):.1f} ms, corr(cells, total-dispatch) "
      f"{np.corrcoef(c, t - d)[0, 1]:.2f}")
