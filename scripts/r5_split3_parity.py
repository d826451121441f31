#!/usr/bin/env python3
"""On-device full-frame parity spot-check: split3 tent dot vs HIGHEST at
the benchmark pose (beetle, skipmode 2, 1920x1080, full scale). The CPU
bound (tests/test_sweep.py::test_brick_tent_precision_knob) says the
split residual is ~0.0002 u8 LSB; this confirms the MOSAIC lowering of
the three DEFAULT-precision bf16 passes agrees before any bench default
flips. Writes /tmp/r5_split3_parity.json."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vkvolume_tpu.utils import enable_compile_cache


def main():
    enable_compile_cache()
    from vkvolume_tpu.bench.harness import benchmark_camera, make_engine

    res = {}
    imgs = {}
    for prec in ("highest", "split3"):
        os.environ["VKV_TENT_PRECISION"] = prec
        t0 = time.time()
        eng, _, _, _ = make_engine("beetle", 2, 4, scale=1.0,
                                   renderer="pallas", benchmark_mode=False)
        out = eng.render(benchmark_camera(aspect=1920 / 1080), 1920, 1080)
        img = np.asarray(out.color)
        float(out.color.ravel()[0])          # force host round trip
        imgs[prec] = img
        res[prec + "_wall_s"] = round(time.time() - t0, 1)
        res[prec + "_renderer"] = eng.last_renderer
        print(prec, "rendered", res[prec + "_wall_s"], "s", flush=True)
    d = np.abs(imgs["split3"] - imgs["highest"])
    res["max_abs_diff"] = float(d.max())
    res["mean_abs_diff"] = float(d.mean())
    res["pct_pixels_gt_8_of_255"] = float((d.max(-1) > 8 / 255).mean() * 100)
    res["pct_pixels_gt_1_of_255"] = float((d.max(-1) > 1 / 255).mean() * 100)
    with open("/tmp/r5_split3_parity.json", "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
