#!/usr/bin/env python3
"""Re-measure specific benchmark CSV rows in place.

A handful of rows in docs/benchmarks_r3 were timed through a degraded
relay period (snake b=2 skipmode 3 reads 7.75 fps vs skipmode 2's 13.7 —
the live-octant map provably leaps >= the isotropic map, so a real slowdown
of that size is not physical). This re-runs just those configs with the
standard sweep protocol and rewrites the matching CSV rows.

Usage: python scripts/remeasure_rows.py [cfg ...]
  cfg = dataset:skipmode:blocksize, e.g. snake:3:2
Env: ROWS_DIR (docs/benchmarks_r3), ROWS_FRAMES (20)
"""
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = ["snake:3:2", "present:3:4", "beetle:3:2", "snake:3:5",
           "snake:2:4"]


def main():
    from vkvolume_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from vkvolume_tpu.bench.harness import run_config

    cfgs = sys.argv[1:] or DEFAULT
    out_dir = os.environ.get("ROWS_DIR", "docs/benchmarks_r3")
    frames = int(os.environ.get("ROWS_FRAMES", "20"))
    for cfg in cfgs:
        dataset, sm, b = cfg.split(":")
        sm, b = int(sm), int(b)
        r = run_config(dataset, sm, b, width=1200, height=1200,
                       frames=frames)
        print(f"{cfg}: {r.framerate:.2f} fps (reps {r.rep_ms}) "
              f"update {r.update:.1f} ms", flush=True)
        path = os.path.join(out_dir, f"benchmark_results_{sm}.csv")
        with open(path, newline="") as fh:
            rows = list(csv.reader(fh))
        hdr = rows[0]
        img_i = hdr.index("image")
        b_i = hdr.index("blocksize")
        g_i = hdr.index("gmin")
        new = [str(x) for x in r.row()]
        for i, row in enumerate(rows[1:], 1):
            if (row[img_i] == dataset.split("-")[0]
                    and int(row[b_i]) == b
                    and float(row[g_i]) == r.gmin):
                rows[i] = new
                break
        else:
            rows.append(new)
        with open(path, "w", newline="") as fh:
            csv.writer(fh).writerows(rows)
        print(f"  -> updated {path}", flush=True)


if __name__ == "__main__":
    main()
