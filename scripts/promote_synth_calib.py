#!/usr/bin/env python3
"""Promote .cache/synth_calib.json entries into the committed packaged
defaults (vkvolume_tpu/bench/synth_calib.json).

The synthesis calibration loop (bench/datasets.py:_calibrate) runs a
full-scale secant search — many multi-minute 832M-voxel builds for snake —
whose only outputs are two floats per (dataset, seed, scale) key. The loop
is deterministic, so its results are safe to ship: a committed entry turns
every future fresh-container synthesis into ONE build (the round-5 parity
stall was exactly a missing snake entry re-running the loop).
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cache_path = os.path.join(REPO, ".cache", "synth_calib.json")
pkg_path = os.path.join(REPO, "vkvolume_tpu", "bench", "synth_calib.json")

if not os.path.exists(cache_path):
    print("no .cache/synth_calib.json — nothing to promote")
    sys.exit(0)
with open(cache_path) as fh:
    cache = json.load(fh)
with open(pkg_path) as fh:
    pkg = json.load(fh)

added = {k: v for k, v in cache.items() if k not in pkg}
pkg.update(added)
with open(pkg_path, "w") as fh:
    json.dump(pkg, fh, indent=1, sort_keys=True)
    fh.write("\n")
print(f"promoted {len(added)} entries: {sorted(added)}")
