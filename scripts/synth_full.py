"""Full-scale v5 synthesis + calibration for the named dataset (CPU only)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import os

os.chdir("/root/repo")

import numpy as np  # noqa: E402

from vkvolume_tpu.bench import datasets as D  # noqa: E402

base = sys.argv[1]
t0 = time.time()
vol = D.synthesize(D.DATASETS[base], scale=1.0)
print(f"{base}: shape={vol.shape} wall={time.time() - t0:.0f}s", flush=True)
import json

print(json.dumps(json.load(open(".cache/synth_calib.json"))
                 .get(f"{base}_v{D._CACHE_VERSION}_s0_x1.0")), flush=True)
