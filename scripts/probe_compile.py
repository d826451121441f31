#!/usr/bin/env python3
"""Probe the remote Mosaic compile helper with a fresh DT-class kernel
(unique shape per invocation so the persistent cache never hits)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from vkvolume_tpu.accel import distance_pallas as dp

    z = int(time.time()) % 41 + 17          # unique-ish shape
    rng = np.random.default_rng(0)
    occ = np.where(rng.random((z, 96, 136)) < 0.05, 0, 255).astype(np.uint8)
    try:
        out = dp.scan_and_relax(jnp.asarray(occ), 0, (0,))[0]
        out.block_until_ready()
        print(f"COMPILE OK (shape z={z})")
        return 0
    except Exception as e:
        print(f"COMPILE FAILED (shape z={z}): {str(e)[:120]}")
        return 1


if __name__ == "__main__":
    sys.exit(main())
