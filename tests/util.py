"""Shared helpers for the test suite."""

from __future__ import annotations

import numpy as np


def sphere_shell_volume(n=48, r_frac=0.25, sigma=18.0):
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    r = np.sqrt((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2)
    return np.clip(255 * np.exp(-((r - n * r_frac) ** 2) / sigma), 0, 255).astype(
        np.uint8
    )


def random_blob_volume(rng, shape=(40, 36, 44), n_blobs=6, amp=255):
    d, h, w = shape
    vol = np.zeros(shape, np.float32)
    z, y, x = np.mgrid[0:d, 0:h, 0:w].astype(np.float32)
    for _ in range(n_blobs):
        c = rng.uniform(0.15, 0.85, 3) * [w, h, d]
        s = rng.uniform(2.0, 6.0)
        vol += amp * np.exp(
            -((x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2) / (2 * s * s)
        )
    return np.clip(vol, 0, 255).astype(np.uint8)
