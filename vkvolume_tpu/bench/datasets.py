"""Synthetic stand-ins for the reference benchmark datasets.

The published CSVs (scripts/benchmark_results_*.csv) use three CT volumes
(present 492³-ish, stag beetle 832×832×494, kingsnake 1024×1024×795,
scripts/benchmark.py:27-34) that are not redistributable here. We synthesise
deterministic volumes with the *same extents, dtypes and header format* and
calibrated so the TF-a configs produce approximately the same occupancy
percentages (present 7.13 %, beetle 3.97 %, snake 0.67 % — the quantity that
drives ESS benefit). Ratios between ESS modes are the transferable signal
(BASELINE.md); absolute fps on synthetic data is labelled as such.

Construction: smooth band-limited noise (trilinear upsampling of a coarse
seeded gaussian grid, a cheap stand-in for CT structure) linearly remapped so
the (1 - occupancy)-quantile lands exactly at the TF intensity threshold.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class BenchDataset:
    key: str
    filename: str                 # reference filename (for CSV parity)
    extent: tuple[int, int, int]  # (W, H, D)
    imin: float
    imax: float
    gmin: float
    gmax: float
    occupancy_pct: float          # reference TF-a occupancy to calibrate to


# TF configs from scripts/benchmark.py:27-34; occupancies from
# scripts/benchmark_results_0.csv rows 4/14/24.
DATASETS = {
    "present": BenchDataset("present", "present_492x492x442.uint16",
                            (492, 492, 442), 0.071, 1.0, 0.0, 0.0, 7.13),
    "present-grad": BenchDataset("present-grad", "present_492x492x442.uint16",
                                 (492, 492, 442), 0.071, 1.0, 0.06, 0.1, 7.13),
    "beetle": BenchDataset("beetle", "stag_beetle_832x832x494.uint16",
                           (832, 832, 494), 0.086, 1.0, 0.0, 0.0, 3.97),
    "beetle-grad": BenchDataset("beetle-grad", "stag_beetle_832x832x494.uint16",
                                (832, 832, 494), 0.086, 1.0, 0.1, 0.3, 3.97),
    "snake": BenchDataset("snake", "kingsnake_1024x1024x795.uint8",
                          (1024, 1024, 795), 0.4, 0.8, 0.0, 0.0, 0.67),
    "snake-grad": BenchDataset("snake-grad", "kingsnake_1024x1024x795.uint8",
                               (1024, 1024, 795), 0.2, 0.8, 0.06, 0.12, 0.67),
}


def synthesize(ds: BenchDataset, seed: int = 0, scale: float = 1.0,
               cache_dir: str | None = ".cache") -> np.ndarray:
    """Build the uint8 (D, H, W) volume. ``scale`` < 1 shrinks extents
    proportionally (for quick tests). Deterministic; results are cached on
    disk (full-size volumes take ~2 min of numpy to synthesise)."""
    import os

    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        path = os.path.join(cache_dir, f"{ds.key}_s{seed}_x{scale}.npy")
        if os.path.exists(path):
            return np.load(path)
        vol = synthesize(ds, seed, scale, cache_dir=None)
        np.save(path, vol)
        return vol
    w, h, d = (max(8, int(round(e * scale))) for e in ds.extent)
    rng = np.random.default_rng(seed + (hash(ds.key) % 1000))
    # Coarse correlated field, ~26 voxels per feature.
    cw, ch, cd = (max(2, s // 26) for s in (w, h, d))
    coarse = rng.standard_normal((cd + 1, ch + 1, cw + 1)).astype(np.float32)

    # Trilinear upsample via separable linear interpolation.
    def upsample(a, axis, n):
        L = a.shape[axis] - 1
        pos = np.linspace(0, L, n, dtype=np.float32)
        i0 = np.minimum(pos.astype(np.int32), L - 1)
        frac = pos - i0
        a0 = np.take(a, i0, axis=axis)
        a1 = np.take(a, i0 + 1, axis=axis)
        shape = [1] * a.ndim
        shape[axis] = n
        frw = frac.reshape(shape)
        return a0 * (1 - frw) + a1 * frw

    field = upsample(upsample(upsample(coarse, 0, d), 1, h), 2, w)
    # Light fine-grain texture so gradients are non-trivial.
    field += 0.15 * rng.standard_normal(field.shape).astype(np.float32)

    # Compact-object envelope: real CT scans are a connected specimen inside
    # empty space (that structure is what gives the reference its ~8× ESS
    # win — BASELINE.md); a lumpy superellipsoid bounds the occupied region
    # to roughly the central half of each axis.
    zz = (np.arange(d, dtype=np.float32) / d - 0.5) * 2.0
    yy = (np.arange(h, dtype=np.float32) / h - 0.5) * 2.0
    xx = (np.arange(w, dtype=np.float32) / w - 0.5) * 2.0
    rad = (
        (np.abs(zz[:, None, None]) / 0.62) ** 3
        + (np.abs(yy[None, :, None]) / 0.58) ** 3
        + (np.abs(xx[None, None, :]) / 0.58) ** 3
    )
    lumpy = upsample(upsample(upsample(
        0.15 * rng.standard_normal((cd + 1, ch + 1, cw + 1)).astype(np.float32),
        0, d), 1, h), 2, w)
    envelope = np.clip(2.0 * (1.0 - rad) + lumpy, 0.0, 1.0)
    field = (field - field.min()) * envelope

    # Remap so that P(value/255 > imin) == occupancy_pct.
    q = np.quantile(field, 1.0 - ds.occupancy_pct / 100.0)
    thr_u8 = ds.imin * 255.0
    g = field / max(q, 1e-6) * thr_u8
    return np.clip(g, 0.0, 255.0).astype(np.uint8)


def write_reference_format(ds: BenchDataset, volume_u8: np.ndarray, path: str):
    """Persist in the reference raw+header format (README.md:58-68)."""
    from ..io.header import Header, write_header

    dtype = "uint8_t" if ds.filename.endswith("uint8") else "uint16_t"
    d, h, w = volume_u8.shape
    hd = Header(
        extent=(w, h, d),
        voxel_size=(0.001, 0.001, 0.001),
        normalisation_range=(0.0, 255.0 if dtype == "uint8_t" else 65535.0),
        dtype=dtype,
        endianness="little",
        rotation_axis=(1.0, 0.0, 0.0),
        rotation_angle_deg=90.0,
    )
    scale = 1 if dtype == "uint8_t" else 257
    (volume_u8.astype(np.uint16) * scale).astype(hd.np_dtype).tofile(path)
    write_header(path + ".header", hd)
