"""Image output helpers (PNG snapshots; replaces the swapchain present)."""

from __future__ import annotations

import numpy as np


def composite_over(rgba: np.ndarray, background=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Premultiplied rgba over a constant background → float rgb."""
    rgba = np.asarray(rgba, np.float32)
    bg = np.asarray(background, np.float32)
    return rgba[..., :3] + (1.0 - rgba[..., 3:4]) * bg


def to_u8(rgb: np.ndarray) -> np.ndarray:
    return np.clip(np.round(np.asarray(rgb, np.float32) * 255.0), 0, 255).astype(
        np.uint8
    )


def write_png(path: str, rgb_or_rgba: np.ndarray) -> None:
    arr = np.asarray(rgb_or_rgba)
    if arr.dtype != np.uint8:
        if arr.ndim == 3 and arr.shape[-1] == 4:
            arr = to_u8(composite_over(arr))
        else:
            arr = to_u8(arr)
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("PIL unavailable for PNG output") from e
    Image.fromarray(arr).save(path)
