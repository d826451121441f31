"""Volume state — the functional twin of the reference's ``Volume`` scene
component (src/volume_component.h:31-93): one struct of arrays instead of
Vulkan images + samplers + staging buffers.

GPU-resource ceremony (image layouts, barriers, staging uploads —
src/volume_component.cpp:29-153) has no equivalent work: ``jnp.asarray`` puts
the volume in HBM and XLA owns hazards.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..accel import occupancy as occ_mod
from ..io.header import Header
from ..utils import math3d
from ..options import VolumeOptions


@dataclasses.dataclass
class Volume:
    name: str
    density: object                    # (D, H, W) uint8 jax array
    options: VolumeOptions
    image_transform: np.ndarray        # (4,4) from the header
    node_transform: np.ndarray = dataclasses.field(
        default_factory=math3d.identity
    )
    block_size: int = 4                # nominal distance-map block size
    gradient: object | None = None     # (D, H, W) uint8 (precomputed map)
    tf_texture: np.ndarray | None = None   # (256,256,4) uint8 baked TF
    dist_maps: object | None = None    # (N, mz, my, mx) uint8; N=1 or 8
    header: Header | None = None

    @property
    def extent_xyz(self) -> tuple[int, int, int]:
        d, h, w = self.density.shape
        return (w, h, d)

    @property
    def map_shape_zyx(self) -> tuple[int, int, int]:
        """Occupancy/distance-map shape = ceil(extent / block_size)
        (src/volume_component.cpp:91-92)."""
        d, h, w = self.density.shape
        b = self.block_size
        return (-(-d // b), -(-h // b), -(-w // b))

    @property
    def effective_block_size_xyz(self) -> tuple[int, int, int]:
        mz, my, mx = self.map_shape_zyx
        return occ_mod.effective_block_size(self.extent_xyz, (mx, my, mz))

    @property
    def model_matrix(self) -> np.ndarray:
        """node_transform @ image_transform (src/volume_render_subpass.cpp:227)."""
        return self.node_transform.astype(np.float64) @ self.image_transform.astype(
            np.float64
        )

    def set_scale(self, scale_xyz) -> None:
        """Node uniform scale (reference: node transform set_scale,
        src/volume_render.cpp:233-237)."""
        self.node_transform = math3d.scale(scale_xyz)
        self._spin_base = None

    def get_translation(self) -> np.ndarray:
        """Node translation component (reference GUI reads it back for the
        per-volume XYZ drag, src/volume_render.cpp:464)."""
        return np.asarray(self.node_transform, np.float64)[:3, 3].copy()

    def set_translation(self, xyz) -> None:
        """Replace the node's translation, preserving its rotation/scale —
        the reference GUI's per-volume XYZ drag
        (src/volume_render.cpp:464-468 ``transform.set_translation``). Also
        retargets the captured spin base so a spinning volume keeps
        rotating about its new position."""
        t = np.asarray(xyz, np.float64)
        m = np.asarray(self.node_transform, np.float64).copy()
        m[:3, 3] = t
        self.node_transform = m.astype(np.float32)
        base = getattr(self, "_spin_base", None)
        if base is not None:
            base = np.asarray(base, np.float64).copy()
            base[:3, 3] = t
            self._spin_base = base

    def set_spin(self, angle_rad: float, axis=(0.0, 1.0, 0.0)) -> None:
        """Node rotation composed over the node's spin-free transform —
        the reference's ``spin_volumes`` animation (one rotation step per
        frame, src/volume_render.cpp:89, :256-271). Absolute angle, not
        cumulative: the spin-free base is captured on first use (the
        current node_transform, whatever composed it), so translations or
        custom transforms are preserved."""
        base = getattr(self, "_spin_base", None)
        if base is None:
            base = self._spin_base = np.asarray(self.node_transform,
                                                np.float64)
        # T · R · linear(base): rotate about the node's own position (the
        # reference's Transform composes translation·rotation·scale, so a
        # TRANSLATED volume spins in place rather than orbiting the world
        # origin). Identity-translation bases are unaffected.
        lin = np.asarray(base, np.float64).copy()
        t = lin[:3, 3].copy()
        lin[:3, 3] = 0.0
        m = math3d.rotate(angle_rad, axis).astype(np.float64) @ lin
        m[:3, 3] = t
        self.node_transform = m.astype(np.float32)


def from_file(
    path: str,
    options: VolumeOptions | None = None,
    block_size: int = 4,
    name: str | None = None,
) -> Volume:
    """Load + normalise a volume from ``<path>`` / ``<path>.header``
    (``Volume::load_from_file``, src/volume_component.cpp:55-153)."""
    from ..io.loader import load_volume

    data, header = load_volume(path)
    return Volume(
        name=name or str(path),
        density=jnp.asarray(data),
        options=options or VolumeOptions(),
        image_transform=header.image_transform,
        block_size=block_size,
        header=header,
    )


def from_array(
    data: np.ndarray,
    options: VolumeOptions | None = None,
    block_size: int = 4,
    voxel_size=(1.0, 1.0, 1.0),
    name: str = "volume",
) -> Volume:
    d, h, w = data.shape
    physical = np.asarray(voxel_size, np.float32) * np.asarray([w, h, d], np.float32)
    return Volume(
        name=name,
        density=jnp.asarray(data),
        options=options or VolumeOptions(),
        image_transform=math3d.scale(physical),
        block_size=block_size,
    )
