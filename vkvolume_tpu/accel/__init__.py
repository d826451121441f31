from .distance import (
    anisotropic_distance,
    axis_scan,
    brute_force_chebyshev,
    isotropic_distance,
    relax,
)
from .gradient import gradient_map
from .occupancy import (
    EMPTY,
    OCCUPIED,
    effective_block_size,
    map_extent,
    occupancy_map,
    occupied_voxel_count,
    voxel_alpha_positive,
)

__all__ = [
    "anisotropic_distance",
    "axis_scan",
    "brute_force_chebyshev",
    "isotropic_distance",
    "relax",
    "gradient_map",
    "EMPTY",
    "OCCUPIED",
    "effective_block_size",
    "map_extent",
    "occupancy_map",
    "occupied_voxel_count",
    "voxel_alpha_positive",
]
