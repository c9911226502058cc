from .eigh3 import eigh3x3, pca_eigh
from .neighbors import (
    Neighborhoods,
    knn,
    nearest_neighbor,
    radius_count,
    radius_search,
)
from .grid_hash import set_window_group, window_group_default
from .pallas_radius import fused_kernels_enabled, set_fused_kernels

__all__ = [
    "eigh3x3",
    "pca_eigh",
    "fused_kernels_enabled",
    "set_fused_kernels",
    "set_window_group",
    "window_group_default",
    "Neighborhoods",
    "knn",
    "nearest_neighbor",
    "radius_count",
    "radius_search",
]
