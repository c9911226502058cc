from .eigh3 import eigh3x3, pca_eigh
from .neighbors import (
    Neighborhoods,
    knn,
    nearest_neighbor,
    radius_count,
    radius_search,
)
from .grid_hash import set_window_group, window_group_default
from .pallas_radius import (
    dma_kernel_enabled,
    fused_kernels_enabled,
    set_dma_kernel,
    set_fused_kernels,
)

__all__ = [
    "eigh3x3",
    "pca_eigh",
    "dma_kernel_enabled",
    "fused_kernels_enabled",
    "set_dma_kernel",
    "set_fused_kernels",
    "set_window_group",
    "window_group_default",
    "Neighborhoods",
    "knn",
    "nearest_neighbor",
    "radius_count",
    "radius_search",
]
