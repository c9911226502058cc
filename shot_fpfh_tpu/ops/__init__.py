from .eigh3 import eigh3x3, pca_eigh
from .neighbors import (
    Neighborhoods,
    knn,
    nearest_neighbor,
    radius_count,
    radius_search,
)

__all__ = [
    "eigh3x3",
    "pca_eigh",
    "Neighborhoods",
    "knn",
    "nearest_neighbor",
    "radius_count",
    "radius_search",
]
