"""shot_fpfh_tpu — TPU-native point-cloud registration.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
``shot-fpfh`` pipeline (normals → keypoints → SHOT/FPFH descriptors → matching
→ RANSAC → ICP), redesigned for TPU: fixed-shape masked tensors, batched
kernels, and ``shard_map`` sharding over device meshes.
"""

import jax as _jax

# Geometry kernels (3x3 eigh, Kabsch SVD, squared-distance expansion) are
# precision-critical: on TPU the default matmul precision is bf16, which is not
# enough for near-degenerate covariances or distance cancellation.  Hot large
# matmuls that tolerate lower precision opt in locally.
_jax.config.update("jax_default_matmul_precision", "highest")

from .core import (  # noqa: E402
    RigidTransform,
    grid_subsample,
    registration_rms,
    rotation_angle,
    solve_point_to_plane,
    solve_point_to_point,
)
from .ops import knn, nearest_neighbor, radius_count, radius_search  # noqa: E402


def __getattr__(name):
    # heavier layers are imported lazily to keep `import shot_fpfh_tpu` light
    if name == "RegistrationPipeline":
        from .pipeline import RegistrationPipeline

        return RegistrationPipeline
    if name == "load_config_from_yaml":
        from .configuration import load_config_from_yaml

        return load_config_from_yaml
    raise AttributeError(name)


__version__ = "0.1.0"

__all__ = [
    "RigidTransform",
    "grid_subsample",
    "registration_rms",
    "rotation_angle",
    "solve_point_to_plane",
    "solve_point_to_point",
    "knn",
    "nearest_neighbor",
    "radius_count",
    "radius_search",
]
