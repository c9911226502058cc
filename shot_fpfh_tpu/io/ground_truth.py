"""Stanford .conf ground-truth parsing and transform checks.

Mirrors the reference (analysis/ground_truth_retrieval.py:10-61): ``bmesh``
lines carry a translation followed by a quaternion in ``q3, q0, q1, q2``
order; the scan→ref transform composes ``T_ref⁻¹ ∘ T_scan``.  Unlike the
reference, the inverse used here is the correct SE(3) inverse
(SURVEY.md §2.4.3), so the recovered ground truth translation is exact.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.transform import RigidTransform, quaternion_to_matrix


def quaternion_wxyz_to_rotation_matrix(quaternion) -> np.ndarray:
    """Stanford .conf quaternion order ``(q3, q0, q1, q2)`` → rotation matrix
    (reference ground_truth_retrieval.py:10-17)."""
    q3, q0, q1, q2 = quaternion
    return np.asarray(quaternion_to_matrix(jnp.asarray([q0, q1, q2, q3], jnp.float64)))


def read_conf_file(file_path: str) -> dict[str, RigidTransform]:
    """Per-mesh transforms from a Stanford 3D Scanning Repository .conf file."""
    transforms = {}
    with open(file_path) as f:
        for line in f:
            parts = line.split(" ")
            if parts[0] != "bmesh":
                continue
            name = parts[1].replace(".ply", "")
            translation = np.array([float(v) for v in parts[2:5]])
            rotation = quaternion_wxyz_to_rotation_matrix([float(v) for v in parts[5:9]])
            transforms[name] = RigidTransform(
                jnp.asarray(rotation, jnp.float32), jnp.asarray(translation, jnp.float32)
            )
    return transforms


def get_transform_from_conf_file(
    conf_file_name: str, scan_file_name: str, ref_file_name: str
) -> RigidTransform:
    """Exact scan→ref transform: ``T_ref⁻¹ ∘ T_scan``."""
    conf = read_conf_file(conf_file_name)
    ref_key = ref_file_name.split("/")[-1].replace(".ply", "")
    scan_key = scan_file_name.split("/")[-1].replace(".ply", "")
    return conf[ref_key].inverse() @ conf[scan_key]


def nn_distance_histogram(scan, ref, transformation: RigidTransform, bins: int = 100):
    """Histogram of 1-NN distances under a candidate transform — the data
    behind the reference's ``check_transform`` plot
    (ground_truth_retrieval.py:51-61); plotting is left to the caller."""
    from ..ops.neighbors import nearest_neighbor

    moved = transformation.apply(jnp.asarray(scan, jnp.float32))
    dist, _ = nearest_neighbor(moved, jnp.asarray(ref, jnp.float32))
    return np.histogram(np.asarray(dist), bins=bins)
