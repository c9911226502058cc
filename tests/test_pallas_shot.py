"""Pallas 3-pass SHOT vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from shot_fpfh_tpu.models.shot import compute_shot_descriptor, local_reference_frames
from shot_fpfh_tpu.ops.grid_hash import build_grid
from shot_fpfh_tpu.ops.pallas_shot import shot_descriptor_pallas


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _cloud(rng, n=260):
    xy = rng.uniform(-2, 2, size=(n, 2))
    z = 0.5 * np.sin(1.7 * xy[:, 0]) * np.cos(1.3 * xy[:, 1])
    pts = np.column_stack([xy, z]).astype(np.float32)
    pts += rng.normal(scale=0.01, size=pts.shape).astype(np.float32)
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return pts, nrm.astype(np.float32)


@pytest.mark.slow
def test_pallas_shot_matches_xla_path(rng):
    pts, nrm = _cloud(rng)
    kp = pts[:24]
    radius = 0.8
    grid = build_grid(pts, radius, extras=nrm)
    desc_p, rf_p = shot_descriptor_pallas(
        grid, kp, radius, min_neighborhood_size=5, qb=8)
    # XLA path with a k_max above the largest neighborhood -> identical sets
    desc_x, rf_x = compute_shot_descriptor(
        kp, pts, nrm, radius, k_max=400, min_neighborhood_size=5)
    assert np.allclose(np.asarray(rf_p), np.asarray(rf_x), atol=1e-3)
    assert np.allclose(np.asarray(desc_p), np.asarray(desc_x), atol=2e-3)
    assert float(np.abs(np.asarray(desc_p)).sum()) > 0


@pytest.mark.slow
def test_pallas_shot_sparse_is_zero(rng):
    pts, nrm = _cloud(rng, n=200)
    kp = pts[:10]
    grid = build_grid(pts, 0.5, extras=nrm)
    desc, _ = shot_descriptor_pallas(grid, kp, 0.5, min_neighborhood_size=10_000, qb=8)
    assert np.allclose(np.asarray(desc), 0.0)
