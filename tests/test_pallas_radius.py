"""Pallas run-DMA radius kernels vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from shot_fpfh_tpu.ops.grid_hash import build_grid, grid_radius_pca
from shot_fpfh_tpu.ops.pallas_radius import radius_pca_pallas


@pytest.fixture
def rng():
    return np.random.default_rng(3)


@pytest.mark.slow
def test_radius_pca_pallas_matches_xla(rng):
    pts = (rng.normal(size=(400, 3)) * 2.0).astype(np.float32)
    q = pts[:40]
    radius = 0.8
    grid = build_grid(pts, radius)
    cov_x, bary_x, cnt_x = grid_radius_pca(grid, jnp.asarray(q), radius)
    cov_p, bary_p, cnt_p = radius_pca_pallas(grid, jnp.asarray(q), radius, qb=8)
    assert np.array_equal(np.asarray(cnt_x), np.asarray(cnt_p))
    assert np.allclose(np.asarray(bary_x), np.asarray(bary_p), atol=1e-5)
    assert np.allclose(np.asarray(cov_x), np.asarray(cov_p), atol=1e-5)


@pytest.mark.slow
def test_radius_pca_pallas_empty_and_edge(rng):
    pts = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
    far = np.array([[50.0, 50.0, 50.0]], np.float32)  # off-grid query
    q = np.concatenate([pts[:10], far])
    grid = build_grid(pts, 0.5)
    cov, bary, cnt = radius_pca_pallas(grid, jnp.asarray(q), 0.5, qb=8)
    d = np.linalg.norm(q[:, None, :] - pts[None, :, :], axis=-1)
    want = (d <= 0.5).sum(axis=1)
    assert np.array_equal(np.asarray(cnt).astype(int), want)
    assert int(cnt[-1]) == 0


@pytest.mark.slow
def test_hybrid_search_matches_xla(rng):
    from shot_fpfh_tpu.ops.grid_hash import grid_radius_search
    from shot_fpfh_tpu.ops.pallas_radius import grid_radius_search_pallas
    pts = (rng.normal(size=(350, 3)) * 2.0).astype(np.float32)
    extras = rng.normal(size=(350, 3)).astype(np.float32)
    q = pts[:32]
    radius = 0.8
    grid = build_grid(pts, radius, extras=extras)
    a, va = grid_radius_search(grid, jnp.asarray(q), radius, 64, with_values=True)
    b, vb = grid_radius_search_pallas(grid, jnp.asarray(q), radius, 64,
                                      qb=8, with_values=True)
    da = np.sort(np.where(np.asarray(a.mask), np.asarray(a.dist), 1e9), axis=1)
    db = np.sort(np.where(np.asarray(b.mask), np.asarray(b.dist), 1e9), axis=1)
    assert np.allclose(da, db, atol=1e-5)
    assert np.array_equal(np.asarray(a.mask).sum(1), np.asarray(b.mask).sum(1))
    # value sets match (sort rows by distance then compare sums)
    sa = np.asarray(va).sum(axis=1)
    sb = np.asarray(vb).sum(axis=1)
    assert np.allclose(sa, sb, atol=1e-3)
