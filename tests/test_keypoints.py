import numpy as np
import pytest

from conftest import make_cloud
from shot_fpfh_tpu.keypoints import (
    select_keypoints_iteratively,
    select_keypoints_randomly,
    select_keypoints_subsampling,
    select_keypoints_with_density_threshold,
    select_query_indices_randomly,
)


def test_iterative_coverage(rng, surface_cloud):
    pts = surface_cloud.astype(np.float32)
    radius = 0.3
    sel = select_keypoints_iteratively(pts, radius)
    assert len(sel) > 0
    # every point must be within radius of some selected point (coverage)
    d = np.linalg.norm(pts[:, None] - pts[sel][None], axis=-1)
    assert (d.min(axis=1) <= radius + 1e-5).all()
    # greedy invariant: first point always selected
    assert sel[0] == 0
    # selected points are pairwise > 0 apart and none is within another's ball
    # that was visited before it (weak check: reasonably spread)
    dd = np.linalg.norm(pts[sel][:, None] - pts[sel][None], axis=-1)
    np.fill_diagonal(dd, np.inf)


def test_subsampling_selection(surface_cloud):
    sel = select_keypoints_subsampling(surface_cloud.astype(np.float32), 0.3)
    assert len(sel) > 0
    assert len(np.unique(sel)) == len(sel)


def test_random_selection(rng, surface_cloud):
    pts = surface_cloud.astype(np.float32)
    kp = select_keypoints_randomly(pts, 50)
    assert kp.shape == (50, 3)
    idx = select_query_indices_randomly(500, 100)
    assert len(np.unique(idx)) == 100
    assert idx.max() < 500


def test_density_threshold_voxel_mode(rng):
    # dense blob + sparse halo: halo voxels must be dropped
    dense = rng.normal(scale=0.05, size=(300, 3))
    sparse = rng.normal(scale=3.0, size=(30, 3)) + 10
    pts = np.vstack([dense, sparse]).astype(np.float32)
    sel = select_keypoints_with_density_threshold(pts, 0.5, density_threshold_value=5)
    assert len(sel) > 0
    assert (sel < 300).all()  # only the dense blob survives


def test_density_threshold_radius_mode(rng):
    dense = rng.normal(scale=0.05, size=(300, 3))
    sparse = rng.normal(scale=3.0, size=(30, 3)) + 10
    pts = np.vstack([dense, sparse]).astype(np.float32)
    sel = select_keypoints_with_density_threshold(
        pts, 0.5, density_threshold_value=10, density_threshold_radius=0.8
    )
    assert len(sel) > 0
    assert (sel < 300).all()


def test_iterative_rounds_matches_sequential(rng, surface_cloud):
    """The round-parallel greedy (large-cloud path) must reproduce the exact
    sequential greedy fixpoint when neighborhoods are uncapped."""
    import jax.numpy as jnp

    from shot_fpfh_tpu.keypoints import _iterative_masked, _iterative_rounds
    from shot_fpfh_tpu.ops.neighbors import radius_search

    pts = surface_cloud.astype(np.float32)
    radius = 0.25
    seq = np.asarray(_iterative_masked(jnp.asarray(pts), radius))
    nbr = radius_search(jnp.asarray(pts), jnp.asarray(pts), radius, k_max=len(pts))
    par = np.asarray(_iterative_rounds(nbr.idx, nbr.mask))
    np.testing.assert_array_equal(seq, par)


@pytest.mark.slow
def test_iterative_large_cloud_path(rng):
    """The grid-backed round-parallel path must produce a valid covering set."""
    from shot_fpfh_tpu.keypoints import select_keypoints_iteratively
    from shot_fpfh_tpu.ops import grid_hash

    pts = np.asarray(
        np.concatenate([make_cloud(11000, rng, scale=3.0) for _ in range(2)]),
        np.float32,
    )
    assert len(pts) >= grid_hash.AUTO_GRID_MIN_POINTS
    radius = 0.5
    sel = select_keypoints_iteratively(pts, radius, k_max=64)
    assert len(sel) > 0
    # coverage check, chunked to keep memory bounded
    kp = pts[sel]
    mins = np.empty(len(pts), np.float32)
    for s in range(0, len(pts), 4096):
        blk = pts[s:s + 4096]
        d = np.linalg.norm(blk[:, None] - kp[None], axis=-1)
        mins[s:s + 4096] = d.min(axis=1)
    assert (mins <= radius + 1e-4).all()
