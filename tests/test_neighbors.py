import numpy as np
import jax.numpy as jnp

from shot_fpfh_tpu.ops import knn, nearest_neighbor, radius_count, radius_search


def brute_knn(queries, points, k):
    d = np.linalg.norm(queries[:, None] - points[None], axis=-1)
    idx = np.argsort(d, axis=1)[:, :k]
    return idx, np.take_along_axis(d, idx, axis=1)


def test_knn_matches_bruteforce(rng):
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    q = rng.normal(size=(50, 3)).astype(np.float32)
    res = knn(jnp.asarray(q), jnp.asarray(pts), 8)
    idx_np, d_np = brute_knn(q, pts, 8)
    np.testing.assert_allclose(np.asarray(res.dist), d_np, atol=1e-4)
    # indices can differ on ties; check distances of gathered points instead
    got = np.linalg.norm(q[:, None] - pts[np.asarray(res.idx)], axis=-1)
    np.testing.assert_allclose(got, d_np, atol=1e-4)
    assert np.asarray(res.mask).all()


def test_knn_k_larger_than_cloud(rng):
    pts = rng.normal(size=(5, 3)).astype(np.float32)
    res = knn(jnp.asarray(pts), jnp.asarray(pts), 8)
    mask = np.asarray(res.mask)
    assert (mask.sum(axis=1) == 5).all()


def test_radius_search_exact(rng):
    pts = rng.normal(size=(400, 3)).astype(np.float32)
    q = pts[:60]
    r = 0.7
    res = radius_search(jnp.asarray(q), jnp.asarray(pts), r, k_max=256)
    d = np.linalg.norm(q[:, None] - pts[None], axis=-1)
    expected_counts = (d <= r).sum(axis=1)
    got_counts = np.asarray(res.mask).sum(axis=1)
    # allow off-by-tiny on boundary ties
    assert (np.abs(got_counts - expected_counts) <= 1).all()
    # every reported neighbor is within radius
    dist = np.asarray(res.dist)
    assert (dist[np.asarray(res.mask)] <= r + 1e-5).all()
    # self is included (dist 0)
    assert (dist.min(axis=1) < 1e-6).all()


def test_radius_search_cap(rng):
    pts = rng.normal(scale=0.01, size=(100, 3)).astype(np.float32)
    res = radius_search(jnp.asarray(pts[:5]), jnp.asarray(pts), 1.0, k_max=16)
    # cap binds: exactly 16 nearest kept
    assert (np.asarray(res.mask).sum(axis=1) == 16).all()


def test_radius_count(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    q = pts[:30]
    r = 0.5
    counts = np.asarray(radius_count(jnp.asarray(q), jnp.asarray(pts), r))
    d = np.linalg.norm(q[:, None] - pts[None], axis=-1)
    np.testing.assert_array_equal(counts, (d <= r).sum(axis=1))


def test_nearest_neighbor(rng):
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    q = rng.normal(size=(41, 3)).astype(np.float32)
    dist, idx = nearest_neighbor(jnp.asarray(q), jnp.asarray(pts))
    d = np.linalg.norm(q[:, None] - pts[None], axis=-1)
    np.testing.assert_allclose(np.asarray(dist), d.min(axis=1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(axis=1))


def test_chunking_path(rng):
    # force multiple query chunks by using many queries
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    q = rng.normal(size=(5000, 3)).astype(np.float32)
    res = knn(jnp.asarray(q), jnp.asarray(pts), 3)
    assert res.idx.shape == (5000, 3)
    _, d_np = brute_knn(q, pts, 3)
    np.testing.assert_allclose(np.asarray(res.dist), d_np, atol=1e-4)
