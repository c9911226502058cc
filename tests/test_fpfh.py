import numpy as np
import jax.numpy as jnp

from shot_fpfh_tpu.models import compute_fpfh_descriptor, compute_spfh
import pytest


def numpy_spfh(cloud, normals, radius, n_bins):
    """Independent oracle: SPFH per Rusu et al. with histogramdd range
    semantics (out-of-range dropped, self excluded from angles but counted)."""
    n = len(cloud)
    spfh = np.zeros((n, n_bins, n_bins, n_bins))
    d_all = np.linalg.norm(cloud[:, None] - cloud[None], axis=-1)
    for i in range(n):
        members = np.nonzero(d_all[i] <= radius)[0]
        size = len(members)
        nz = members[d_all[i, members] > 0]
        if size == 0:
            continue
        diff = cloud[nz] - cloud[i]
        u = normals[i]
        v = np.cross(diff, np.broadcast_to(u, diff.shape))
        w = np.cross(np.broadcast_to(u, v.shape), v)
        alpha = np.sum(v * normals[nz], axis=1)
        phi = diff @ u / d_all[i, nz]
        theta = np.arctan2(np.sum(normals[nz] * w, axis=1), normals[nz] @ u)
        h, _ = np.histogramdd(
            np.stack([alpha, phi, theta], axis=1),
            bins=n_bins,
            range=[(-1, 1), (-1, 1), (-np.pi / 2, np.pi / 2)],
        )
        spfh[i] = h / size
    return spfh.reshape(n, -1)


def numpy_fpfh(cloud, normals, radius, n_bins, kp_idx):
    spfh = numpy_spfh(cloud, normals, radius, n_bins)
    d_all = np.linalg.norm(cloud[:, None] - cloud[None], axis=-1)
    out = np.zeros((len(kp_idx), n_bins**3))
    for row, i in enumerate(kp_idx):
        members = np.nonzero(d_all[i] <= radius)[0]
        nz = members[d_all[i, members] > 0]
        acc = (spfh[nz] / d_all[i, nz][:, None]).sum(axis=0)
        out[row] = spfh[i] + acc / len(members)
    return out


def make_test_cloud(rng, n=120):
    pts = rng.normal(size=(n, 3))
    normals = rng.normal(size=(n, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    return pts.astype(np.float32), normals.astype(np.float32)


def test_spfh_matches_oracle(rng):
    pts, normals = make_test_cloud(rng)
    radius, n_bins = 1.2, 4
    ours, _ = compute_spfh(pts, normals, radius, n_bins, k_max=128)
    oracle = numpy_spfh(pts, normals, radius, n_bins)
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=2e-3)


def test_fpfh_matches_oracle(rng):
    pts, normals = make_test_cloud(rng)
    radius, n_bins = 1.2, 4
    kp = np.arange(0, 120, 7, dtype=np.int32)
    ours = np.asarray(compute_fpfh_descriptor(kp, pts, normals, radius, n_bins, k_max=128))
    oracle = numpy_fpfh(pts, normals, radius, n_bins, kp)
    np.testing.assert_allclose(ours, oracle, atol=5e-3)


def test_fpfh_decorrelated_shape(rng):
    pts, normals = make_test_cloud(rng)
    kp = np.arange(10, dtype=np.int32)
    d = compute_fpfh_descriptor(kp, pts, normals, 1.0, 5, decorrelated=True, k_max=128)
    assert d.shape == (10, 15)
    assert np.isfinite(np.asarray(d)).all()


def test_fpfh_rotation_invariance(rng):
    """FPFH is built on Darboux angles — invariant under rigid motion."""
    from shot_fpfh_tpu.core import quaternion_to_matrix

    pts, normals = make_test_cloud(rng)
    kp = np.arange(0, 120, 11, dtype=np.int32)
    d1 = np.asarray(compute_fpfh_descriptor(kp, pts, normals, 1.2, 4, k_max=128))

    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    rot = np.asarray(quaternion_to_matrix(jnp.asarray(q, jnp.float32)))
    t = rng.normal(size=3).astype(np.float32)
    d2 = np.asarray(
        compute_fpfh_descriptor(
            kp, (pts @ rot.T + t).astype(np.float32), (normals @ rot.T).astype(np.float32),
            1.2, 4, k_max=128,
        )
    )
    # histogram bin edges make this nearly-but-not-exactly invariant
    diff = np.linalg.norm(d1 - d2, axis=1) / np.maximum(np.linalg.norm(d1, axis=1), 1e-9)
    assert np.median(diff) < 0.2


@pytest.mark.slow
def test_fpfh_streamed_large_cloud_branch(monkeypatch, rng):
    """The >AUTO_GRID_MIN_POINTS streamed-SPFH branch must match the dense
    path (threshold monkeypatched so a small cloud exercises it)."""
    import shot_fpfh_tpu.models.fpfh as fpfh_mod
    from shot_fpfh_tpu.models.fpfh import compute_fpfh_descriptor

    pts = (rng.normal(size=(300, 3)) * 1.5).astype(np.float32)
    nrm = rng.normal(size=(300, 3)); nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    nrm = nrm.astype(np.float32)
    kp = np.arange(0, 300, 7, dtype=np.int32)

    dense = np.asarray(compute_fpfh_descriptor(kp, pts, nrm, 0.8, n_bins=5, k_max=64))

    import shot_fpfh_tpu.ops.grid_hash as gh
    monkeypatch.setattr(gh, "AUTO_GRID_MIN_POINTS", 10)
    streamed = np.asarray(compute_fpfh_descriptor(kp, pts, nrm, 0.8, n_bins=5, k_max=64))
    assert np.allclose(dense, streamed, atol=1e-4)


@pytest.mark.slow
def test_grid_window_fpfh_matches_bruteforce(rng):
    """Above the auto-grid threshold FPFH switches to the grouped-window
    (no top-k, uncapped) formulation; must agree with the brute path given
    an ample k cap."""
    from shot_fpfh_tpu.models.fpfh import compute_fpfh_descriptor
    from shot_fpfh_tpu.ops import grid_hash

    n = grid_hash.AUTO_GRID_MIN_POINTS + 500
    xy = rng.uniform(-10, 10, size=(n, 2))
    z = 0.4 * np.sin(xy[:, 0]) * np.cos(1.3 * xy[:, 1])
    pts = np.column_stack([xy, z]).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    kp_idx = np.arange(0, n, 97, dtype=np.int32)
    radius = 0.5

    grid_desc = np.asarray(compute_fpfh_descriptor(
        kp_idx, pts, nrm, radius=radius, n_bins=5
    ))

    # brute reference on a small-cloud-path clone: temporarily lower nothing —
    # run compute_spfh/_fpfh_aggregate directly with a generous cap
    from shot_fpfh_tpu.models.fpfh import _fpfh_aggregate, _spfh_from_values
    from shot_fpfh_tpu.ops.neighbors import radius_search
    import jax.numpy as jnp

    cloud = jnp.asarray(pts)
    nrmj = jnp.asarray(nrm)
    nbr = radius_search(cloud, cloud, radius, 256)
    assert int(np.asarray(nbr.count).max()) < 256
    vals_p = cloud[nbr.idx]
    vals_n = nrmj[nbr.idx]
    spfh = _spfh_from_values(cloud, nrmj, vals_p, vals_n, nbr.dist, nbr.mask,
                             radius, 5, False)
    brute = np.asarray(_fpfh_aggregate(
        spfh, nbr.idx, nbr.dist, nbr.mask, jnp.asarray(kp_idx)
    ))
    np.testing.assert_allclose(grid_desc, brute, atol=2e-3)
