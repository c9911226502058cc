import numpy as np
import jax.numpy as jnp

from shot_fpfh_tpu.models import compute_shot_descriptor, local_reference_frames
from shot_fpfh_tpu.models.shot import shot_from_neighborhoods
from shot_fpfh_tpu.ops import radius_search
import pytest


# ---------------------------------------------------------------- oracle ----
def oracle_azimuth(x, y):
    a = (y > 0) | ((y == 0) & (x < 0))
    half = (x > 0) | ((x == 0) & (y > 0))
    corner = np.where((x * y > 0) | (x == 0), np.abs(x) < np.abs(y), np.abs(x) > np.abs(y))
    return 4 * a.astype(int) + 2 * np.logical_xor(half, a).astype(int) + corner.astype(int)


def oracle_local_rf(point, neighbors, radius):
    if len(neighbors) == 0:
        return np.eye(3)
    centered = neighbors - point
    d = np.linalg.norm(centered, axis=1)
    w = radius - d
    cov = (centered * w[:, None]).T @ centered / w.sum()
    _, vec = np.linalg.eigh(cov)
    x, z = vec[:, 2].copy(), vec[:, 0].copy()
    if ((centered @ x) < 0).sum() > ((centered @ x) >= 0).sum():
        x = -x
    if ((centered @ z) < 0).sum() > ((centered @ z) >= 0).sum():
        z = -z
    return np.stack([x, np.cross(z, x), z], axis=1)


def oracle_shot(point, neighbors, nb_normals, radius, rf, min_size, normalize=True):
    """Accumulating (np.add.at) SHOT with the reference's bin conventions."""
    desc = np.zeros((11, 8, 2, 2))
    rho_all = np.linalg.norm(neighbors - point, axis=1)
    keep = rho_all > 0
    if keep.sum() <= min_size:
        return np.zeros(352)
    nb, nn, rho = neighbors[keep], nb_normals[keep], rho_all[keep]
    local = (nb - point) @ rf
    cosine = np.clip(nn @ rf[:, 2], -1, 1)
    theta = np.arctan2(local[:, 1], local[:, 0])
    phi = np.arccos(np.clip(local[:, 2] / rho, -1, 1))

    cos_pos = (cosine + 1.0) * 11 / 2.0 - 0.5
    cos_idx = np.rint(cos_pos).astype(int)
    az = oracle_azimuth(local[:, 0], local[:, 1])
    elev = (local[:, 2] > 0).astype(int)
    rad = (rho > radius / 2).astype(int)

    delta = cos_pos - cos_idx
    s = np.sign(delta)
    ad = np.abs(delta)
    np.add.at(desc, ((cos_idx + s).astype(int) % 11, az, elev, rad), ad)
    np.add.at(desc, (cos_idx, az, elev, rad), 1 - ad)

    half = radius / 2
    inner = ((rho > half) & (rho < 0.75 * radius)) * (0.75 * radius - rho) / half
    outer = ((rho < half) & (rho > 0.25 * radius)) * (rho - 0.25 * radius) / half
    cur = (rho < half) * (1 - np.abs(rho - 0.25 * radius) / half) + (rho > half) * (
        1 - np.abs(rho - 0.75 * radius) / half
    )
    np.add.at(desc, (cos_idx, az, elev, np.ones_like(rad)), outer * (rad == 0))
    np.add.at(desc, (cos_idx, az, elev, np.zeros_like(rad)), inner * (rad == 1))
    np.add.at(desc, (cos_idx, az, elev, rad), cur)

    hp = np.pi / 2
    edge = np.abs(phi - hp) < 1e-10
    upper = (((phi > hp) | (edge & (local[:, 2] <= 0))) & (phi <= 0.75 * np.pi)) * (
        0.75 * np.pi - phi
    ) / hp
    lower = (((phi < hp) & (~edge | (local[:, 2] > 0))) & (phi >= 0.25 * np.pi)) * (
        phi - 0.25 * np.pi
    ) / hp
    vcur = (phi < hp) * (1 - np.abs(phi - 0.25 * np.pi) / hp) + (phi >= hp) * (
        1 - np.abs(phi - 0.75 * np.pi) / hp
    )
    np.add.at(desc, (cos_idx, az, np.ones_like(elev), rad), upper * (elev == 0))
    np.add.at(desc, (cos_idx, az, np.zeros_like(elev), rad), lower * (elev == 1))
    np.add.at(desc, (cos_idx, az, elev, rad), vcur)

    az_size = 2 * np.pi / 8
    d_az = np.clip((theta - (-np.pi + az * az_size)) / az_size - 0.5, -0.5, 0.5)
    s_az = np.sign(d_az)
    a_az = np.abs(d_az)
    np.add.at(desc, (cos_idx, (az + s_az).astype(int) % 8, elev, rad), a_az)
    np.add.at(desc, (cos_idx, az, elev, rad), 1 - a_az)

    flat = desc.ravel()
    n = np.linalg.norm(flat)
    if n == 0:
        return np.zeros(352)
    return flat / n if normalize else flat


def make_cloud(rng, n=200):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    normals = rng.normal(size=(n, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    return pts, normals.astype(np.float32)


# ----------------------------------------------------------------- tests ----
def test_local_rf_matches_oracle(rng):
    pts, _ = make_cloud(rng)
    radius = 1.5
    kp = pts[:20]
    nbr = radius_search(jnp.asarray(kp), jnp.asarray(pts), radius, 128)
    rfs = np.asarray(local_reference_frames(jnp.asarray(kp), jnp.asarray(pts)[nbr.idx], nbr.mask, radius))
    for i in range(20):
        members = np.nonzero(np.linalg.norm(pts - kp[i], axis=1) <= radius)[0]
        expected = oracle_local_rf(kp[i], pts[members], radius)
        # frames match up to eigenvector sign conventions resolved by the votes
        np.testing.assert_allclose(np.abs(rfs[i]), np.abs(expected), atol=5e-3)
        # signs must agree when the disambiguation votes are decisive;
        # near-tied votes may flip between f32 and the f64 oracle
        centered = pts[members] - kp[i]
        decisive = True
        for axis in (expected[:, 0], expected[:, 2]):
            proj = centered @ axis
            if abs((proj < 0).sum() - (proj >= 0).sum()) <= 2:
                decisive = False
        if decisive:
            np.testing.assert_allclose(rfs[i], expected, atol=5e-3)


def test_local_rf_is_rotation(rng):
    pts, _ = make_cloud(rng)
    kp = pts[:10]
    nbr = radius_search(jnp.asarray(kp), jnp.asarray(pts), 1.5, 128)
    rfs = np.asarray(local_reference_frames(jnp.asarray(kp), jnp.asarray(pts)[nbr.idx], nbr.mask, 1.5))
    for rf in rfs:
        np.testing.assert_allclose(rf.T @ rf, np.eye(3), atol=1e-4)
        assert np.linalg.det(rf) > 0.99


def test_shot_matches_oracle(rng):
    pts, normals = make_cloud(rng)
    radius = 1.5
    kp = pts[:16]
    desc, rfs = compute_shot_descriptor(
        kp, pts, normals, radius, k_max=160, min_neighborhood_size=5
    )
    desc = np.asarray(desc)
    rfs = np.asarray(rfs)
    for i in range(16):
        members = np.nonzero(np.linalg.norm(pts - kp[i], axis=1) <= radius)[0]
        expected = oracle_shot(kp[i], pts[members], normals[members], radius, rfs[i], 5)
        np.testing.assert_allclose(desc[i], expected, atol=2e-3)


def test_shot_sparse_neighborhood_gives_zero(rng):
    pts, normals = make_cloud(rng)
    far = np.array([[100.0, 100.0, 100.0]], np.float32)
    desc, _ = compute_shot_descriptor(far, pts, normals, 1.0, k_max=64, min_neighborhood_size=5)
    assert np.abs(np.asarray(desc)).sum() == 0


def test_shot_normalized(rng):
    pts, normals = make_cloud(rng)
    desc, _ = compute_shot_descriptor(pts[:8], pts, normals, 2.0, k_max=256, min_neighborhood_size=5)
    norms = np.linalg.norm(np.asarray(desc), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_shot_rotation_invariance(rng):
    from shot_fpfh_tpu.core import quaternion_to_matrix

    pts, normals = make_cloud(rng, n=300)
    kp = pts[:12]
    d1 = np.asarray(
        compute_shot_descriptor(kp, pts, normals, 1.5, k_max=256, min_neighborhood_size=5)[0]
    )
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    rot = np.asarray(quaternion_to_matrix(jnp.asarray(q, jnp.float32)))
    t = np.array([3.0, -2.0, 1.0], np.float32)
    d2 = np.asarray(
        compute_shot_descriptor(
            (kp @ rot.T + t).astype(np.float32),
            (pts @ rot.T + t).astype(np.float32),
            (normals @ rot.T).astype(np.float32),
            1.5, k_max=256, min_neighborhood_size=5,
        )[0]
    )
    err = np.linalg.norm(d1 - d2, axis=1)
    assert np.median(err) < 0.05


def test_shot_multiscale_driver(rng):
    from shot_fpfh_tpu.models import ShotComputer

    pts, normals = make_cloud(rng)
    comp = ShotComputer(min_neighborhood_size=5, k_max=128)
    d = comp.compute_descriptor_multiscale(pts, normals, pts[:6], radii=[1.0, 2.0])
    assert d.shape == (6, 704)


def test_shot_bi_scale_driver(rng):
    from shot_fpfh_tpu.models import ShotComputer

    pts, normals = make_cloud(rng)
    comp = ShotComputer(min_neighborhood_size=5, k_max=128)
    d = comp.compute_descriptor_bi_scale(pts, normals, pts[:6], 1.0, 2.0)
    assert d.shape == (6, 352)
    assert np.isfinite(np.asarray(d)).all()


@pytest.mark.slow
def test_grid_window_path_matches_bruteforce_uncapped(rng):
    """Above the auto-grid threshold compute_shot_descriptor switches to the
    full-window (no top-k, uncapped) formulation; it must agree with the
    brute-force path given an ample k cap."""
    import jax.numpy as jnp

    from shot_fpfh_tpu.models.shot import (
        _shot_from_values,
        local_reference_frames,
        compute_shot_descriptor,
    )
    from shot_fpfh_tpu.ops import grid_hash
    from shot_fpfh_tpu.ops.neighbors import radius_search

    n = grid_hash.AUTO_GRID_MIN_POINTS + 500
    xy = rng.uniform(-8, 8, size=(n, 2))
    z = 0.4 * np.sin(xy[:, 0]) * np.cos(1.3 * xy[:, 1])
    pts = np.column_stack([xy, z]).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    radius = 0.6
    q = pts[:192]

    desc_grid, rfs = compute_shot_descriptor(
        q, pts, nrm, radius, min_neighborhood_size=5
    )
    # brute-force reference with a cap far above any neighborhood size
    nbr = radius_search(jnp.asarray(q), jnp.asarray(pts), radius, 512)
    assert int(np.asarray(nbr.count).max()) < 512
    rfs_b = local_reference_frames(
        jnp.asarray(q), jnp.asarray(pts)[nbr.idx], nbr.mask, radius
    )
    desc_brute, _ = _shot_from_values(
        jnp.asarray(q), jnp.asarray(pts)[nbr.idx], jnp.asarray(nrm)[nbr.idx],
        nbr.mask, rfs_b, radius, True, 5,
    )
    np.testing.assert_allclose(
        np.asarray(desc_grid), np.asarray(desc_brute), atol=2e-3
    )


@pytest.mark.slow
def test_grid_window_bi_scale_matches_bruteforce(rng):
    """Large-support bi-scale SHOT (window RFs at rf_radius) must agree with
    the brute small-cloud formulation given ample caps."""
    import jax.numpy as jnp

    from shot_fpfh_tpu.models.shot import ShotComputer
    from shot_fpfh_tpu.ops import grid_hash

    n = grid_hash.AUTO_GRID_MIN_POINTS + 500
    xy = rng.uniform(-9, 9, size=(n, 2))
    z = 0.4 * np.sin(xy[:, 0]) * np.cos(1.3 * xy[:, 1])
    pts = np.column_stack([xy, z]).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    kp = pts[:96]

    comp = ShotComputer(k_max=512, min_neighborhood_size=5)
    desc_big = np.asarray(comp.compute_descriptor_bi_scale(
        pts, nrm, kp, local_rf_radius=0.4, shot_radius=0.8
    ))

    # brute reference: RFs from rf-radius neighborhoods, histogram from
    # shot-radius neighborhoods, both uncapped
    from shot_fpfh_tpu.models.shot import (
        _shot_from_values,
        local_reference_frames,
    )
    from shot_fpfh_tpu.ops.neighbors import radius_search

    kpj = jnp.asarray(kp)
    ptsj = jnp.asarray(pts)
    rf_nbr = radius_search(kpj, ptsj, 0.4, 256)
    rfs = local_reference_frames(kpj, ptsj[rf_nbr.idx], rf_nbr.mask, 0.4)
    nbr = radius_search(kpj, ptsj, 0.8, 512)
    assert int(np.asarray(nbr.count).max()) < 512
    desc_ref, _ = _shot_from_values(
        kpj, ptsj[nbr.idx], jnp.asarray(nrm)[nbr.idx], nbr.mask, rfs, 0.8,
        True, 5,
    )
    np.testing.assert_allclose(desc_big, np.asarray(desc_ref), atol=2e-3)


@pytest.mark.slow
def test_shot_debug_checks_clean_batch(rng):
    """A real descriptor batch under --debug_shot reports zero violations
    (counterpart of reference shot.py:414-463 debug_mode)."""
    from shot_fpfh_tpu.models.shot import (
        debug_violation_count, enable_debug_checks,
    )

    pts = np.asarray(rng.normal(size=(300, 3)), np.float32)
    normals = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    enable_debug_checks(True)
    try:
        desc, _ = compute_shot_descriptor(
            pts[:32], pts, normals, 0.8, min_neighborhood_size=1
        )
        np.asarray(desc)  # force execution so callbacks flush
        assert debug_violation_count() == 0
        assert np.isfinite(np.asarray(desc)).all()
    finally:
        enable_debug_checks(False)


def test_shot_debug_checks_catch_injected_bad_bin(rng):
    """An out-of-range cosine (bypassing the public entry's clip) must be
    flagged by the debug checks."""
    from shot_fpfh_tpu.models.shot import (
        _shot_accumulate, debug_violation_count, enable_debug_checks,
    )

    q, k = 4, 16
    lx = jnp.asarray(rng.normal(size=(q, k)), jnp.float32)
    ly = jnp.asarray(rng.normal(size=(q, k)), jnp.float32)
    lz = jnp.asarray(rng.normal(size=(q, k)), jnp.float32)
    rho = jnp.sqrt(lx**2 + ly**2 + lz**2) * 0.1
    cosine = jnp.full((q, k), 5.0)  # invalid: cos must be in [-1, 1]
    valid = jnp.ones((q, k), bool)
    enable_debug_checks(True)
    try:
        out = _shot_accumulate(lx, ly, lz, rho, cosine, valid, 1.0, True, 1)
        np.asarray(out)
        assert debug_violation_count() > 0
    finally:
        enable_debug_checks(False)
