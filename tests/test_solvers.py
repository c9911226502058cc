import numpy as np
import jax.numpy as jnp

from shot_fpfh_tpu.core import (
    RigidTransform,
    quaternion_to_matrix,
    rotation_angle,
    solve_point_to_plane,
    solve_point_to_point,
)


def random_transform(rng, angle_scale=1.0):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if angle_scale < 1.0:  # small rotation: shrink vector part
        q[:3] *= angle_scale
        q /= np.linalg.norm(q)
    rot = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
    return rot, rng.normal(size=3)


def test_kabsch_recovers_exact_transform(rng):
    rot, t = random_transform(rng)
    src = rng.normal(size=(60, 3)).astype(np.float32)
    dst = (src @ rot.T + t).astype(np.float32)
    est = solve_point_to_point(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(est.rotation), rot, atol=1e-4)
    np.testing.assert_allclose(np.asarray(est.translation), t, atol=1e-4)


def test_kabsch_weighted_ignores_outliers(rng):
    rot, t = random_transform(rng)
    src = rng.normal(size=(50, 3)).astype(np.float32)
    dst = (src @ rot.T + t).astype(np.float32)
    dst[40:] += 100.0  # corrupted correspondences
    w = np.ones(50, np.float32)
    w[40:] = 0.0
    est = solve_point_to_point(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(est.rotation), rot, atol=1e-4)


def test_kabsch_reflection_fix(rng):
    # planar degenerate cloud can push SVD towards a reflection
    src = rng.normal(size=(30, 3)).astype(np.float32)
    src[:, 2] = 0
    rot, t = random_transform(rng)
    dst = (src @ rot.T + t).astype(np.float32)
    est = solve_point_to_point(jnp.asarray(src), jnp.asarray(dst))
    assert float(jnp.linalg.det(est.rotation)) > 0.9


def test_kabsch_batched(rng):
    src = rng.normal(size=(4, 20, 3)).astype(np.float32)
    rots, ts = zip(*[random_transform(rng) for _ in range(4)])
    dst = np.stack([s @ r.T + t for s, r, t in zip(src, rots, ts)]).astype(np.float32)
    est = solve_point_to_point(jnp.asarray(src), jnp.asarray(dst))
    assert est.rotation.shape == (4, 3, 3)
    for i in range(4):
        np.testing.assert_allclose(np.asarray(est.rotation)[i], rots[i], atol=1e-3)


def test_point_to_plane_small_motion(rng):
    rot, _ = random_transform(rng, angle_scale=0.005)
    t = rng.normal(size=3) * 0.01
    src = rng.normal(size=(200, 3)).astype(np.float64)
    normals = rng.normal(size=(200, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    dst = src @ rot.T + t
    est = solve_point_to_plane(
        jnp.asarray(src, jnp.float32),
        jnp.asarray(dst, jnp.float32),
        jnp.asarray(normals, jnp.float32),
    )
    # linearized solver: correct to first order for small motion
    ang_err = float(rotation_angle(est.rotation, jnp.asarray(rot, jnp.float32)))
    assert ang_err < 5e-3
    assert np.linalg.norm(np.asarray(est.translation) - t) < 5e-3


def test_point_to_plane_weighted(rng):
    rot, _ = random_transform(rng, angle_scale=0.01)
    t = rng.normal(size=3) * 0.02
    src = rng.normal(size=(100, 3))
    normals = rng.normal(size=(100, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    dst = src @ rot.T + t
    dst[90:] += 50
    w = np.ones(100, np.float32)
    w[90:] = 0
    est = solve_point_to_plane(
        jnp.asarray(src, jnp.float32),
        jnp.asarray(dst, jnp.float32),
        jnp.asarray(normals, jnp.float32),
        jnp.asarray(w),
    )
    assert float(rotation_angle(est.rotation, jnp.asarray(rot, jnp.float32))) < 1e-2


def test_identity_transform_pair(rng):
    src = rng.normal(size=(10, 3)).astype(np.float32)
    est = solve_point_to_point(jnp.asarray(src), jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(est.rotation), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(est.translation), 0, atol=1e-5)
