import numpy as np
import jax.numpy as jnp
import pytest

from shot_fpfh_tpu.core import (
    RigidTransform,
    euler_xyz_to_matrix,
    matrix_to_quaternion,
    quaternion_to_matrix,
    rotation_angle,
)


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return np.asarray(quaternion_to_matrix(jnp.asarray(q, jnp.float64)))


def test_quat_matrix_roundtrip(rng):
    for _ in range(50):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        m = quaternion_to_matrix(jnp.asarray(q))
        q2 = np.asarray(matrix_to_quaternion(m))
        # q and -q are the same rotation
        assert min(np.linalg.norm(q2 - q), np.linalg.norm(q2 + q)) < 1e-5


def test_matrix_to_quat_special_cases():
    # identity and 180-degree rotations hit each Shepperd pivot branch
    for m in [
        np.eye(3),
        np.diag([1.0, -1.0, -1.0]),
        np.diag([-1.0, 1.0, -1.0]),
        np.diag([-1.0, -1.0, 1.0]),
    ]:
        q = matrix_to_quaternion(jnp.asarray(m, jnp.float32))
        m2 = np.asarray(quaternion_to_matrix(q))
        np.testing.assert_allclose(m2, m, atol=1e-6)


def test_euler_xyz_matches_scipy(rng):
    scipy = pytest.importorskip("scipy.spatial.transform")
    for _ in range(20):
        ang = rng.uniform(-np.pi, np.pi, size=3)
        ours = np.asarray(euler_xyz_to_matrix(jnp.asarray(ang)))
        theirs = scipy.Rotation.from_euler("xyz", ang).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_apply_and_compose(rng):
    r1, r2 = random_rotation(rng), random_rotation(rng)
    t1, t2 = rng.normal(size=3), rng.normal(size=3)
    a = RigidTransform(jnp.asarray(r1, jnp.float32), jnp.asarray(t1, jnp.float32))
    b = RigidTransform(jnp.asarray(r2, jnp.float32), jnp.asarray(t2, jnp.float32))
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    lhs = np.asarray((a @ b).apply(jnp.asarray(pts)))
    rhs = np.asarray(a.apply(b.apply(jnp.asarray(pts))))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_inverse_is_correct_se3_inverse(rng):
    """The reference's __invert__ returns (Rᵀ, -t) — ours must be (Rᵀ, -Rᵀt)."""
    r = random_rotation(rng)
    t = rng.normal(size=3)
    a = RigidTransform(jnp.asarray(r, jnp.float32), jnp.asarray(t, jnp.float32))
    pts = rng.normal(size=(7, 3)).astype(np.float32)
    back = np.asarray(a.inverse().apply(a.apply(jnp.asarray(pts))))
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_normalize_rotation_projects_back(rng):
    r = random_rotation(rng) + rng.normal(scale=1e-3, size=(3, 3))
    a = RigidTransform(jnp.asarray(r, jnp.float32), jnp.zeros(3, jnp.float32))
    rn = np.asarray(a.normalize_rotation().rotation)
    np.testing.assert_allclose(rn @ rn.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(rn) > 0.99


def test_rotation_angle():
    r = np.asarray(euler_xyz_to_matrix(jnp.asarray([0.3, 0.0, 0.0])))
    ang = float(rotation_angle(jnp.asarray(r), jnp.eye(3)))
    assert abs(ang - 0.3) < 1e-5


def test_batched_transform(rng):
    rots = np.stack([random_rotation(rng) for _ in range(5)]).astype(np.float32)
    ts = rng.normal(size=(5, 3)).astype(np.float32)
    batch = RigidTransform(jnp.asarray(rots), jnp.asarray(ts))
    pts = rng.normal(size=(11, 3)).astype(np.float32)
    out = np.asarray(batch.apply(jnp.asarray(pts)))
    assert out.shape == (5, 11, 3)
    for i in range(5):
        np.testing.assert_allclose(out[i], pts @ rots[i].T + ts[i], atol=1e-5)
