import numpy as np
import jax.numpy as jnp
import pytest

from shot_fpfh_tpu.core import RigidTransform
from shot_fpfh_tpu.io import (
    get_data,
    get_transform_from_conf_file,
    read_conf_file,
    read_ply,
    write_ply,
)


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(20, 3)).astype(np.float64)
    values = rng.integers(0, 2, size=20).astype(np.int32)
    path = str(tmp_path / "cloud.ply")
    assert write_ply(path, [pts, values], ["x", "y", "z", "values"])
    data = read_ply(path)
    np.testing.assert_allclose(np.vstack([data["x"], data["y"], data["z"]]).T, pts)
    np.testing.assert_array_equal(data["values"], values)


def test_ply_rejects_ascii(tmp_path):
    path = tmp_path / "bad.ply"
    path.write_text("ply\nformat ascii 1.0\nend_header\n")
    with pytest.raises(ValueError):
        read_ply(str(path))


def test_get_data_with_normals_fields(tmp_path, rng):
    pts = rng.normal(size=(30, 3))
    normals = rng.normal(size=(30, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    path = str(tmp_path / "with_normals.ply")
    write_ply(path, [pts, normals], ["x", "y", "z", "nx", "ny", "nz"])
    p, n = get_data(path, recompute_normals=False)
    np.testing.assert_allclose(p, pts, atol=1e-12)
    np.testing.assert_allclose(n, normals, atol=1e-12)


def test_get_data_computes_normals(tmp_path, rng):
    from shot_fpfh_tpu.models import compute_normals

    pts = rng.normal(size=(50, 3))
    path = str(tmp_path / "bare.ply")
    write_ply(path, [pts], ["x", "y", "z"])
    p, n = get_data(path, k=10, normals_computation_callback=compute_normals)
    assert n.shape == (50, 3)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-4)


def test_get_data_remove_duplicates(tmp_path, rng):
    pts = rng.normal(size=(10, 3))
    pts = np.vstack([pts, pts[:3]])  # duplicates
    path = str(tmp_path / "dup.ply")
    write_ply(path, [pts], ["x", "y", "z"])
    from shot_fpfh_tpu.models import compute_normals

    p, _ = get_data(path, remove_duplicates=True, k=5,
                    normals_computation_callback=compute_normals)
    assert p.shape[0] == 10


def test_conf_file_roundtrip(tmp_path, rng):
    # conf stores T_mesh->world as translation + (qw qx qy qz)
    from shot_fpfh_tpu.core import matrix_to_quaternion, quaternion_to_matrix

    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    rot = np.asarray(quaternion_to_matrix(jnp.asarray(q, jnp.float64)))
    t = rng.normal(size=3)
    conf = tmp_path / "pair.conf"
    conf.write_text(
        f"bmesh scan.ply {t[0]} {t[1]} {t[2]} {q[3]} {q[0]} {q[1]} {q[2]}\n"
        "bmesh ref.ply 0 0 0 1 0 0 0\n"
    )
    transforms = read_conf_file(str(conf))
    np.testing.assert_allclose(np.asarray(transforms["scan"].rotation), rot, atol=1e-5)
    np.testing.assert_allclose(np.asarray(transforms["scan"].translation), t, atol=1e-5)

    # with ref = identity, scan->ref transform equals T_scan
    tf = get_transform_from_conf_file(str(conf), "a/scan.ply", "b/ref.ply")
    np.testing.assert_allclose(np.asarray(tf.rotation), rot, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tf.translation), t, atol=1e-5)


def test_conf_inverse_is_correct(tmp_path, rng):
    """Ground truth uses the correct SE(3) inverse (the reference's (Rᵀ, -t)
    defect would fail this)."""
    from shot_fpfh_tpu.core import quaternion_to_matrix

    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    t = rng.normal(size=3)
    conf = tmp_path / "pair.conf"
    conf.write_text(
        "bmesh scan.ply 0 0 0 1 0 0 0\n"
        f"bmesh ref.ply {t[0]} {t[1]} {t[2]} {q[3]} {q[0]} {q[1]} {q[2]}\n"
    )
    tf = get_transform_from_conf_file(str(conf), "scan.ply", "ref.ply")
    rot = np.asarray(quaternion_to_matrix(jnp.asarray(q, jnp.float64)))
    # T_ref^-1 = (Rᵀ, -Rᵀ t)
    np.testing.assert_allclose(np.asarray(tf.rotation), rot.T, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tf.translation), -rot.T @ t, atol=1e-5)
