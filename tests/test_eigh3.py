import numpy as np
import jax.numpy as jnp

from shot_fpfh_tpu.ops import eigh3x3, pca_eigh


def random_sym(rng, n):
    a = rng.normal(size=(n, 3, 3))
    return (a + np.swapaxes(a, -1, -2)) / 2


def check_against_numpy(a, atol=1e-4):
    w, v = eigh3x3(jnp.asarray(a, jnp.float32))
    w, v = np.asarray(w), np.asarray(v)
    w_np, v_np = np.linalg.eigh(a)
    np.testing.assert_allclose(w, w_np, atol=atol * np.abs(w_np).max())
    # eigenvectors up to sign; verify A v = w v instead of comparing to numpy
    for i in range(3):
        res = np.einsum("bij,bj->bi", a, v[..., i]) - w[..., i, None] * v[..., i]
        assert np.abs(res).max() < atol * max(np.abs(w_np).max(), 1.0)
    # orthonormality
    vtv = np.einsum("bij,bik->bjk", v, v)
    np.testing.assert_allclose(vtv, np.broadcast_to(np.eye(3), vtv.shape), atol=1e-4)


def test_eigh3_random(rng):
    check_against_numpy(random_sym(rng, 256))


def test_eigh3_degenerate(rng):
    mats = np.stack(
        [
            np.eye(3),
            np.zeros((3, 3)),
            np.diag([1.0, 1.0, 2.0]),
            np.diag([5.0, 5.0, 5.0]),
            np.diag([1e-6, 1e-6, 1.0]),
            np.diag([0.0, 0.0, 1.0]),
        ]
    )
    check_against_numpy(mats)


def test_eigh3_scaled(rng):
    # widely varying magnitudes (f32 headroom)
    a = random_sym(rng, 64) * 1e-5
    check_against_numpy(a)
    a = random_sym(rng, 64) * 1e4
    check_against_numpy(a)


def test_eigh3_ascending(rng):
    w, _ = eigh3x3(jnp.asarray(random_sym(rng, 128), jnp.float32))
    w = np.asarray(w)
    assert (np.diff(w, axis=-1) >= -1e-5).all()


def test_pca_eigh_masked_matches_dense(rng):
    pts = rng.normal(size=(1, 40, 3)).astype(np.float32)
    mask = np.ones((1, 40), bool)
    mask[0, 25:] = False
    w_m, v_m, bary_m = pca_eigh(jnp.asarray(pts), jnp.asarray(mask))
    w_d, v_d, bary_d = pca_eigh(jnp.asarray(pts[:, :25]))
    np.testing.assert_allclose(np.asarray(w_m), np.asarray(w_d), atol=1e-5)
    np.testing.assert_allclose(np.asarray(bary_m), np.asarray(bary_d), atol=1e-5)
