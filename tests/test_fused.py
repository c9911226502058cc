import numpy as np
import jax
import jax.numpy as jnp

from shot_fpfh_tpu.core import rotation_angle
from shot_fpfh_tpu.models import compute_normals
from shot_fpfh_tpu.registration.fused import register_pair
from tests.test_pipeline import make_pair


def test_fused_registration_recovers_ground_truth(rng):
    scan, ref, exact = make_pair(rng, n=2500)
    scan_n = np.asarray(compute_normals(scan, scan, k=20))
    ref_n = np.asarray(compute_normals(ref, ref, k=20))
    res = register_pair(
        scan, scan_n, ref, ref_n,
        keypoint_voxel=0.25, icp_voxel=0.1, radius=0.5,
        ratio_threshold=0.9, ransac_threshold=0.3, d_max=0.3,
        k_max=256, min_neighborhood_size=10, n_draws=1536, max_iter=40,
    )
    ang = float(rotation_angle(res.icp_transform.rotation, exact.rotation))
    terr = float(jnp.linalg.norm(res.icp_transform.translation - exact.translation))
    assert int(res.n_matches) > 20
    assert ang < 0.02, f"fused pipeline rotation error {np.degrees(ang):.2f} deg"
    assert terr < 0.05


def test_fused_is_single_program(rng):
    """The full pipeline must trace into one jitted computation."""
    from shot_fpfh_tpu.registration.fused import fused_registration

    scan, ref, _ = make_pair(rng, n=600)
    scan_n = np.asarray(compute_normals(scan, scan, k=10))
    ref_n = np.asarray(compute_normals(ref, ref, k=10))
    kp = jnp.asarray(scan[:64], jnp.float32)
    rkp = jnp.asarray(ref[:64], jnp.float32)
    valid = jnp.ones(64, bool)
    sub = jnp.asarray(scan[::4], jnp.float32)
    lowered = fused_registration.lower(
        kp, valid, rkp, valid,
        jnp.asarray(scan, jnp.float32), jnp.asarray(scan_n, jnp.float32),
        jnp.asarray(ref, jnp.float32), jnp.asarray(ref_n, jnp.float32),
        sub, jnp.ones(len(sub), bool), jax.random.key(0),
        radius=0.5, k_max=64, min_neighborhood_size=5, n_draws=256, max_iter=5,
    )
    text = lowered.as_text()
    assert "while" in text  # the ICP loop is inside the single program
