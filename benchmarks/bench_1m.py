"""BASELINE.json config #3: ~1M-point single-chip run, stage-timed.

Full pipeline on a synthetic 1M-point terrain pair with a known rigid
transform: normals -> grid-subsampled keypoints -> SHOT -> matching ->
RANSAC -> ICP.  Reports cold (compile-inclusive) and warm per-stage
wall-clock and the final alignment error.

Keypoint sets are padded to a multiple of 1024 with a far-away sentinel
point (empty neighborhood -> all-zero descriptor -> dropped by matching's
zero-row filter), so scan and ref share every compiled program.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_FAR = 1.0e6


def pad_points(pts: np.ndarray, multiple: int) -> np.ndarray:
    n = len(pts)
    padded = ((n + multiple - 1) // multiple) * multiple
    if padded == n:
        return pts
    pad = np.full((padded - n, 3), _FAR, pts.dtype)
    return np.concatenate([pts, pad])


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import make_terrain, log
    from shot_fpfh_tpu.core import grid_subsample
    from shot_fpfh_tpu.models.normals import compute_normals
    from shot_fpfh_tpu.models.shot import compute_shot_descriptor
    from shot_fpfh_tpu.registration.matching import match_descriptors
    from shot_fpfh_tpu.registration.ransac import ransac_on_matches
    from shot_fpfh_tpu.registration.icp import icp_point_to_plane

    n = int(os.environ.get("BENCH1M_N", 1_000_000))
    radius = float(os.environ.get("BENCH1M_RADIUS", 0.6))
    voxel = float(os.environ.get("BENCH1M_VOXEL", 0.9))
    k_max = int(os.environ.get("BENCH1M_K_MAX", 384))

    rng = np.random.default_rng(7)
    # multi-octave sinusoid surface: distinctive local geometry everywhere
    # (Gaussian bumps are rotationally symmetric -> degenerate SHOT frames)
    xy = rng.uniform(-20, 20, size=(n, 2)).astype(np.float32)
    z = (0.8 * np.sin(0.9 * xy[:, 0]) * np.cos(0.7 * xy[:, 1])
         + 0.4 * np.sin(2.1 * xy[:, 0] + 1.0) * np.cos(1.7 * xy[:, 1] + 0.5)
         + 0.15 * np.sin(4.3 * xy[:, 0] + 2.0) * np.cos(3.9 * xy[:, 1] + 1.5))
    ref = np.column_stack([xy, z]).astype(np.float32)
    ref += rng.normal(scale=0.005, size=ref.shape).astype(np.float32)
    from scipy.spatial.transform import Rotation
    R = Rotation.from_euler("xyz", [0.2, -0.1, 0.4]).as_matrix().astype(np.float32)
    t = np.array([0.8, -0.5, 0.3], np.float32)
    scan = (ref - t) @ R

    cold, warm = {}, {}

    def timed(name, fn, rerun=True):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        cold[name] = time.perf_counter() - t0
        if rerun:
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            warm[name] = time.perf_counter() - t0
        log(f"{name:24s} cold {cold[name]:7.2f}s"
            + (f"  warm {warm[name]:7.2f}s" if rerun else ""))
        return out

    nr = np.asarray(timed("normals (1M)", lambda: compute_normals(ref, ref, k=20)))
    t0 = time.perf_counter()
    ns = np.asarray(compute_normals(scan, scan, k=20))
    log(f"{'normals scan (reuse)':24s} {time.perf_counter() - t0:7.2f}s")

    kp_r_idx = timed("keypoints", lambda: grid_subsample(ref, voxel))
    kp_s_idx = np.asarray(grid_subsample(scan, voxel))
    kp_r = pad_points(ref[np.asarray(kp_r_idx)], 1024)
    kp_s = pad_points(scan[kp_s_idx], 1024)
    log(f"keypoints: ref {len(kp_r_idx)} scan {len(kp_s_idx)} -> padded {len(kp_r)}/{len(kp_s)}")

    dr = timed("SHOT (1M support)", lambda: compute_shot_descriptor(
        kp_r, ref, nr, radius, k_max=k_max, min_neighborhood_size=30)[0])
    t0 = time.perf_counter()
    ds, _ = compute_shot_descriptor(kp_s, scan, ns, radius, k_max=k_max,
                                    min_neighborhood_size=30)
    jax.block_until_ready(ds)
    log(f"{'SHOT scan (reuse)':24s} {time.perf_counter() - t0:7.2f}s")
    log(f"valid descriptors: ref {float((np.abs(np.asarray(dr)).sum(1) > 0).mean()):.2f} "
        f"scan {float((np.abs(np.asarray(ds)).sum(1) > 0).mean()):.2f}")

    def do_match():
        return match_descriptors(ds, dr, verbose=False)
    scan_idx, ref_idx = timed("matching", do_match)

    sm_np = np.asarray(kp_s)[np.asarray(scan_idx)]
    rm_np = np.asarray(kp_r)[np.asarray(ref_idx)]
    # ground-truth diagnostic: a correct match's representatives sit within
    # ~voxel of each other under the exact transform
    resid = np.linalg.norm(sm_np @ R.T + t - rm_np, axis=1)
    log(f"matches: {len(sm_np)}; ground-truth-consistent (< voxel): "
        f"{float((resid < voxel).mean()):.2%} (median resid {np.median(resid):.2f})")

    sm, rm = jnp.asarray(sm_np), jnp.asarray(rm_np)
    t0 = time.perf_counter()
    # inlier threshold ~ keypoint voxel: matched grid representatives differ
    # by up to ~voxel even for perfect correspondences
    ratio, T = ransac_on_matches(sm, rm, jax.random.key(0), n_draws=10_000,
                                 draw_size=4, distance_threshold=voxel)
    jax.block_until_ready(T.rotation)
    cold["ransac"] = time.perf_counter() - t0
    log(f"{'ransac (10k draws)':24s} cold {cold['ransac']:7.2f}s (inlier ratio {float(ratio):.2f})")

    t0 = time.perf_counter()
    T_icp, rms, conv, _n_iters = icp_point_to_plane(scan, ref, nr, T, d_max=0.5,
                                          max_iter=30, rms_threshold=1e-6,
                                          voxel_size=0.5)
    jax.block_until_ready(T_icp.rotation)
    cold["icp"] = time.perf_counter() - t0
    log(f"{'icp point-to-plane':24s} cold {cold['icp']:7.2f}s (rms {float(rms):.2e}, converged {bool(conv)})")

    aligned = np.asarray(T_icp.apply(jnp.asarray(scan[::41])))
    rmse = float(np.sqrt(np.mean(np.sum((aligned - ref[::41]) ** 2, axis=1))))
    log(f"alignment RMSE {rmse:.2e} | rot err "
        f"{float(np.degrees(np.arccos(np.clip((np.trace(np.asarray(T_icp.rotation) @ R.T) - 1) / 2, -1, 1)))):.4f} deg")
    print({"n_points": n, "rmse": rmse,
           "cold_s": {k: round(v, 2) for k, v in cold.items()},
           "warm_s": {k: round(v, 2) for k, v in warm.items()}})


if __name__ == "__main__":
    main()
