"""A/B the fused SHOT kernel's Jacobi sweep count on the headline workload
(VERDICT r4 next #7): the LRF/binning stage owns most of the gap to the
roofline floor; each sweep is 12 serial rotations on (QB, 1) scalar planes.

Run: PYTHONPATH=/root/repo python benchmarks/ab_sweeps.py
"""

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from shot_fpfh_tpu.utils.perf import enable_compilation_cache
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    float(jnp.zeros(()).sum())

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_terrain

    rng = np.random.default_rng(0)
    n_support, n_keypoints, radius, reps = 50_000, 4096, 0.9, 100
    cloud = make_terrain(n_support, rng)
    normals = rng.normal(size=(n_support, 3))
    normals = (normals / np.linalg.norm(normals, axis=1, keepdims=True)).astype(np.float32)
    kp = cloud[rng.choice(n_support, n_keypoints, replace=False)]

    from shot_fpfh_tpu.models.shot import shot_from_window_ff
    from shot_fpfh_tpu.ops.grid_hash import build_grid, window_distances
    from shot_fpfh_tpu.registration.matching import _top_scan

    grid = build_grid(cloud, radius / 2, extras=normals, halo=2)
    kp_j = jnp.asarray(kp)

    def rep_loop():
        @jax.jit
        def timed(kp):
            def body(i, acc):
                vals, d, valid, _ = window_distances(grid, kp + i * 1e-7)
                dist_inf = jnp.where(valid & (d <= radius), d, jnp.inf)
                desc, _rfs = shot_from_window_ff(
                    kp + i * 1e-7, vals, dist_inf, radius,
                    normalize=True, min_neighborhood_size=100)
                idx, _ = _top_scan(desc, desc, jnp.ones(desc.shape[0], bool),
                                   True, False)
                return acc + jnp.sum(desc) + jnp.sum(idx).astype(jnp.float32)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        return timed

    results = {}
    for sweeps in ("4", "3", "2"):
        os.environ["SHOT_FPFH_JACOBI_SWEEPS"] = sweeps
        jax.clear_caches()
        timed = rep_loop()
        float(timed(kp_j))  # compile + warm
        best = np.inf
        for shift in (0.5, 0.25, 0.125):
            t0 = time.perf_counter()
            float(timed(kp_j + shift))
            best = min(best, time.perf_counter() - t0)
        per_rep = best / reps
        results[sweeps] = per_rep
        print(f"sweeps={sweeps}: {per_rep*1e3:.3f} ms/rep "
              f"({n_keypoints/per_rep:,.0f} desc/s)", flush=True)

    # ---- one-hot dtype A/B: does the VPU pack bf16 2x? -----------------
    os.environ["SHOT_FPFH_JACOBI_SWEEPS"] = "4"
    oh = {}
    for flag in ("0", "1"):
        os.environ["SHOT_FPFH_ONEHOT_BF16"] = flag
        jax.clear_caches()
        timed = rep_loop()
        float(timed(kp_j))
        best = np.inf
        for shift in (0.5, 0.25, 0.125):
            t0 = time.perf_counter()
            float(timed(kp_j + shift))
            best = min(best, time.perf_counter() - t0)
        oh[flag] = best / reps
        print(f"onehot_bf16={flag}: {oh[flag]*1e3:.3f} ms/rep "
              f"({n_keypoints/oh[flag]:,.0f} desc/s)", flush=True)
    os.environ["SHOT_FPFH_ONEHOT_BF16"] = "0"
    jax.clear_caches()

    # accuracy: descriptor drift vs 4 sweeps on one batch
    descs = {}
    for sweeps in ("4", "3", "2"):
        os.environ["SHOT_FPFH_JACOBI_SWEEPS"] = sweeps
        jax.clear_caches()

        @jax.jit
        def one(kp):
            vals, d, valid, _ = window_distances(grid, kp)
            dist_inf = jnp.where(valid & (d <= radius), d, jnp.inf)
            desc, rfs = shot_from_window_ff(
                kp, vals, dist_inf, radius, normalize=True,
                min_neighborhood_size=100)
            return desc, rfs

        descs[sweeps] = [np.asarray(x) for x in one(kp_j)]
    for s in ("3", "2"):
        dd = np.abs(descs[s][0] - descs["4"][0])
        dr = np.abs(descs[s][1] - descs["4"][1]).max()
        print(f"sweeps={s} vs 4: desc flip frac {(dd > 5e-3).mean():.2e}, "
              f"max {dd.max():.4f}; rfs max diff {dr:.2e}", flush=True)


if __name__ == "__main__":
    main()
