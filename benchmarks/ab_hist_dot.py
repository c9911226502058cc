"""A/B the fused SHOT kernel's histogram-dot issue strategy on the headline
workload (round 5, SHOT_FPFH_HIST_DOT knob in ops/pallas_shot_fused.py).

The per-query factored contraction runs two tiny (11, W) x (32, W) dots per
query — ~1.5% MXU utilization, 2·qb MXU issues per grid step.  Candidates:

- concat: one (11, 2W) x (32, 2W) dot per query (half the issues)
- block:  ONE (qb·16, 2W) x (qb·32, 2W) dot per grid step (qb× redundant
  flops, 1/(2·qb) the issues; extracts the block-diagonal tiles)
- none:   ABLATION — skips the dots entirely to bound the one-hot build +
  binning cost (results are wrong; excluded from the equality check)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ab_hist_dot.py
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

    @jax.jit
    def one(kp):
        vals, d, valid, _ = window_distances(grid, kp)
        dist_inf = jnp.where(valid & (d <= radius), d, jnp.inf)
        desc, _ = shot_from_window_ff(kp, vals, dist_inf, radius,
                                      normalize=True,
                                      min_neighborhood_size=100)
        return desc

    # round-5 session 2: pair/concat/block/none measured 4.172/4.256/4.389/
    # 4.605 ms — the dots are fully OVERLAPPED (removing them is slower),
    # so the sweep moved to cutting the one-hot build's VPU elements
    # ("aside") and the grid-step count (qb, never recorded before).
    results, descs = {}, {}
    for mode, qb in (("pair", "8"), ("aside", "8"), ("pair", "16"),
                     ("aside", "16"), ("aside", "32")):
        key = f"{mode}/qb{qb}"
        os.environ["SHOT_FPFH_HIST_DOT"] = mode
        os.environ["SHOT_FPFH_SHOT_QB"] = qb
        jax.clear_caches()
        timed = rep_loop()
        float(timed(kp_j))  # compile + warm
        best = np.inf
        for shift in (0.5, 0.25, 0.125):
            t0 = time.perf_counter()
            float(timed(kp_j + shift))
            best = min(best, time.perf_counter() - t0)
        per_rep = best / reps
        results[key] = per_rep
        descs[key] = np.asarray(one(kp_j))
        print(f"{key}: {per_rep*1e3:.3f} ms/rep "
              f"({n_keypoints/per_rep:,.0f} desc/s)", flush=True)
    os.environ.pop("SHOT_FPFH_HIST_DOT", None)
    os.environ.pop("SHOT_FPFH_SHOT_QB", None)

    for key, d in descs.items():
        if key == "pair/qb8":
            continue
        dd = np.abs(d - descs["pair/qb8"]).max()
        print(f"{key} vs pair/qb8: max |diff| {dd:.2e}", flush=True)
        # aside accumulates the 4 lo contributions in f32 through the dot
        # instead of bf16 adds in b1 — bin-collision lanes round differently
        tol = 1e-2 if key.startswith("aside") else 1e-4
        assert dd < tol, "dot mode changed the descriptors"


if __name__ == "__main__":
    main()
