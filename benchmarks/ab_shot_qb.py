"""A/B the fused SHOT kernel's query-block size (qb) on the headline workload.

qb sets (a) how many query rows one grid step processes (per-step issue
overhead, VMEM block sizes) and (b) the lane count of the in-kernel Jacobi
LRF's (qb, 1) scalar planes — at the round-4 default qb=8 each of the ~48
serial Jacobi plane ops uses 8 of 1024 VPU lanes, so the measured 0.43 ms
Jacobi cost (ROOFLINE round-5) should shrink ~linearly with qb until the
one-hot stage's VMEM pressure pushes back.  Never swept before round 5.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ab_shot_qb.py
Sets SHOT_FPFH_SHOT_QB per setting; asserts descriptor equality across
settings (blocking changes batching, not math).
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

    results, descs = {}, {}
    # qb must be a multiple of 8 (Mosaic sublane divisibility on the
    # (qb, W) blocks)
    for qb in ("8", "16", "32", "64"):
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
        results[qb] = per_rep
        descs[qb] = np.asarray(one(kp_j))
        print(f"qb={qb}: {per_rep*1e3:.3f} ms/rep "
              f"({n_keypoints/per_rep:,.0f} desc/s)", flush=True)
    os.environ.pop("SHOT_FPFH_SHOT_QB", None)

    for qb, d in descs.items():
        if qb == "8":
            continue
        dd = np.abs(d - descs["8"]).max()
        print(f"qb={qb} vs 8: max |diff| {dd:.2e}", flush=True)
        assert dd < 1e-4, "qb changed the descriptors"


if __name__ == "__main__":
    main()
