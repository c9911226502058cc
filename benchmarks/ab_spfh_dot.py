"""A/B the SPFH kernel's histogram-dot issue strategy on the FPFH-1M leg.

Round-5 follow-on to ab_hist_dot.py (the SHOT-side sweep): the SPFH joint
kernel issues one tiny (5, W) x (25, W) dot per query — worse MXU
utilization than even the SHOT kernel's (11, W) x (32, W).  "block" stacks
the qb per-query operands into ONE (qb·16, W) x (qb·32, W) dot per grid
step (SHOT_FPFH_HIST_DOT in ops/pallas_shot_fused.py, shared by
ops/pallas_fpfh_fused.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ab_spfh_dot.py
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax


def main():
    from shot_fpfh_tpu.models.fpfh import compute_fpfh_descriptor
    from shot_fpfh_tpu.models.normals import compute_normals
    from shot_fpfh_tpu.core.subsampling import grid_subsample
    from shot_fpfh_tpu.utils.perf import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    rng = np.random.default_rng(0)
    n = 1_000_000
    xy = rng.uniform(-10, 10, size=(n, 2)).astype(np.float32)
    z = (0.4 * np.sin(2 * xy[:, 0]) * np.cos(1.3 * xy[:, 1])
         + 0.15 * np.sin(5 * xy[:, 0] + 1.7 * xy[:, 1]))
    cloud = np.column_stack([xy, z]).astype(np.float32)
    radius = 0.35
    print("computing normals...", flush=True)
    nrm = np.asarray(compute_normals(cloud, cloud, k=30))
    kp = np.asarray(grid_subsample(cloud, 0.6))
    print(f"cloud 1M, {len(kp)} keypoints", flush=True)

    ref_out = None
    for mode in ("pair", "block"):
        os.environ["SHOT_FPFH_HIST_DOT"] = mode
        jax.clear_caches()
        fn = lambda: np.asarray(compute_fpfh_descriptor(kp, cloud, nrm, radius))
        out = fn()  # cold (compile)
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        print(f"mode={mode}: FPFH-1M warm {best:.3f}s", flush=True)
        if ref_out is None:
            ref_out = out
        else:
            err = np.abs(out[:4096] - ref_out[:4096]).max()
            print(f"  max |diff| vs pair (first 4k): {err:.2e}", flush=True)
            assert err < 1e-4, "dot mode changed the descriptors"
    os.environ.pop("SHOT_FPFH_HIST_DOT", None)


if __name__ == "__main__":
    main()
