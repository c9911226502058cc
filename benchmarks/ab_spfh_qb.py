"""A/B the fused SPFH kernel's query-block size (qb) on the FPFH-1M leg.

ROOFLINE "FPFH 1M": the SPFH window pass is ~4x above its fetch+traffic
floor, VPU-bound in the in-kernel Darboux/binning over (qb, W~900) planes.
qb sets how many query rows one grid step processes: larger blocks mean
fewer grid steps (less per-step issue overhead, better DMA/compute overlap),
at the cost of bigger VMEM blocks (vals block = qb x F x W x 4 B).  qb=8 was
the round-4 default, never swept.

Run: PYTHONPATH=/root/repo python benchmarks/ab_spfh_qb.py
Sets SHOT_FPFH_SPFH_QB per setting and clears jit caches in between;
asserts descriptor equality across settings on the first 4k rows.
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from shot_fpfh_tpu.models.fpfh import compute_fpfh_descriptor
    from shot_fpfh_tpu.models.normals import compute_normals
    from shot_fpfh_tpu.core.subsampling import grid_subsample

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
    # qb must be a multiple of 8 (Mosaic sublane divisibility on the
    # (qb, W) blocks)
    for qb in ("8", "16", "32"):
        os.environ["SHOT_FPFH_SPFH_QB"] = qb
        jax.clear_caches()
        fn = lambda: np.asarray(compute_fpfh_descriptor(kp, cloud, nrm, radius))
        out = fn()  # cold (compile)
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"qb={qb}: FPFH-1M warm {dt:.3f}s", flush=True)
        if ref_out is None:
            ref_out = out
        else:
            err = np.abs(out[:4096] - ref_out[:4096]).max()
            print(f"  max |diff| vs qb=8 (first 4k): {err:.2e}", flush=True)
            assert err < 1e-4, "qb changed the descriptors"
    os.environ.pop("SHOT_FPFH_SPFH_QB", None)


if __name__ == "__main__":
    main()
