"""Bisect the fused bench body: cumulative stage timings inside ONE jit."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import make_terrain
from shot_fpfh_tpu.models.shot import local_reference_frames, shot_from_neighborhoods
from shot_fpfh_tpu.ops.grid_hash import build_grid, grid_radius_search
from shot_fpfh_tpu.registration.matching import nearest_descriptor


def main():
    n_support, n_keypoints, radius, k_max = 50_000, 4096, 0.9, 256
    reps = 5
    rng = np.random.default_rng(0)
    cloud = make_terrain(n_support, rng)
    normals = rng.normal(size=(n_support, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    keypoints = cloud[rng.choice(n_support, n_keypoints, replace=False)]

    kp = jnp.asarray(keypoints)
    sup = jnp.asarray(cloud)
    nrm = jnp.asarray(normals.astype(np.float32))
    grid = build_grid(cloud, radius)

    def upto(stage):
        def fn(q):
            nbr = grid_radius_search(grid, q, radius, k_max)
            if stage == 1:
                return nbr.dist
            nb_pts = sup[nbr.idx]
            nb_nrm = nrm[nbr.idx]
            if stage == 2:
                return nb_pts, nb_nrm, nbr.dist
            rfs = local_reference_frames(q, nb_pts, nbr.mask, radius)
            if stage == 3:
                return rfs
            desc = shot_from_neighborhoods(q, nb_pts, nb_nrm, nbr.mask, rfs, radius,
                                           normalize=True, min_neighborhood_size=100)
            if stage == 4:
                return desc
            idx, _ = nearest_descriptor(desc, desc, jnp.ones(desc.shape[0], bool))
            return desc, idx
        return fn

    names = ["search", "+gathers", "+local RF", "+shot hist", "+matching"]
    for stage, name in enumerate(names, start=1):
        fn = upto(stage)

        @jax.jit
        def loop(q, fn=fn):
            def body(i, acc):
                out = fn(q + i.astype(jnp.float32) * 1e-7)
                return acc + sum(jnp.sum(l).astype(jnp.float32)
                                 for l in jax.tree_util.tree_leaves(out))
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        float(loop(kp))
        t0 = time.perf_counter()
        float(loop(kp))
        ms = (time.perf_counter() - t0) / reps * 1000
        print(f"stage {stage} ({name:12s}) cumulative {ms:8.1f} ms/rep")


if __name__ == "__main__":
    main()
