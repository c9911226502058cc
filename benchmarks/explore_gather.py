"""Experiment: fused candidate gather variants for grid_radius_search.

Variants timed on the bench workload (Q=4096, N=50k, k=256):
  A. current: search (idx) + separate pts/nrm gathers        [baseline]
  B. packed (N,6) pts+nrm candidate gather, in-register compaction
  C. B with approx_max_k
  D. B but values compacted via take_along_axis on slots then ONE HBM gather
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import make_terrain
from shot_fpfh_tpu.ops.grid_hash import build_grid, grid_radius_search, _candidate_slots


def timed(name, fn, *args, reps=5):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(a[0] + i.astype(jnp.float32) * 1e-7, *a[1:])
            return acc + sum(jnp.sum(l).astype(jnp.float32)
                             for l in jax.tree_util.tree_leaves(out))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    ms = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:45s} {ms:8.1f} ms/rep")


def main():
    n_support, n_keypoints, radius, k_max = 50_000, 4096, 0.9, 256
    rng = np.random.default_rng(0)
    cloud = make_terrain(n_support, rng)
    normals = rng.normal(size=(n_support, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    keypoints = cloud[rng.choice(n_support, n_keypoints, replace=False)]

    kp = jnp.asarray(keypoints)
    sup = jnp.asarray(cloud)
    nrm = jnp.asarray(normals.astype(np.float32))
    grid = build_grid(cloud, radius)
    packed = jnp.concatenate([grid.points_sorted,
                              nrm[grid.orig_idx]], axis=1)  # (N, 6) in grid order

    def variant_a(q):
        nbr = grid_radius_search(grid, q, radius, k_max)
        return sup[nbr.idx], nrm[nbr.idx], nbr.dist

    def fused(q, chunk=1024, approx=False, late_gather=False):
        qn = q.shape[0]
        r = jnp.float32(radius)

        def one_chunk(qc):
            slots, valid = _candidate_slots(grid, qc)   # (C, 27*cap)
            if late_gather:
                cand = grid.points_sorted[slots]
            else:
                cand = packed[slots]                    # (C, 27*cap, 6)
            d = jnp.linalg.norm(cand[..., :3] - qc[:, None, :], axis=-1)
            ok = valid & (d <= r)
            masked = jnp.where(ok, d, jnp.inf)
            if approx:
                neg, pos = jax.lax.approx_max_k(-masked, k_max)
            else:
                neg, pos = jax.lax.top_k(-masked, k_max)
            dist_k = -neg
            mask_k = jnp.isfinite(dist_k)
            if late_gather:
                slot_k = jnp.take_along_axis(slots, pos, axis=1)
                vals = packed[jnp.where(mask_k, slot_k, 0)]
            else:
                vals = jnp.take_along_axis(cand, pos[..., None], axis=1)
            return vals, dist_k, mask_k

        n_chunks = -(-qn // chunk)
        qpad = jnp.pad(q, ((0, n_chunks * chunk - qn), (0, 0)))
        vals, dist, mask = jax.lax.map(one_chunk, qpad.reshape(n_chunks, chunk, 3))
        return vals.reshape(-1, k_max, 6)[:qn], dist.reshape(-1, k_max)[:qn], mask.reshape(-1, k_max)[:qn]

    timed("A: search + 2 HBM gathers", variant_a, kp)
    timed("B: packed cand gather + in-reg compaction", lambda q: fused(q), kp)
    timed("C: B + approx_max_k", lambda q: fused(q, approx=True), kp)
    timed("D: pts-only cand + late packed gather", lambda q: fused(q, late_gather=True), kp)
    timed("B chunk=512", lambda q: fused(q, chunk=512), kp)
    timed("B chunk=2048", lambda q: fused(q, chunk=2048), kp)

    # sanity: B equals A
    va = variant_a(kp)
    vb = fused(kp)
    ok_pts = np.allclose(np.where(vb[2][..., None], vb[0][..., :3], 0),
                         np.where(vb[2][..., None], va[0], 0), atol=1e-6)
    ok_d = np.allclose(np.where(vb[2], vb[1], 0), np.where(vb[2], va[2], 0), atol=1e-6)
    print("B == A (points, dists):", ok_pts, ok_d)


def variant_e_factory(grid, packed, radius, k_max):
    """Compacted candidates: per-query contiguous candidate list of static size
    C27 = max 27-cell window occupancy, computed from per-cell counts."""
    import jax
    import jax.numpy as jnp

    # dense occupancy and its 3^3 box-sum max (host, once per grid)
    n = grid.points_sorted.shape[0]
    dims = np.asarray(grid.dims)
    counts = np.diff(np.asarray(grid.cell_starts))
    dense = counts.reshape(dims[0], dims[1], dims[2])
    from scipy.ndimage import uniform_filter
    box = uniform_filter(dense.astype(np.float64), size=3, mode="constant") * 27
    c27 = int(np.ceil(box.max() / 8) * 8)
    print(f"  [E] C27 = {c27} (vs 27*cap = {27 * grid.cell_cap})")

    from shot_fpfh_tpu.ops.grid_hash import _OFFSETS

    def search(q, chunk=512):
        qn = q.shape[0]
        r = jnp.float32(radius)

        def one_chunk(qc):
            qcell = jnp.floor((qc - grid.origin) / grid.cell_size).astype(jnp.int32)
            cells = qcell[:, None, :] + _OFFSETS[None, :, :]
            in_grid = jnp.all((cells >= 0) & (cells < grid.dims), axis=-1)
            linear = (cells[..., 0] * grid.dims[1] + cells[..., 1]) * grid.dims[2] + cells[..., 2]
            safe = jnp.clip(linear, 0, grid.cell_starts.shape[0] - 2)
            start = jnp.where(in_grid, grid.cell_starts[safe], 0)
            end = jnp.where(in_grid, grid.cell_starts[safe + 1], 0)
            cnt = end - start                                   # (C, 27)
            cum = jnp.cumsum(cnt, axis=1)                       # inclusive (C, 27)
            total = cum[:, -1]
            excl = cum - cnt                                    # exclusive
            j = jnp.arange(c27, dtype=jnp.int32)                # (C27,)
            # cell of candidate j = #cells whose inclusive cum <= j
            cell = jnp.sum(cum[:, None, :] <= j[None, :, None], axis=-1)  # (C, C27)
            cell_c = jnp.minimum(cell, 26)
            slot = (jnp.take_along_axis(start, cell_c, axis=1)
                    + j[None, :] - jnp.take_along_axis(excl, cell_c, axis=1))
            valid = j[None, :] < total[:, None]
            slot = jnp.where(valid, jnp.minimum(slot, n - 1), 0)
            cand = packed[slot]                                 # (C, C27, 6)
            d = jnp.linalg.norm(cand[..., :3] - qc[:, None, :], axis=-1)
            ok = valid & (d <= r)
            masked = jnp.where(ok, d, jnp.inf)
            neg, pos = jax.lax.top_k(-masked, k_max)
            dist_k = -neg
            mask_k = jnp.isfinite(dist_k)
            vals = jnp.take_along_axis(cand, pos[..., None], axis=1)
            return vals, dist_k, mask_k

        n_chunks = -(-qn // chunk)
        qpad = jnp.pad(q, ((0, n_chunks * chunk - qn), (0, 0)))
        vals, dist, mask = jax.lax.map(one_chunk, qpad.reshape(n_chunks, chunk, 3))
        return (vals.reshape(-1, k_max, 6)[:qn], dist.reshape(-1, k_max)[:qn],
                mask.reshape(-1, k_max)[:qn])

    return search


def main_e():
    import jax.numpy as jnp
    n_support, n_keypoints, radius, k_max = 50_000, 4096, 0.9, 256
    rng = np.random.default_rng(0)
    cloud = make_terrain(n_support, rng)
    normals = rng.normal(size=(n_support, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    keypoints = cloud[rng.choice(n_support, n_keypoints, replace=False)]
    kp = jnp.asarray(keypoints)
    sup = jnp.asarray(cloud)
    nrm = jnp.asarray(normals.astype(np.float32))
    grid = build_grid(cloud, radius)
    packed = jnp.concatenate([grid.points_sorted, nrm[grid.orig_idx]], axis=1)

    search_e = variant_e_factory(grid, packed, radius, k_max)
    timed("E: compacted candidates chunk=512", search_e, kp)
    timed("E chunk=1024", lambda q: search_e(q, chunk=1024), kp)

    # correctness vs A
    def variant_a(q):
        nbr = grid_radius_search(grid, q, radius, k_max)
        return sup[nbr.idx], nrm[nbr.idx], nbr.dist
    va = variant_a(kp)
    ve = search_e(kp)
    import numpy as np_
    da = np_.sort(np_.where(np_.asarray(va[2]) < np_.inf, np_.asarray(va[2]), 1e9), axis=1)
    de = np_.sort(np_.where(np_.asarray(ve[2]), np_.asarray(ve[1]), 1e9), axis=1)
    print("E == A (sorted dists):", np_.allclose(da, de, atol=1e-6))


def variant_e2_factory(grid, packed, radius, k_max, c27):
    """E2: compaction via unrolled loop over the 27 cells (lane-friendly)."""
    import jax
    import jax.numpy as jnp
    from shot_fpfh_tpu.ops.grid_hash import _OFFSETS

    n = grid.points_sorted.shape[0]

    def search(q, chunk=512, approx=False):
        qn = q.shape[0]
        r = jnp.float32(radius)

        def one_chunk(qc):
            qcell = jnp.floor((qc - grid.origin) / grid.cell_size).astype(jnp.int32)
            cells = qcell[:, None, :] + _OFFSETS[None, :, :]
            in_grid = jnp.all((cells >= 0) & (cells < grid.dims), axis=-1)
            linear = (cells[..., 0] * grid.dims[1] + cells[..., 1]) * grid.dims[2] + cells[..., 2]
            safe = jnp.clip(linear, 0, grid.cell_starts.shape[0] - 2)
            start = jnp.where(in_grid, grid.cell_starts[safe], 0)   # (C, 27)
            end = jnp.where(in_grid, grid.cell_starts[safe + 1], 0)
            cnt = end - start
            cum = jnp.cumsum(cnt, axis=1)                            # inclusive
            excl = cum - cnt
            total = cum[:, -1]
            j = jnp.arange(c27, dtype=jnp.int32)[None, :]            # (1, C27)
            # slot[q, j] = start[q, cell] + j - excl[q, cell], cell = searchsorted
            # unrolled: base = sum_c (j in run c) * (start[q,c] - excl[q,c])
            base = jnp.zeros((qc.shape[0], c27), jnp.int32)
            for c in range(27):
                inrun = (j >= excl[:, c:c+1]) & (j < cum[:, c:c+1])
                base = base + inrun * (start[:, c:c+1] - excl[:, c:c+1])
            slot = base + j
            valid = j < total[:, None]
            slot = jnp.where(valid, jnp.minimum(slot, n - 1), 0)
            cand = packed[slot]
            d = jnp.linalg.norm(cand[..., :3] - qc[:, None, :], axis=-1)
            ok = valid & (d <= r)
            masked = jnp.where(ok, d, jnp.inf)
            if approx:
                neg, pos = jax.lax.approx_max_k(-masked, k_max)
            else:
                neg, pos = jax.lax.top_k(-masked, k_max)
            dist_k = -neg
            mask_k = jnp.isfinite(dist_k)
            vals = jnp.take_along_axis(cand, pos[..., None], axis=1)
            return vals, dist_k, mask_k

        n_chunks = -(-qn // chunk)
        qpad = jnp.pad(q, ((0, n_chunks * chunk - qn), (0, 0)))
        vals, dist, mask = jax.lax.map(one_chunk, qpad.reshape(n_chunks, chunk, 3))
        return (vals.reshape(-1, k_max, 6)[:qn], dist.reshape(-1, k_max)[:qn],
                mask.reshape(-1, k_max)[:qn])

    return search


def main_e2():
    import jax.numpy as jnp
    n_support, n_keypoints, radius, k_max = 50_000, 4096, 0.9, 256
    rng = np.random.default_rng(0)
    cloud = make_terrain(n_support, rng)
    normals = rng.normal(size=(n_support, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    keypoints = cloud[rng.choice(n_support, n_keypoints, replace=False)]
    kp = jnp.asarray(keypoints)
    sup = jnp.asarray(cloud)
    nrm = jnp.asarray(normals.astype(np.float32))
    grid = build_grid(cloud, radius)
    packed = jnp.concatenate([grid.points_sorted, nrm[grid.orig_idx]], axis=1)

    dims = np.asarray(grid.dims)
    counts = np.diff(np.asarray(grid.cell_starts))
    dense = counts.reshape(dims[0], dims[1], dims[2])
    from scipy.ndimage import uniform_filter
    box = uniform_filter(dense.astype(np.float64), size=3, mode="constant") * 27
    c27 = int(np.ceil(box.max() / 8) * 8)
    print(f"  [E2] C27 = {c27}")

    search = variant_e2_factory(grid, packed, radius, k_max, c27)
    timed("E2: unrolled compaction chunk=512", search, kp)
    timed("E2 chunk=1024", lambda q: search(q, chunk=1024), kp)
    timed("E2 chunk=256", lambda q: search(q, chunk=256), kp)
    timed("E2 + approx", lambda q: search(q, approx=True), kp)

    def variant_a(q):
        nbr = grid_radius_search(grid, q, radius, k_max)
        return sup[nbr.idx], nrm[nbr.idx], nbr.dist
    va = variant_a(kp)
    ve = search(kp)
    da = np.sort(np.where(np.asarray(va[2]) < np.inf, np.asarray(va[2]), 1e9), axis=1)
    de = np.sort(np.where(np.asarray(ve[2]), np.asarray(ve[1]), 1e9), axis=1)
    print("E2 == A (sorted dists):", np.allclose(da, de, atol=1e-6))


if __name__ == "__main__":
    main_e2()
