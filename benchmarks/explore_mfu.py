"""Break down the 21 ms descriptor leg (search / top-k / LRF / histogram /
matching) and test the no-top-k full-window formulation.

Hypothesis from DESIGN.md measurements: the candidate gather (~3.1M rows at
~0.3M rows/ms) + top_k dominate; SHOT is radius-based so the k-nearest
selection is unnecessary — LRF + histogram can consume the full masked
candidate window directly.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from shot_fpfh_tpu.utils.perf import enable_compilation_cache

enable_compilation_cache()

from bench import make_terrain
from shot_fpfh_tpu.models.shot import local_reference_frames, shot_from_neighborhoods
from shot_fpfh_tpu.ops.grid_hash import (
    _compacted_slots,
    build_grid,
    grid_radius_search,
)
from shot_fpfh_tpu.registration.matching import nearest_descriptor

REPS = 50


def timed(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(*((a[0] + i * 1e-7,) + a[1:]))
            return acc + jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    float(loop(*args))  # compile
    best = np.inf
    for s in (0.5, 0.25):
        t0 = time.perf_counter()
        float(loop(*((args[0] + s,) + args[1:])))
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{name:46s} {best*1e3:8.2f} ms/rep", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    n_support, n_kp, radius, k_max = 50_000, 4096, 0.9, 256
    cloud = make_terrain(n_support, rng)
    nrm = rng.normal(size=(n_support, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    kp = jnp.asarray(cloud[rng.choice(n_support, n_kp, replace=False)])

    float(jnp.zeros(()).sum())  # tunnel warmup
    grid = build_grid(cloud, radius / 2, extras=nrm, halo=2)
    W = grid.window_cap
    print(f"window_cap={W}, cell_cap={grid.cell_cap}, k_max={k_max}")

    # --- components -------------------------------------------------------
    def slots_only(q):
        s, v = _compacted_slots(grid, q)
        return s.astype(jnp.float32)

    def fetch_window(q):
        """Gather candidates + distance + mask, NO top-k (full width)."""
        slots, valid = _compacted_slots(grid, q)
        cand = grid.packed_sorted[slots]
        dist = jnp.linalg.norm(cand[..., :3] - q[:, None, :], axis=-1)
        ok = valid & (dist <= radius)
        return cand, dist, ok

    def search_full(q):
        return grid_radius_search(grid, q, radius, k_max, with_values=True)[1]

    def shot_full_pipeline(q):
        nbr, vals = grid_radius_search(grid, q, radius, k_max, with_values=True)
        rfs = local_reference_frames(q, vals[..., :3], nbr.mask, radius)
        desc = shot_from_neighborhoods(
            q, vals[..., :3], vals[..., 3:6], nbr.mask, rfs, radius,
            normalize=True, min_neighborhood_size=100)
        idx, _ = nearest_descriptor(desc, desc, jnp.ones(desc.shape[0], bool))
        return desc

    def shot_window_pipeline(q):
        """No top-k: LRF + histogram over the full masked window."""
        cand, dist, ok = fetch_window(q)
        pts = jnp.where(ok[..., None], cand[..., :3], 0.0)
        nrms = jnp.where(ok[..., None], cand[..., 3:6], 0.0)
        rfs = local_reference_frames(q, pts, ok, radius)
        desc = shot_from_neighborhoods(
            q, pts, nrms, ok, rfs, radius,
            normalize=True, min_neighborhood_size=100)
        idx, _ = nearest_descriptor(desc, desc, jnp.ones(desc.shape[0], bool))
        return desc

    timed("slots only (index math)", slots_only, kp)
    timed("fetch window (gather+dist, no topk)", fetch_window, kp)
    timed("search full (gather+dist+topk+compact)", search_full, kp)
    timed("FULL pipeline (search+LRF+hist+match)", shot_full_pipeline, kp)
    timed("WINDOW pipeline (no topk, full-width hist)", shot_window_pipeline, kp)

    # parity check between the two pipelines
    a = jax.jit(shot_full_pipeline)(kp)
    b = jax.jit(shot_window_pipeline)(kp)
    # the k_max=256 cap truncates dense neighborhoods; count rows where the
    # window path (exact, uncapped) differs
    diff = np.abs(np.asarray(a) - np.asarray(b)).max(axis=1)
    print(f"desc diff: max {diff.max():.2e}, rows>1e-3: {(diff > 1e-3).sum()}/{n_kp}")


def extra():
    rng = np.random.default_rng(0)
    n_support, n_kp, radius, k_max = 50_000, 4096, 0.9, 256
    cloud = make_terrain(n_support, rng)
    nrm = rng.normal(size=(n_support, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    kp = jnp.asarray(cloud[rng.choice(n_support, n_kp, replace=False)])
    float(jnp.zeros(()).sum())

    grid = build_grid(cloud, radius / 2, extras=nrm, halo=2)

    def shot_approx_pipeline(q):
        nbr, vals = grid_radius_search(grid, q, radius, k_max,
                                       with_values=True, approx=True)
        rfs = local_reference_frames(q, vals[..., :3], nbr.mask, radius)
        desc = shot_from_neighborhoods(
            q, vals[..., :3], vals[..., 3:6], nbr.mask, rfs, radius,
            normalize=True, min_neighborhood_size=100)
        idx, _ = nearest_descriptor(desc, desc, jnp.ones(desc.shape[0], bool))
        return desc

    timed("FULL pipeline with approx_max_k", shot_approx_pipeline, kp)

    # ---- gather-of-slices over halo-1 z-column runs ----------------------
    from shot_fpfh_tpu.ops.grid_hash import _zcolumn_runs

    grid1 = build_grid(cloud, radius, extras=nrm, halo=1)
    start, end = jax.jit(lambda q: _zcolumn_runs(grid1, q))(kp)
    L = int(np.ceil(int(np.asarray(end - start).max()) / 64) * 64)
    print(f"halo1: col run cap L={L}, width 9L={9*L} (vs window {grid.window_cap})")
    packed = grid1.packed_sorted  # (N, 9) wait: (N, 3+F)
    npts = packed.shape[0]

    def fetch_slices(q):
        s, e = _zcolumn_runs(grid1, q)
        s = jnp.minimum(s, npts - L)
        def per_run(s1):
            return jax.lax.dynamic_slice(packed, (s1, 0), (L, packed.shape[1]))
        vals = jax.vmap(jax.vmap(per_run))(jnp.maximum(s, 0))  # (Q, 9, L, 8)
        return vals

    def fetch_slices_dist(q):
        s, e = _zcolumn_runs(grid1, q)
        sc = jnp.maximum(jnp.minimum(s, npts - L), 0)
        def per_run(s1):
            return jax.lax.dynamic_slice(packed, (s1, 0), (L, packed.shape[1]))
        vals = jax.vmap(jax.vmap(per_run))(sc)  # (Q, 9, L, C)
        pos = sc[..., None] + jnp.arange(L)[None, None, :]
        ok = (pos >= s[..., None]) & (pos < e[..., None])
        d = jnp.linalg.norm(vals[..., :3] - q[:, None, None, :], axis=-1)
        ok = ok & (d <= radius)
        return vals, d, ok

    def slices_pipeline(q):
        vals, d, ok = fetch_slices_dist(q)
        W = 9 * L
        vals = vals.reshape(q.shape[0], W, -1)
        d = d.reshape(q.shape[0], W)
        ok = ok.reshape(q.shape[0], W)
        masked = jnp.where(ok, d, jnp.inf)
        neg, pos = jax.lax.approx_max_k(-masked, k_max)
        mask_k = jnp.isfinite(-neg)
        vals_k = jnp.take_along_axis(vals, pos[..., None], axis=1)
        vals_k = jnp.where(mask_k[..., None], vals_k, 0.0)
        rfs = local_reference_frames(q, vals_k[..., :3], mask_k, radius)
        desc = shot_from_neighborhoods(
            q, vals_k[..., :3], vals_k[..., 3:6], mask_k, rfs, radius,
            normalize=True, min_neighborhood_size=100)
        idx, _ = nearest_descriptor(desc, desc, jnp.ones(desc.shape[0], bool))
        return desc

    timed("fetch slices only (halo1 9 runs)", fetch_slices, kp)
    timed("fetch slices + dist + mask", fetch_slices_dist, kp)
    timed("SLICES pipeline (approx sel + hist)", slices_pipeline, kp)




def pallas_variant():
    rng = np.random.default_rng(0)
    n_support, n_kp, radius, k_max = 50_000, 4096, 0.9, 256
    cloud = make_terrain(n_support, rng)
    nrm = rng.normal(size=(n_support, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    kp = jnp.asarray(cloud[rng.choice(n_support, n_kp, replace=False)])
    float(jnp.zeros(()).sum())

    from shot_fpfh_tpu.ops.pallas_radius import fetch_windows_pallas

    grid1 = build_grid(cloud, radius, extras=nrm, halo=1)

    def fetch_only(q):
        return fetch_windows_pallas(grid1, q, radius)

    from shot_fpfh_tpu.models.shot import shot_from_window_ff

    def pallas_pipeline(q):
        vals, dist = fetch_windows_pallas(grid1, q, radius)
        desc, _rfs = shot_from_window_ff(q, vals, dist, radius,
                                         normalize=True, min_neighborhood_size=100)
        idx, _ = nearest_descriptor(desc, desc, jnp.ones(desc.shape[0], bool))
        return desc

    timed("pallas fetch only (run-DMA dense window)", fetch_only, kp)
    timed("PALLAS pipeline (DMA fetch + hist, exact)", pallas_pipeline, kp)

    # parity vs the exact (uncapped) XLA window pipeline
    grid2 = build_grid(cloud, radius / 2, extras=nrm, halo=2)

    def window_ref(q):
        slots, valid = _compacted_slots(grid2, q)
        cand = grid2.packed_sorted[slots]
        dist = jnp.linalg.norm(cand[..., :3] - q[:, None, :], axis=-1)
        ok = valid & (dist <= radius)
        pts = jnp.where(ok[..., None], cand[..., :3], 0.0)
        nrms = jnp.where(ok[..., None], cand[..., 3:6], 0.0)
        rfs = local_reference_frames(q, pts, ok, radius)
        return shot_from_neighborhoods(
            q, pts, nrms, ok, rfs, radius,
            normalize=True, min_neighborhood_size=100)

    timed("WINDOW pipeline v2 (4-term hist)", lambda q: window_ref(q), kp)
    a = jax.jit(pallas_pipeline)(kp[:1024])
    b = jax.jit(window_ref)(kp[:1024])
    diff = np.abs(np.asarray(a) - np.asarray(b)).max()
    print(f"pallas vs xla window desc diff: {diff:.2e}")


if __name__ == "__main__":
    pallas_variant()
