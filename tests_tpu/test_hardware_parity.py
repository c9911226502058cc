"""Pallas kernels vs XLA on REAL TPU hardware.

The CPU suite exercises these kernels through the Pallas interpreter, which
does not verify the Mosaic lowering constraints the kernels work around
(SMEM scalar reads, i1 selects, custom atan2, DMA lane alignment).  These
tests assert kernel-vs-XLA agreement on hardware so a silent Mosaic
regression fails loudly (ADVICE r1 #4).
"""

import numpy as np
import jax.numpy as jnp


def _cloud(n=20000, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-6, 6, size=(n, 2))
    z = 0.5 * np.sin(xy[:, 0]) * np.cos(1.3 * xy[:, 1])
    pts = np.column_stack([xy, z]) + rng.normal(scale=0.01, size=(n, 3))
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    return pts.astype(np.float32), nrm.astype(np.float32)


def test_radius_pca_pallas_matches_xla_on_tpu():
    from shot_fpfh_tpu.ops.grid_hash import build_grid, grid_radius_pca
    from shot_fpfh_tpu.ops.pallas_radius import radius_pca_pallas

    pts, nrm = _cloud()
    radius = 0.7
    grid = build_grid(pts, radius)
    q = jnp.asarray(pts[:2048])
    cov_p, bary_p, cnt_p = radius_pca_pallas(grid, q, radius)
    cov_x, bary_x, cnt_x = grid_radius_pca(grid, q, radius)
    np.testing.assert_array_equal(np.asarray(cnt_p), np.asarray(cnt_x))
    np.testing.assert_allclose(np.asarray(bary_p), np.asarray(bary_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cov_p), np.asarray(cov_x), atol=1e-4)


def test_radius_pca_pallas_vector_radius_on_tpu():
    # per-query radii ride in qpos lane 3 (SMEM scalar read) — verify the
    # Mosaic lowering honors them like the interpreter does
    from shot_fpfh_tpu.ops.grid_hash import build_grid, grid_radius_pca
    from shot_fpfh_tpu.ops.pallas_radius import radius_pca_pallas

    pts, _ = _cloud(n=12000, seed=5)
    grid = build_grid(pts, 0.7)
    q = jnp.asarray(pts[:1024])
    rng = np.random.default_rng(9)
    radii = np.asarray(rng.uniform(0.15, 0.7, size=1024), np.float32)
    cov_p, bary_p, cnt_p = radius_pca_pallas(grid, q, radii)
    cov_x, bary_x, cnt_x = grid_radius_pca(grid, q, radii)
    np.testing.assert_array_equal(np.asarray(cnt_p), np.asarray(cnt_x))
    np.testing.assert_allclose(np.asarray(bary_p), np.asarray(bary_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cov_p), np.asarray(cov_x), atol=1e-4)


def test_radius_search_pallas_matches_xla_on_tpu():
    from shot_fpfh_tpu.ops.grid_hash import build_grid, grid_radius_search
    from shot_fpfh_tpu.ops.pallas_radius import grid_radius_search_pallas

    pts, nrm = _cloud(n=15000, seed=1)
    radius = 0.6
    grid = build_grid(pts, radius, extras=nrm)
    q = jnp.asarray(pts[:1024])
    a, va = grid_radius_search(grid, q, radius, 64, with_values=True)
    b, vb = grid_radius_search_pallas(grid, q, radius, 64, with_values=True)
    # same candidate set: compare sorted (idx, dist) pairs per query
    np.testing.assert_array_equal(
        np.asarray(a.mask).sum(axis=1), np.asarray(b.mask).sum(axis=1)
    )
    for arr_a, arr_b in ((a.dist, b.dist),):
        np.testing.assert_allclose(
            np.sort(np.asarray(arr_a), axis=1),
            np.sort(np.asarray(arr_b), axis=1),
            atol=1e-5,
        )


def test_match_kernel_matches_xla_on_tpu():
    """The fused matmul+top-2 matching kernel (ops/pallas_match.py, round 5,
    replacing the retired three-pass SHOT oracle's slot in this suite) vs
    the XLA tile scan at both precisions — exact at f32, near-tie-only
    index drift at bf16."""
    from shot_fpfh_tpu.ops.pallas_match import top2_matmul_pallas
    from shot_fpfh_tpu.registration.matching import _top_scan

    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(1500, 352)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(6000, 352)).astype(np.float32))
    valid = np.ones(6000, bool)
    valid[17] = valid[5101] = False
    v = jnp.asarray(valid)
    for bf16 in (False, True):
        i_x, d1_x, d2_x = _top_scan(a, b, v, bf16, True)
        i_p, d1_p, d2_p = top2_matmul_pallas(a, b, v, use_bf16=bf16)
        agree = float(np.mean(np.asarray(i_p) == np.asarray(i_x)))
        assert agree >= (1.0 if not bf16 else 0.97), (bf16, agree)
        np.testing.assert_allclose(np.asarray(d1_p), np.asarray(d1_x),
                                   rtol=2e-3 if bf16 else 1e-4)
        np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2_x),
                                   rtol=2e-3 if bf16 else 1e-4)
        assert 17 not in np.asarray(i_p) and 5101 not in np.asarray(i_p)


def _window_case(seed=3, q=64, w=256, radius=0.8):
    rng = np.random.default_rng(seed)
    kp = rng.normal(size=(q, 3)).astype(np.float32)
    pts = kp[:, None, :] + rng.normal(scale=0.4, size=(q, w, 3)).astype(np.float32)
    nrm = rng.normal(size=(q, w, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    vals_ff = np.moveaxis(
        np.concatenate([pts, nrm, np.zeros((q, w, 2))], axis=-1), 1, 2
    ).astype(np.float32)
    d = np.linalg.norm(pts - kp[:, None, :], axis=-1)
    keep = (d <= radius) & (rng.uniform(size=(q, w)) > 0.1)
    dist_inf = np.where(keep, d, np.inf).astype(np.float32)
    return kp, vals_ff, dist_inf


def test_fused_shot_kernel_matches_xla_on_tpu():
    from shot_fpfh_tpu.models import shot as ms
    from shot_fpfh_tpu.ops.pallas_shot_fused import shot_binning_histogram

    kp, vals_ff, dist_inf = _window_case()
    radius = 0.8
    ok = jnp.isfinite(jnp.asarray(dist_inf))
    centered = jnp.where(ok[:, None, :],
                         jnp.asarray(vals_ff[:, :3, :]) - kp[:, :, None], 0.0)
    rho = jnp.where(ok, jnp.asarray(dist_inf), 0.0)
    rfs = ms._local_rfs_ff(centered, rho, ok, radius)
    # rfs-given: histogram parity vs the XLA accumulation
    local = jnp.einsum("qiw,qij->qjw", centered, rfs)
    nrms = jnp.where(ok[:, None, :], jnp.asarray(vals_ff[:, 3:6, :]), 0.0)
    cosine = jnp.clip(jnp.einsum("qiw,qi->qw", nrms, rfs[..., :, 2]), -1, 1)
    ref = ms._shot_accumulate(local[:, 0], local[:, 1], local[:, 2], rho,
                              cosine, ok & (rho > 0), radius, False, -1)
    got = shot_binning_histogram(jnp.asarray(vals_ff), jnp.asarray(dist_inf),
                                 jnp.asarray(kp), rfs, radius)
    # The XLA path quantizes the histogram weights to bf16 for MXU rate
    # (models/shot.py::_shot_accumulate); the kernel keeps f32 (Mosaic
    # rejects bf16 lhs in its dot orientation).  Parity therefore holds to
    # bf16 precision of the *baseline*, not f32: rtol ~ 2^-8.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3, rtol=1e-2)
    # in-kernel LRF: frame parity vs the XLA eigh path
    got2, rfs_k = shot_binning_histogram(
        jnp.asarray(vals_ff), jnp.asarray(dist_inf), jnp.asarray(kp), None,
        radius,
    )
    np.testing.assert_allclose(np.asarray(rfs_k), np.asarray(rfs), atol=5e-4)
    assert np.abs(np.asarray(got2)).sum() > 0


def test_fused_shot_kernel_non_tile_width_on_tpu():
    # W not a multiple of the 128-lane tile: Mosaic must pad, not mislower
    from shot_fpfh_tpu.ops.pallas_shot_fused import shot_binning_histogram

    kp, vals_ff, dist_inf = _window_case(seed=6, q=24, w=96)
    hist, rfs_k = shot_binning_histogram(
        jnp.asarray(vals_ff), jnp.asarray(dist_inf), jnp.asarray(kp), None,
        0.8,
    )
    hist_i, rfs_i = shot_binning_histogram(
        jnp.asarray(vals_ff), jnp.asarray(dist_inf), jnp.asarray(kp), None,
        0.8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(rfs_k), np.asarray(rfs_i),
                               atol=5e-4)
    # Mosaic's f32 transcendentals (rsqrt in the LRF, atan2 in the azimuth)
    # differ by ulps from interpret mode, so points sitting exactly on a bin
    # boundary flip bins: a handful of elements move by a full interpolation
    # weight.  Bound the flip *rate* and require per-query mass conservation
    # instead of elementwise equality.  Calibration: 6/8448 = 0.07% with f32
    # one-hots (round 4); the round-5 bf16 one-hot default
    # (SHOT_FPFH_ONEHOT_BF16) quantizes the interpolation weights, so ulp
    # differences flip the bf16 rounding decision more often — measured
    # 0.34% on hardware (f32 mode re-verified at the old rate the same day).
    dd = np.abs(np.asarray(hist) - np.asarray(hist_i))
    assert (dd > 5e-3).mean() <= 6e-3, (dd.max(), (dd > 5e-3).mean())
    np.testing.assert_allclose(np.asarray(hist).sum(axis=1),
                               np.asarray(hist_i).sum(axis=1), rtol=1e-3)


def test_fused_spfh_kernel_matches_xla_on_tpu():
    from shot_fpfh_tpu.models.fpfh import _spfh_from_values
    from shot_fpfh_tpu.ops.pallas_fpfh_fused import spfh_histogram

    kp, vals_ff, dist_inf = _window_case(seed=4, q=48, w=128)
    rng = np.random.default_rng(5)
    qn = rng.normal(size=(48, 3))
    qn = (qn / np.linalg.norm(qn, axis=-1, keepdims=True)).astype(np.float32)
    ok = np.isfinite(dist_inf)
    p_j = np.moveaxis(vals_ff[:, :3, :], 1, 2)
    n_j = np.moveaxis(vals_ff[:, 3:6, :], 1, 2)
    d = np.where(ok, dist_inf, 0.0).astype(np.float32)
    count = np.maximum(ok.sum(axis=-1), 1).astype(np.float32)
    for decorrelated in (False, True):
        ref = np.asarray(_spfh_from_values(
            jnp.asarray(kp), jnp.asarray(qn), jnp.asarray(p_j),
            jnp.asarray(n_j), jnp.asarray(d), jnp.asarray(ok), 0.8, 5,
            decorrelated,
        )) * count[:, None]
        got = spfh_histogram(jnp.asarray(vals_ff), jnp.asarray(dist_inf),
                             jnp.asarray(kp), jnp.asarray(qn), 5,
                             decorrelated)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_dma_shot_kernel_matches_xla_on_tpu():
    # first Mosaic lowering of the run-DMA fused SHOT kernel: run-copy DMAs +
    # in-kernel LRF/binning/histogram vs the XLA window path
    from shot_fpfh_tpu.models.shot import shot_from_window_ff
    from shot_fpfh_tpu.ops.grid_hash import build_grid, window_distances
    from shot_fpfh_tpu.ops.pallas_shot_dma import shot_descriptor_dma

    pts, nrm = _cloud(n=20000, seed=7)
    radius = 0.8
    grid = build_grid(pts, radius / 2, extras=nrm, halo=2)
    assert grid.use_xyrow and grid.xyrow_run_cap > 0
    q = jnp.asarray(pts[:512])
    vals, d, ok, _ = window_distances(grid, q)
    dist_inf = jnp.where(ok & (d <= radius), d, jnp.inf)
    ref_desc, ref_rfs = shot_from_window_ff(
        q, vals, dist_inf, radius, normalize=True, min_neighborhood_size=30)
    dma_desc, dma_rfs = shot_descriptor_dma(grid, q, radius,
                                            min_neighborhood_size=30)
    np.testing.assert_allclose(np.asarray(dma_rfs), np.asarray(ref_rfs),
                               atol=5e-4)
    dd = np.abs(np.asarray(dma_desc) - np.asarray(ref_desc))
    # bin-edge flips from ulp-level f32 differences between Mosaic and the
    # XLA path (measured flip rate 0.14% on the round-4 hardware run)
    assert (dd > 5e-3).mean() <= 3e-3 and dd.max() <= 0.1, (
        dd.max(), (dd > 5e-3).mean())


def test_dma_shot_kernel_shared_and_biscale_on_tpu():
    # the other two DMA-kernel modes: shared multiscale frames (binning only)
    # and bi-scale frame radii over the same streamed window
    from shot_fpfh_tpu.models.shot import shot_from_window_ff
    from shot_fpfh_tpu.ops.grid_hash import build_grid, window_distances
    from shot_fpfh_tpu.ops.pallas_shot_dma import shot_descriptor_dma

    pts, nrm = _cloud(n=15000, seed=8)
    radius, rf_radius = 0.8, 0.45
    grid = build_grid(pts, radius / 2, extras=nrm, halo=2)
    q = jnp.asarray(pts[:256])
    vals, d, ok, _ = window_distances(grid, q)
    dist_inf = jnp.where(ok & (d <= radius), d, jnp.inf)
    _, rfs = shot_from_window_ff(q, vals, dist_inf, radius,
                                 normalize=True, min_neighborhood_size=10)
    # shared frames: fp-tight (identical bin decisions)
    ref_desc, _ = shot_from_window_ff(q, vals, dist_inf, radius,
                                      normalize=True,
                                      min_neighborhood_size=10,
                                      local_rfs=rfs)
    dma_desc, _ = shot_descriptor_dma(grid, q, radius, rfs=rfs,
                                      min_neighborhood_size=10)
    np.testing.assert_allclose(np.asarray(dma_desc), np.asarray(ref_desc),
                               atol=5e-3)
    # bi-scale frames from the same window
    rf_dist_inf = jnp.where(ok & (d <= rf_radius), d, jnp.inf)
    ref_bi, ref_bi_rfs = shot_from_window_ff(
        q, vals, dist_inf, radius, normalize=True, min_neighborhood_size=10,
        rf_dist_inf=rf_dist_inf, rf_radius=rf_radius)
    dma_bi, dma_bi_rfs = shot_descriptor_dma(
        grid, q, radius, rf_radius=rf_radius, min_neighborhood_size=10)
    np.testing.assert_allclose(np.asarray(dma_bi_rfs),
                               np.asarray(ref_bi_rfs), atol=5e-4)
    dd = np.abs(np.asarray(dma_bi) - np.asarray(ref_bi))
    # same bin-edge flip allowance as the single-scale case above
    assert (dd > 5e-3).mean() <= 3e-3 and dd.max() <= 0.1


def test_dma_spfh_kernel_matches_xla_on_tpu():
    # Mosaic lowering of the run-DMA SPFH pass (FPFH pass 1): run-copy DMAs
    # + in-kernel Darboux/binning/contraction vs the grouped-gather pass
    from shot_fpfh_tpu.models.fpfh import _spfh_window_sorted
    from shot_fpfh_tpu.ops.grid_hash import build_grid
    from shot_fpfh_tpu.ops.pallas_shot_dma import spfh_sorted_dma

    pts, nrm = _cloud(n=20000, seed=9)
    radius = 0.7
    grid = build_grid(pts, radius / 2, extras=nrm, halo=2)
    assert grid.use_xyrow and grid.xyrow_run_cap > 0
    for decorrelated in (False, True):
        ref = np.asarray(_spfh_window_sorted(grid, radius, 5, decorrelated))
        got = np.asarray(spfh_sorted_dma(grid, radius, 5, decorrelated))
        assert got.shape == ref.shape
        dd = np.abs(got - ref)
        assert (dd > 1e-4).mean() <= 1e-3, (dd.max(), (dd > 1e-4).mean())
        # radius-boundary ulp flips change the neighbor count for a couple of
        # queries, shifting the normalized per-query mass by ~1/count
        # (measured: 2/24576 queries at 0.0028 on the round-4 hardware run)
        np.testing.assert_allclose(got.sum(axis=1), ref.sum(axis=1),
                                   atol=1e-3, rtol=1e-2)
