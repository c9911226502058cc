"""The fused-kernel ROUTING branches, exercised on CPU via interpret mode.

The kernels themselves are pinned by tests/test_pallas_shot_fused.py and
tests/test_pallas_fpfh_fused.py; these tests force the gate on (monkeypatched
``_use_fused_kernel`` / ``_use_fused_spfh``) with the kernels in interpret
mode, so the branch plumbing — dist/count epilogues, rf returns, bi-scale
plane construction — runs on CPU instead of only on hardware.
"""

import functools

import numpy as np
import jax.numpy as jnp
import pytest

import shot_fpfh_tpu.models.fpfh as mf
import shot_fpfh_tpu.models.shot as ms
import shot_fpfh_tpu.ops.pallas_fpfh_fused as pff
import shot_fpfh_tpu.ops.pallas_shot_fused as psf

from _windows import window_case

_window = functools.partial(window_case, drop=0.0)


@pytest.fixture
def force_fused(monkeypatch):
    monkeypatch.setattr(ms, "_use_fused_kernel", lambda: True)
    monkeypatch.setattr(mf, "_use_fused_spfh", lambda: True)
    monkeypatch.setattr(
        psf, "shot_binning_histogram",
        functools.partial(psf.shot_binning_histogram, interpret=True),
    )
    monkeypatch.setattr(
        pff, "spfh_histogram",
        functools.partial(pff.spfh_histogram, interpret=True),
    )
    # the routed functions are jitted with the gate read at trace time
    import jax

    jax.clear_caches()
    yield
    jax.clear_caches()


@pytest.mark.slow
def test_shot_window_fused_branch_matches_xla(rng, force_fused):
    # shared frames sidestep the known ~2e-4 Jacobi-vs-eigh frame delta, so
    # the branch (binning + finalize epilogue) must match the XLA path tightly
    kp, vals_ff, dist_inf = _window(rng)
    radius = 0.8
    ok = jnp.isfinite(jnp.asarray(dist_inf))
    centered = jnp.where(ok[:, None, :],
                         jnp.asarray(vals_ff[:, :3, :]) - kp[:, :, None], 0.0)
    rfs = ms._local_rfs_ff(centered, jnp.where(ok, dist_inf, 0.0), ok, radius)

    fused_desc, fused_rfs = ms.shot_from_window_ff(
        jnp.asarray(kp), jnp.asarray(vals_ff), jnp.asarray(dist_inf), radius,
        normalize=True, min_neighborhood_size=5, local_rfs=rfs,
    )
    import jax

    jax.clear_caches()
    import shot_fpfh_tpu.models.shot as ms2
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(ms2, "_use_fused_kernel", lambda: False)
        xla_desc, _ = ms2.shot_from_window_ff(
            jnp.asarray(kp), jnp.asarray(vals_ff), jnp.asarray(dist_inf),
            radius, normalize=True, min_neighborhood_size=5, local_rfs=rfs,
        )
    np.testing.assert_allclose(np.asarray(fused_desc), np.asarray(xla_desc),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(fused_rfs), np.asarray(rfs), atol=0)


@pytest.mark.slow
def test_shot_window_fused_branch_computes_rfs(rng, force_fused):
    kp, vals_ff, dist_inf = _window(rng, q=11)
    desc, rfs = ms.shot_from_window_ff(
        jnp.asarray(kp), jnp.asarray(vals_ff), jnp.asarray(dist_inf), 0.8,
        normalize=True, min_neighborhood_size=5,
    )
    assert rfs.shape == (11, 3, 3)
    # frames are orthonormal rotations
    eye = np.einsum("qij,qik->qjk", np.asarray(rfs), np.asarray(rfs))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (11, 3, 3)),
                               atol=1e-4)
    # normalized, and sparse neighborhoods zeroed by the epilogue
    norms = np.linalg.norm(np.asarray(desc), axis=1)
    assert np.all((np.abs(norms - 1.0) < 1e-4) | (norms == 0.0))


@pytest.mark.slow
def test_shot_window_fused_branch_min_neighborhood(rng, force_fused):
    kp, vals_ff, dist_inf = _window(rng, q=8, w=96)
    dist_inf[3] = np.inf  # empty neighborhood
    desc, _ = ms.shot_from_window_ff(
        jnp.asarray(kp), jnp.asarray(vals_ff), jnp.asarray(dist_inf), 0.8,
        normalize=True, min_neighborhood_size=5,
    )
    assert not np.any(np.asarray(desc)[3])
    assert np.any(np.asarray(desc)[:3])


@pytest.mark.slow
def test_spfh_window_fused_branch_matches_xla(rng, force_fused):
    # drive the real window path (grid build + fused SPFH branch) end to end
    from shot_fpfh_tpu.ops.grid_hash import build_grid

    pts = rng.normal(size=(4000, 3)).astype(np.float32) * 2.0
    nrm = rng.normal(size=(4000, 3))
    nrm = (nrm / np.linalg.norm(nrm, axis=1, keepdims=True)).astype(np.float32)
    radius = 0.7
    grid = build_grid(pts, radius / 2, extras=nrm, halo=2)
    qc = jnp.asarray(grid.packed_sorted[:256, :3])
    qn = jnp.asarray(grid.packed_sorted[:256, 3:6])

    fused = mf._spfh_window_block(grid, qc, qn, radius, 5, False)
    import jax

    jax.clear_caches()
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(mf, "_use_fused_spfh", lambda: False)
        xla = mf._spfh_window_block(grid, qc, qn, radius, 5, False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(xla), atol=1e-5)


@pytest.mark.slow
def test_dma_route_matches_xla_window(monkeypatch, rng):
    """With the SHOT_FPFH_DMA gate forced on, compute_shot_descriptor's grid
    path must route through the run-DMA kernel and agree with the XLA window
    path (frames to 5e-4; per-mille of soft-bin edge flips allowed)."""
    import jax

    from shot_fpfh_tpu.ops import grid_hash

    xy = rng.uniform(-6, 6, size=(12000, 2))
    z = 0.4 * np.sin(1.2 * xy[:, 0]) * np.cos(xy[:, 1])
    pts = (np.column_stack([xy, z])
           + rng.normal(scale=0.01, size=(12000, 3))).astype(np.float32)
    nrm = rng.normal(size=(12000, 3))
    nrm = (nrm / np.linalg.norm(nrm, axis=1, keepdims=True)).astype(np.float32)
    q = pts[:40]
    radius = 0.9
    monkeypatch.setattr(grid_hash, "AUTO_GRID_MIN_POINTS", 1000)
    ref_desc, ref_rfs = ms.compute_shot_descriptor(
        q, pts, nrm, radius, min_neighborhood_size=30)
    monkeypatch.setattr(ms, "_use_dma_kernel", lambda grid: True)
    jax.clear_caches()
    try:
        dma_desc, dma_rfs = ms.compute_shot_descriptor(
            q, pts, nrm, radius, min_neighborhood_size=30)
    finally:
        jax.clear_caches()
    np.testing.assert_allclose(np.asarray(dma_rfs), np.asarray(ref_rfs),
                               atol=5e-4)
    dd = np.abs(np.asarray(dma_desc) - np.asarray(ref_desc))
    assert (dd > 5e-3).mean() <= 1e-3 and dd.max() <= 0.1, (
        dd.max(), (dd > 5e-3).mean())


@pytest.mark.slow
def test_fpfh_dma_route_matches_staged(rng, monkeypatch):
    """With the DMA gate on, compute_fpfh_descriptor's grid route sources
    SPFH from the run-DMA kernel (ops/pallas_shot_dma.spfh_sorted_dma); the
    aggregation pass is shared, so descriptors must match the gather path up
    to rare atan2 bin flips."""
    import shot_fpfh_tpu.ops.grid_hash as gh
    import shot_fpfh_tpu.ops.pallas_shot_dma as psd

    n = 2600
    xy = rng.uniform(-3, 3, size=(n, 2))
    z = 0.4 * np.sin(1.2 * xy[:, 0]) * np.cos(xy[:, 1])
    pts = (np.column_stack([xy, z])
           + rng.normal(scale=0.01, size=(n, 3))).astype(np.float32)
    nrm = rng.normal(size=(n, 3))
    nrm = (nrm / np.linalg.norm(nrm, axis=1, keepdims=True)).astype(np.float32)
    kp = np.arange(0, n, 9, dtype=np.int32)

    monkeypatch.setattr(gh, "AUTO_GRID_MIN_POINTS", 2000)
    ref = np.asarray(mf.compute_fpfh_descriptor(kp, pts, nrm, 0.7))

    # the real gate is TPU-only (interpret Pallas loses to XLA on CPU):
    # force it open to exercise the routing branch, like _use_dma_kernel
    # in test_dma_route_matches_xla_window above; the spy proves the DMA
    # pass actually ran
    calls = []
    orig = psd.spfh_sorted_dma

    def spy(grid, radius, n_bins, decorrelated, **kw):
        calls.append(1)
        kw.update(chunk=512, interpret=True)
        return orig(grid, radius, n_bins, decorrelated, **kw)

    monkeypatch.setattr(psd, "spfh_sorted_dma", spy)
    monkeypatch.setattr(mf, "_use_dma_spfh", lambda grid: True)
    got = np.asarray(mf.compute_fpfh_descriptor(kp, pts, nrm, 0.7))
    assert calls, "DMA route was not taken"
    assert got.shape == ref.shape
    dd = np.abs(got - ref)
    assert (dd > 1e-3).mean() <= 1e-3, (dd.max(), (dd > 1e-3).mean())
    assert np.abs(got).sum() > 0
