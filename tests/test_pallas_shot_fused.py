"""Fused Pallas binning+histogram kernel vs the XLA SHOT accumulation.

The kernel (ops/pallas_shot_fused.py) must reproduce the XLA window path's
histograms bit-for-bin: same reference conventions (shot.py:51-306), same
factored algebra, same bf16 weight quantization — only the angle evaluation
differs (Mosaic atan2 polynomial, ~1e-6 rad).  Runs in interpret mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from _windows import window_case as _window_case
from shot_fpfh_tpu.models import shot as ms
from shot_fpfh_tpu.ops.pallas_shot_fused import shot_binning_histogram


def _xla_histogram(kp, vals_ff, dist_inf, radius, rfs=None):
    """Unnormalized histograms through the XLA path's exact code."""
    ok = jnp.isfinite(dist_inf)
    pts = jnp.asarray(vals_ff[:, :3, :])
    nrms = jnp.where(ok[:, None, :], jnp.asarray(vals_ff[:, 3:6, :]), 0.0)
    centered = jnp.where(ok[:, None, :], pts - kp[:, :, None], 0.0)
    rho = jnp.where(ok, dist_inf, 0.0)
    if rfs is None:
        rfs = ms._local_rfs_ff(centered, rho, ok, radius)
    local = jnp.einsum("qiw,qij->qjw", centered, rfs)
    cosine = jnp.clip(jnp.einsum("qiw,qi->qw", nrms, rfs[..., :, 2]), -1, 1)
    valid = ok & (rho > 0)
    hist = ms._shot_accumulate(
        local[:, 0], local[:, 1], local[:, 2], rho, cosine, valid, radius,
        normalize=False, min_neighborhood_size=-1,
    )
    return hist, rfs


@pytest.mark.slow
def test_fused_kernel_matches_xla_histogram(rng):
    kp, vals_ff, dist_inf = _window_case(rng)
    radius = 0.8
    ref, rfs = _xla_histogram(kp, vals_ff, dist_inf, radius)
    got = shot_binning_histogram(
        jnp.asarray(vals_ff), jnp.asarray(dist_inf), jnp.asarray(kp), rfs,
        radius, interpret=True,
    )
    # the XLA baseline quantizes weights to bf16 (models/shot.py); the
    # kernel keeps f32 (Mosaic rejects bf16 lhs), so parity holds to the
    # baseline's bf16 precision
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3, rtol=1e-2)
    assert float(np.abs(np.asarray(got)).sum()) > 0


@pytest.mark.slow
def test_fused_kernel_query_padding(rng):
    # Q=11 is not a multiple of the block (8): the pad queries must not leak
    kp, vals_ff, dist_inf = _window_case(rng, q=11, w=96)
    radius = 0.8
    ref, rfs = _xla_histogram(kp, vals_ff, dist_inf, radius)
    got = shot_binning_histogram(
        jnp.asarray(vals_ff), jnp.asarray(dist_inf), jnp.asarray(kp), rfs,
        radius, interpret=True,
    )
    assert got.shape == (11, 352)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3, rtol=1e-2)


@pytest.mark.slow
def test_fused_kernel_in_kernel_rfs(rng):
    # rfs=None: the kernel computes the local reference frames itself
    # (trig-free Jacobi).  Frames must match the XLA _local_rfs_ff to f32
    # Jacobi fidelity; the histograms must match the XLA binning GIVEN the
    # kernel's frames (frame differences of ~1e-4 legitimately flip
    # hard-binned neighbors sitting on bin edges, so comparing histograms
    # across different frames is chaotic by construction).
    kp, vals_ff, dist_inf = _window_case(rng)
    radius = 0.8
    _, ref_rfs = _xla_histogram(kp, vals_ff, dist_inf, radius)
    got_hist, got_rfs = shot_binning_histogram(
        jnp.asarray(vals_ff), jnp.asarray(dist_inf), jnp.asarray(kp), None,
        radius, interpret=True,
    )
    assert got_rfs.shape == (12, 3, 3)
    np.testing.assert_allclose(np.asarray(got_rfs), np.asarray(ref_rfs),
                               atol=2e-4)
    ref_hist, _ = _xla_histogram(kp, vals_ff, dist_inf, radius, rfs=got_rfs)
    np.testing.assert_allclose(np.asarray(got_hist), np.asarray(ref_hist),
                               atol=5e-3, rtol=1e-2)


def test_fused_kernel_in_kernel_rfs_empty(rng):
    # empty neighborhood -> identity frame (the _local_rfs_ff convention)
    kp, vals_ff, dist_inf = _window_case(rng, q=8, w=96)
    dist_inf[5] = np.inf
    _, rfs = shot_binning_histogram(
        jnp.asarray(vals_ff), jnp.asarray(dist_inf), jnp.asarray(kp), None,
        0.8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(rfs)[5], np.eye(3), atol=0)


def test_fused_kernel_biscale_rf_plane(rng):
    # bi-scale: frames from the rf_radius validity plane, bins from radius —
    # must match the XLA _local_rfs_ff computed on the rf plane
    kp, vals_ff, dist_inf = _window_case(rng, q=12, w=160, radius=1.2)
    radius, rf_radius = 0.8, 1.2
    rf_dist_inf = dist_inf  # the full 1.2-radius plane
    desc_dist_inf = np.where(dist_inf <= radius, dist_inf, np.inf).astype(
        np.float32
    )
    ok_rf = jnp.isfinite(jnp.asarray(rf_dist_inf))
    centered_rf = jnp.where(
        ok_rf[:, None, :], jnp.asarray(vals_ff[:, :3, :]) - kp[:, :, None], 0.0
    )
    ref_rfs = ms._local_rfs_ff(
        centered_rf, jnp.where(ok_rf, rf_dist_inf, 0.0), ok_rf, rf_radius
    )
    got_hist, got_rfs = shot_binning_histogram(
        jnp.asarray(vals_ff), jnp.asarray(desc_dist_inf), jnp.asarray(kp),
        None, radius, rf_dist_inf=jnp.asarray(rf_dist_inf),
        rf_radius=rf_radius, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_rfs), np.asarray(ref_rfs),
                               atol=2e-4)
    ref_hist, _ = _xla_histogram(kp, vals_ff, desc_dist_inf, radius,
                                 rfs=got_rfs)
    np.testing.assert_allclose(np.asarray(got_hist), np.asarray(ref_hist),
                               atol=5e-3, rtol=1e-2)


@pytest.mark.slow
def test_fused_kernel_empty_neighborhoods(rng):
    kp, vals_ff, dist_inf = _window_case(rng, q=8, w=96)
    dist_inf[3] = np.inf  # query 3: no valid neighbors -> zero histogram
    radius = 0.8
    _, rfs = _xla_histogram(kp, vals_ff, dist_inf, radius)
    got = np.asarray(shot_binning_histogram(
        jnp.asarray(vals_ff), jnp.asarray(dist_inf), jnp.asarray(kp), rfs,
        radius, interpret=True,
    ))
    assert np.all(got[3] == 0)
    assert np.abs(got[:3]).sum() > 0


def test_hist_dot_modes_identical(rng, monkeypatch):
    # SHOT_FPFH_HIST_DOT reshapes how the factored contraction is issued to
    # the MXU (pair of dots / one concat dot / one block dot per grid step)
    # without changing the algebra: histograms and in-kernel frames must be
    # bit-identical across modes (round-5 A/B knob, docs/ROOFLINE.md).
    kp, vals_ff, dist_inf = _window_case(rng, q=11, w=96)
    radius = 0.8
    outs = {}
    for mode in ("pair", "concat", "block"):
        monkeypatch.setenv("SHOT_FPFH_HIST_DOT", mode)
        jax.clear_caches()
        h, rfs = shot_binning_histogram(
            jnp.asarray(vals_ff), jnp.asarray(dist_inf), jnp.asarray(kp),
            None, radius, interpret=True,
        )
        outs[mode] = (np.asarray(h), np.asarray(rfs))
    for mode in ("concat", "block"):
        np.testing.assert_array_equal(outs[mode][0], outs["pair"][0])
        np.testing.assert_array_equal(outs[mode][1], outs["pair"][1])
