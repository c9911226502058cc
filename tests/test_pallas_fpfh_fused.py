"""Fused Pallas SPFH kernel vs the XLA FPFH binning+histogram.

The kernel (ops/pallas_fpfh_fused.py) must reproduce the window SPFH path's
histograms exactly: same Darboux conventions (reference fpfh.py:38-90), same
``histogramdd`` bin semantics — only θ comes from the Mosaic atan2 polynomial
(~1e-6 rad).  Runs in interpret mode on CPU.
"""

import numpy as np
import jax.numpy as jnp

from shot_fpfh_tpu.models.fpfh import _spfh_from_values
from shot_fpfh_tpu.ops.pallas_fpfh_fused import spfh_histogram


def _window_case(rng, c=12, w=160, radius=0.8, drop=0.1):
    q = rng.normal(size=(c, 3)).astype(np.float32)
    qn = rng.normal(size=(c, 3))
    qn /= np.linalg.norm(qn, axis=-1, keepdims=True)
    pts = q[:, None, :] + rng.normal(scale=0.4, size=(c, w, 3)).astype(np.float32)
    nrm = rng.normal(size=(c, w, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    vals_ff = np.moveaxis(
        np.concatenate([pts, nrm, np.zeros((c, w, 2))], axis=-1), 1, 2
    ).astype(np.float32)  # (C, 8, W)
    d = np.linalg.norm(pts - q[:, None, :], axis=-1)
    keep = (d <= radius) & (rng.uniform(size=(c, w)) > drop)
    dist_inf = np.where(keep, d, np.inf).astype(np.float32)
    return q.astype(np.float32), qn.astype(np.float32), vals_ff, dist_inf


def _xla_spfh(q, qn, vals_ff, dist_inf, n_bins, decorrelated):
    """Unnormalized histograms through the XLA path's exact code
    (_spfh_from_values computes /count; undo it)."""
    ok = np.isfinite(dist_inf)
    p_j = np.moveaxis(vals_ff[:, :3, :], 1, 2)
    n_j = np.moveaxis(vals_ff[:, 3:6, :], 1, 2)
    d = np.where(ok, dist_inf, 0.0).astype(np.float32)
    spfh = _spfh_from_values(
        jnp.asarray(q), jnp.asarray(qn), jnp.asarray(p_j), jnp.asarray(n_j),
        jnp.asarray(d), jnp.asarray(ok), 0.8, n_bins, decorrelated,
    )
    count = np.maximum(ok.sum(axis=-1), 1).astype(np.float32)
    return np.asarray(spfh) * count[:, None]


def test_fused_spfh_joint_matches_xla(rng):
    q, qn, vals_ff, dist_inf = _window_case(rng)
    ref = _xla_spfh(q, qn, vals_ff, dist_inf, n_bins=5, decorrelated=False)
    got = spfh_histogram(
        jnp.asarray(vals_ff), jnp.asarray(dist_inf), jnp.asarray(q),
        jnp.asarray(qn), n_bins=5, decorrelated=False, interpret=True,
    )
    assert got.shape == (12, 125)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)
    assert float(np.abs(ref).sum()) > 0


def test_fused_spfh_decorrelated_matches_xla(rng):
    q, qn, vals_ff, dist_inf = _window_case(rng, c=11, w=96)
    ref = _xla_spfh(q, qn, vals_ff, dist_inf, n_bins=5, decorrelated=True)
    got = spfh_histogram(
        jnp.asarray(vals_ff), jnp.asarray(dist_inf), jnp.asarray(q),
        jnp.asarray(qn), n_bins=5, decorrelated=True, interpret=True,
    )
    assert got.shape == (11, 15)  # C not a multiple of qb: pad must not leak
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_fused_spfh_empty_neighborhood(rng):
    q, qn, vals_ff, dist_inf = _window_case(rng, c=8, w=96)
    dist_inf[2] = np.inf
    got = np.asarray(spfh_histogram(
        jnp.asarray(vals_ff), jnp.asarray(dist_inf), jnp.asarray(q),
        jnp.asarray(qn), n_bins=5, decorrelated=False, interpret=True,
    ))
    assert np.all(got[2] == 0)
    assert np.abs(got).sum() > 0
