"""Fused Pallas SPFH kernel vs the XLA FPFH binning+histogram.

The kernel (ops/pallas_fpfh_fused.py) must reproduce the window SPFH path's
histograms exactly: same Darboux conventions (reference fpfh.py:38-90), same
``histogramdd`` bin semantics — only θ comes from the Mosaic atan2 polynomial
(~1e-6 rad).  Runs in interpret mode on CPU.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from _windows import window_case
from shot_fpfh_tpu.models.fpfh import _spfh_from_values
from shot_fpfh_tpu.ops.pallas_fpfh_fused import spfh_histogram

_window_case = functools.partial(window_case, query_normals=True)


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
    q, qn, vals_ff, dist_inf = _window_case(rng, q=11, w=96)
    ref = _xla_spfh(q, qn, vals_ff, dist_inf, n_bins=5, decorrelated=True)
    got = spfh_histogram(
        jnp.asarray(vals_ff), jnp.asarray(dist_inf), jnp.asarray(q),
        jnp.asarray(qn), n_bins=5, decorrelated=True, interpret=True,
    )
    assert got.shape == (11, 15)  # C not a multiple of qb: pad must not leak
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_fused_spfh_empty_neighborhood(rng):
    q, qn, vals_ff, dist_inf = _window_case(rng, q=8, w=96)
    dist_inf[2] = np.inf
    got = np.asarray(spfh_histogram(
        jnp.asarray(vals_ff), jnp.asarray(dist_inf), jnp.asarray(q),
        jnp.asarray(qn), n_bins=5, decorrelated=False, interpret=True,
    ))
    assert np.all(got[2] == 0)
    assert np.abs(got).sum() > 0


def test_spfh_hist_dot_block_identical(rng, monkeypatch):
    # the shared SHOT_FPFH_HIST_DOT knob: "block" row-stacks the per-query
    # one-hot operands into one MXU dot per grid step — must be
    # bit-identical to the default per-query dots (round-5 A/B knob).
    kp, qn, vals_ff, dist_inf = _window_case(rng, q=11, w=96,
                                             query_normals=True)
    outs = {}
    for mode in ("pair", "block"):
        monkeypatch.setenv("SHOT_FPFH_HIST_DOT", mode)
        jax.clear_caches()
        h = spfh_histogram(
            jnp.asarray(vals_ff), jnp.asarray(dist_inf), jnp.asarray(kp),
            jnp.asarray(qn), 5, False, interpret=True,
        )
        outs[mode] = np.asarray(h)
    np.testing.assert_array_equal(outs["block"], outs["pair"])
