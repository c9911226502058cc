"""Fused matmul + top-2 matching kernel (ops/pallas_match.py) — interpret-mode
parity with the XLA tile-scan matcher on CPU; the bench's hardware check and
benchmarks/ab_match.py cover the real Mosaic lowering."""

import numpy as np
import jax.numpy as jnp
import pytest

from shot_fpfh_tpu.ops.pallas_match import top2_matmul_pallas
from shot_fpfh_tpu.registration.matching import _top_scan


def _oracle(a, b):
    d = np.linalg.norm(a[:, None].astype(np.float64) - b[None], axis=-1) ** 2
    i1 = d.argmin(axis=1)
    d1 = d[np.arange(len(a)), i1]
    dm = d.copy()
    dm[np.arange(len(a)), i1] = np.inf
    return i1, d1, dm.min(axis=1)


@pytest.mark.parametrize("n_ref", [100, 1024, 1024 + 77, 2048 + 5])
def test_pallas_top2_matches_oracle_f32(rng, n_ref):
    a = rng.normal(size=(150, 24)).astype(np.float32)
    b = rng.normal(size=(n_ref, 24)).astype(np.float32)
    i1_o, d1_o, d2_o = _oracle(a, b)
    i1, d1, d2 = top2_matmul_pallas(
        jnp.asarray(a), jnp.asarray(b), jnp.ones(n_ref, bool),
        use_bf16=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), i1_o)
    np.testing.assert_allclose(np.asarray(d1), d1_o, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2), d2_o, atol=1e-4)


def test_pallas_top2_matches_xla_scan_bf16(rng):
    """bf16 kernel vs the bf16 XLA tile scan: identical quantization of the
    operands and the same merge semantics — indices must agree everywhere
    except genuine f32-accumulation-order near-ties."""
    a = rng.normal(size=(300, 32)).astype(np.float32)
    b = rng.normal(size=(1500, 32)).astype(np.float32)
    valid = np.ones(1500, bool)
    valid[7] = valid[1203] = False
    i_x, d1_x, d2_x = _top_scan(jnp.asarray(a), jnp.asarray(b),
                                jnp.asarray(valid), True, True)
    i_p, d1_p, d2_p = top2_matmul_pallas(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid),
        use_bf16=True, interpret=True)
    assert (np.asarray(i_p) == np.asarray(i_x)).mean() > 0.995
    np.testing.assert_allclose(np.asarray(d1_p), np.asarray(d1_x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2_x), atol=1e-3)
    assert 7 not in np.asarray(i_p) and 1203 not in np.asarray(i_p)


@pytest.mark.parametrize("n_ref", [500, 1024 + 77])
def test_pallas_top2_packed_epilogue(rng, n_ref):
    """The index-in-mantissa epilogue returns the same indices as the exact
    path (2^-11 distance quantization cannot flip anything but true
    near-ties) and distances within the quantization step; validity masking
    and all-invalid rows (inf) behave identically."""
    a = rng.normal(size=(150, 24)).astype(np.float32)
    b = rng.normal(size=(n_ref, 24)).astype(np.float32)
    valid = np.ones(n_ref, bool)
    valid[3] = False
    i_e, d1_e, d2_e = top2_matmul_pallas(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid),
        use_bf16=False, interpret=True, packed=False)
    i_p, d1_p, d2_p = top2_matmul_pallas(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid),
        use_bf16=False, interpret=True, packed=True)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_e))
    # clearing 12 of 23 mantissa bits rounds down by up to 2^-11 relative
    np.testing.assert_allclose(np.asarray(d1_p), np.asarray(d1_e), rtol=6e-4)
    np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2_e), rtol=6e-4)
    assert 3 not in np.asarray(i_p)
    # all-invalid: d1/d2 stay +inf, exactly like the exact epilogue
    none = np.zeros(n_ref, bool)
    _, d1_n, d2_n = top2_matmul_pallas(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(none),
        use_bf16=False, interpret=True, packed=True)
    assert np.isinf(np.asarray(d1_n)).all() and np.isinf(np.asarray(d2_n)).all()


def test_pallas_top2_tie_semantics(rng):
    """Duplicate rows across tile boundaries resolve argmin-first, and the
    duplicate's distance lands in d2 (Lowe rejection)."""
    n_ref = 1024 + 64
    b = rng.normal(size=(n_ref, 8)).astype(np.float32)
    b[1030] = b[5]
    a = b[5:6].copy()
    i1, d1, d2 = top2_matmul_pallas(
        jnp.asarray(a), jnp.asarray(b), jnp.ones(n_ref, bool),
        use_bf16=False, interpret=True)
    assert int(i1[0]) == 5
    assert float(d1[0]) == 0.0 and float(d2[0]) == 0.0
