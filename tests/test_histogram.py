import numpy as np
import jax.numpy as jnp

from shot_fpfh_tpu.ops.histogram import batched_histogram, bin_index, factored_histogram


def test_scatter_and_onehot_agree(rng):
    idx = rng.integers(0, 50, size=(7, 200)).astype(np.int32)
    w = rng.uniform(size=(7, 200)).astype(np.float32)
    a = np.asarray(batched_histogram(jnp.asarray(idx), jnp.asarray(w), 50, impl="scatter"))
    b = np.asarray(batched_histogram(jnp.asarray(idx), jnp.asarray(w), 50, impl="onehot"))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_factored_matches_flat(rng):
    n_hi, n_lo = 11, 32
    hi = rng.integers(0, n_hi, size=(5, 300)).astype(np.int32)
    lo = rng.integers(0, n_lo, size=(5, 300)).astype(np.int32)
    w = rng.uniform(size=(5, 300)).astype(np.float32)
    flat = hi * n_lo + lo
    a = np.asarray(batched_histogram(jnp.asarray(flat), jnp.asarray(w), n_hi * n_lo))
    b = np.asarray(factored_histogram(jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(w), n_hi, n_lo))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_factored_drops_out_of_range(rng):
    hi = np.array([[0, -1, 11, 5]], np.int32)
    lo = np.array([[0, 3, 3, 40]], np.int32)
    w = np.ones((1, 4), np.float32)
    out = np.asarray(factored_histogram(jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(w), 11, 32))
    assert out.sum() == 1.0  # only the first entry is in range
    assert out[0, 0] == 1.0


def test_duplicate_indices_accumulate(rng):
    """np.add.at semantics: duplicates within one call must sum."""
    idx = np.zeros((1, 10), np.int32)
    w = np.ones((1, 10), np.float32)
    out = np.asarray(batched_histogram(jnp.asarray(idx), jnp.asarray(w), 4))
    assert out[0, 0] == 10.0
    out_f = np.asarray(
        factored_histogram(jnp.asarray(idx), jnp.asarray(idx), jnp.asarray(w), 2, 2)
    )
    assert out_f[0, 0] == 10.0


def test_bin_index_histogramdd_semantics():
    x = jnp.asarray([[-1.0, -0.999, 0.0, 0.999, 1.0, 1.0001, -1.2]])
    idx, in_range = bin_index(x, -1.0, 1.0, 5)
    np.testing.assert_array_equal(np.asarray(idx)[0], [0, 0, 2, 4, 4, 4, 0])
    np.testing.assert_array_equal(
        np.asarray(in_range)[0], [True, True, True, True, True, False, False]
    )
