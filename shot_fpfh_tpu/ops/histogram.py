"""Batched masked histogram accumulation — the scatter-add core of SHOT/FPFH.

The reference accumulates descriptor histograms with NumPy fancy-index ``+=``
inside per-point Python loops (fpfh.py:62-88, shot.py:244-298).  Here a whole
batch of histograms is built in one call from ``(row, bin)`` index/weight
tensors.  Two interchangeable implementations:

- ``scatter``: one fused XLA scatter-add — simple, exact, fast on CPU.
- ``onehot``: ``lax.scan`` over index chunks, each chunk accumulated with a
  one-hot masked-compare + sum (VPU-friendly); on TPU this avoids XLA's
  serialized scatter lowering.

Note on semantics: NumPy's fancy ``a[idx] += w`` silently drops duplicate
indices within one statement; ``np.add.at`` semantics (true accumulation, as in
the SHOT/FPFH papers) is what both implementations produce.  This is a
deliberate correction of reference behavior (documented deviation).

Pallas note: an early Mosaic kernel for the factored contraction placed the
bin dims in LANES and measured worse than this XLA formulation (the 11/32-bin
minor dims pad to 128 lanes in VMEM — 4-12x memory blowup).  The revisit with
a bins-in-SUBLANES, neighbors-in-lanes layout shipped as
``ops/pallas_shot_fused.py`` / ``ops/pallas_fpfh_fused.py``: those kernels
build the one-hots in VMEM and fuse the whole binning+contraction stage
(gated by ``ops.pallas_radius.fused_kernels_enabled``).  This module remains
the XLA path used on CPU/virtual meshes and under the debug checks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_bins", "impl", "chunk"))
def batched_histogram(
    idx: jnp.ndarray,
    weights: jnp.ndarray,
    n_bins: int,
    impl: str = "onehot",
    chunk: int = 128,
) -> jnp.ndarray:
    """Accumulate ``out[q, idx[q, m]] += weights[q, m]`` over m.

    ``idx``: (Q, M) int32 bin indices; out-of-range indices are dropped.
    ``weights``: (Q, M) float; masked-out entries should carry weight 0.
    Returns (Q, n_bins) float32.
    """
    q, m = idx.shape
    valid = (idx >= 0) & (idx < n_bins)
    w = jnp.where(valid, weights, 0.0).astype(jnp.float32)
    idx = jnp.where(valid, idx, 0).astype(jnp.int32)

    if impl == "scatter":
        rows = jnp.broadcast_to(jnp.arange(q, dtype=jnp.int32)[:, None], (q, m))
        out = jnp.zeros((q, n_bins), jnp.float32)
        return out.at[rows.reshape(-1), idx.reshape(-1)].add(w.reshape(-1))

    # one-hot chunked accumulation
    n_chunks = -(-m // chunk)
    pad = n_chunks * chunk - m
    idx_p = jnp.pad(idx, ((0, 0), (0, pad))).reshape(q, n_chunks, chunk)
    w_p = jnp.pad(w, ((0, 0), (0, pad))).reshape(q, n_chunks, chunk)
    bins = jnp.arange(n_bins, dtype=jnp.int32)

    def body(acc, args):
        ic, wc = args  # (Q, chunk)
        onehot = (ic[:, :, None] == bins[None, None, :]).astype(jnp.float32)
        return acc + jnp.einsum("qcb,qc->qb", onehot, wc), None

    # Derive the init from the inputs so its device-varying annotation matches
    # the body output under shard_map's varying-axes check.
    acc0 = jnp.zeros((q, n_bins), jnp.float32) + jnp.sum(w) * 0.0
    acc, _ = jax.lax.scan(
        body, acc0, (jnp.moveaxis(idx_p, 1, 0), jnp.moveaxis(w_p, 1, 0))
    )
    return acc


@functools.partial(jax.jit, static_argnames=("n_hi", "n_lo", "chunk"))
def factored_histogram(
    idx_hi: jnp.ndarray,
    idx_lo: jnp.ndarray,
    weights: jnp.ndarray,
    n_hi: int,
    n_lo: int,
    chunk: int = 512,
) -> jnp.ndarray:
    """Histogram over a product bin space ``bin = hi * n_lo + lo`` as a batched
    MXU matmul: ``out[q] = Σ_m onehot(hi_m) ⊗ (w_m · onehot(lo_m))``.

    This is the TPU-native form of the SHOT/FPFH scatter-add: building the two
    small one-hots costs ``M·(n_hi+n_lo)`` VPU compares instead of
    ``M·(n_hi·n_lo)``, and the accumulation over neighbors is a contraction
    the MXU executes directly.  Out-of-range indices contribute nothing.

    Returns (Q, n_hi·n_lo) float32.
    """
    q, m = idx_hi.shape
    valid = (idx_hi >= 0) & (idx_hi < n_hi) & (idx_lo >= 0) & (idx_lo < n_lo)
    w = jnp.where(valid, weights, 0.0).astype(jnp.float32)

    n_chunks = -(-m // chunk)
    pad = n_chunks * chunk - m
    hi_p = jnp.pad(idx_hi, ((0, 0), (0, pad))).reshape(q, n_chunks, chunk)
    lo_p = jnp.pad(idx_lo, ((0, 0), (0, pad))).reshape(q, n_chunks, chunk)
    w_p = jnp.pad(w, ((0, 0), (0, pad))).reshape(q, n_chunks, chunk)

    bins_hi = jnp.arange(n_hi, dtype=jnp.int32)
    bins_lo = jnp.arange(n_lo, dtype=jnp.int32)

    def body(acc, args):
        hi_c, lo_c, w_c = args  # (Q, chunk)
        a = (hi_c[:, :, None] == bins_hi).astype(jnp.float32)
        b = (lo_c[:, :, None] == bins_lo).astype(jnp.float32) * w_c[:, :, None]
        return acc + jnp.einsum("qmh,qml->qhl", a, b), None

    acc0 = jnp.zeros((q, n_hi, n_lo), jnp.float32) + jnp.sum(w) * 0.0
    acc, _ = jax.lax.scan(
        body,
        acc0,
        (jnp.moveaxis(hi_p, 1, 0), jnp.moveaxis(lo_p, 1, 0), jnp.moveaxis(w_p, 1, 0)),
    )
    return acc.reshape(q, n_hi * n_lo)


def bin_index(x: jnp.ndarray, lo: float, hi: float, n_bins: int):
    """NumPy-``histogramdd`` bin assignment on range [lo, hi]: left-inclusive
    uniform bins, right edge folded into the last bin, out-of-range dropped.

    Returns ``(bin_idx int32, in_range bool)``.
    """
    width = (hi - lo) / n_bins
    raw = jnp.floor((x - lo) / width).astype(jnp.int32)
    idx = jnp.clip(raw, 0, n_bins - 1)
    in_range = (x >= lo) & (x <= hi)
    return idx, in_range
