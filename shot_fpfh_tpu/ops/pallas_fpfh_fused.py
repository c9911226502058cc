"""Fused SPFH binning + histogram as one Pallas kernel (FPFH pass 1).

The window SPFH path (``models.fpfh._spfh_window_block``) runs, in XLA:
Darboux frame -> three bin indices -> ``factored_histogram`` /
``batched_histogram``.  Exactly like the SHOT leg (``pallas_shot_fused``),
XLA cannot fuse the one-hot construction into the contraction, so the
(C, W, n_bins)/(C, W, n_bins²) one-hot operands and the dozen (C, W) Darboux
intermediates stream through HBM.  At the 1M-point scale the SPFH pass runs
over EVERY cloud point (reference fpfh.py:38-90), so this streaming is the
dominant HBM term of the FPFH leg.

This kernel fuses the whole stage per qb-query grid step: Darboux angles
(Mosaic ``_atan2`` polynomial for θ), NumPy-``histogramdd`` bin semantics
(left-inclusive uniform bins on the reference ranges, right edge folded in,
out-of-range neighbors dropped from ALL bins — ``ops.histogram.bin_index``),
then the factored one-hot contraction built entirely in VMEM:

- joint mode (``decorrelated=False``): H = onehot(α)ᵀ · onehot(φ·n+θ) per
  query, the (n_bins, n_bins²) block flattened to n_bins³ — same A·Bᵀ
  lanes-contraction the SHOT kernel uses.
- decorrelated mode: three (n_bins,) masked row-sums, emitted as
  (3, n_bins) and interleaved by the caller to the reference's
  (bin0: α,φ,θ, bin1: ...) layout (reference fpfh.py:62-88).

Inputs mirror the window convention: ``vals (C, F, W)`` feature-first rows
``[x y z nx ny nz ...]`` and ``dist_inf (C, W)`` with +inf marking
out-of-radius/invalid lanes.  The returned histograms are UNNORMALIZED —
the caller keeps the /count epilogue (reference fpfh.py:88).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .descriptor_bins import darboux_angles
# bin_index is pure jnp and lowers on Mosaic as-is — reused verbatim so the
# kernel's bin-edge rounding is bit-identical to the XLA path's
from .histogram import bin_index as _bin
from .descriptor_bins import mosaic_atan2 as _atan2


def _darboux(vals_ref, dist_ref, params_ref):
    """Shared per-neighbor stage: (α, φ, θ, valid_f) on (QB, W)."""
    d = dist_ref[:]
    finite = d < jnp.float32(3.0e38)
    rho = jnp.where(finite, d, 0.0)
    valid = finite & (rho > 0)

    p = params_ref  # (QB, 8): [qx qy qz | unx uny unz | pad pad]
    # select (not multiply) the invalid lanes to zero so a non-finite value
    # in a padding/out-of-radius lane cannot poison the histogram via NaN*0
    # — the same robustness the XLA path gets from its where-masking
    dx = jnp.where(finite, vals_ref[:, 0, :] - p[:, 0:1], 0.0)
    dy = jnp.where(finite, vals_ref[:, 1, :] - p[:, 1:2], 0.0)
    dz = jnp.where(finite, vals_ref[:, 2, :] - p[:, 2:3], 0.0)
    ux, uy, uz = p[:, 3:4], p[:, 4:5], p[:, 5:6]
    nx = jnp.where(finite, vals_ref[:, 3, :], 0.0)
    ny = jnp.where(finite, vals_ref[:, 4, :], 0.0)
    nz = jnp.where(finite, vals_ref[:, 5, :], 0.0)
    alpha, phi, theta = darboux_angles(
        dx, dy, dz, nx, ny, nz, ux, uy, uz,
        jnp.where(valid, rho, 1.0), atan2=_atan2,
    )
    return alpha, phi, theta, valid.astype(jnp.float32)


def _spfh_hist_joint(qb, w, n_bins, alpha, phi, theta, vf, out_ref):
    """Joint-mode binning + per-query factored contraction on loaded (QB, W)
    angle planes (shared with the run-DMA kernel, ops/pallas_shot_dma.py)."""
    a_bin, a_in = _bin(alpha, -1.0, 1.0, n_bins)
    p_bin, p_in = _bin(phi, -1.0, 1.0, n_bins)
    t_bin, t_in = _bin(theta, -jnp.pi / 2, jnp.pi / 2, n_bins)
    wgt = vf * (a_in & p_in & t_in).astype(jnp.float32)
    lo_bin = p_bin * n_bins + t_bin

    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (n_bins, w), 0)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (n_bins * n_bins, w), 0)
    dims = (((1,), (1,)), ((), ()))
    # one-hot dtype: bf16 by default (the v5e VPU packs bf16 — round-5 A/B,
    # pallas_shot_fused._onehot_dtype); DEFAULT dot precision is the Mosaic
    # form bf16 operands accept (an explicit fp32 contract precision is
    # rejected, "Bad lhs type")
    from .pallas_shot_fused import _hist_dot_mode, _onehot_dtype

    hdt = _onehot_dtype()
    prec = (jax.lax.Precision.DEFAULT if hdt == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    # SHOT_FPFH_HIST_DOT (shared with the SHOT kernel): "pair"/"concat" are
    # the same single dot per query here (there is only one factored group);
    # "block" row-stacks the per-query operands into ONE
    # (qb·pa, W) x (qb·pb, W) dot per grid step and extracts the
    # block-diagonal (n_bins, n_bins²) tiles — qb× redundant flops for
    # 1/qb the MXU issues.
    mode = _hist_dot_mode()
    n_lo = n_bins * n_bins
    align = 16 if hdt == jnp.bfloat16 else 8
    pa = -(-n_bins // align) * align
    pb = -(-n_lo // align) * align
    a_blocks, b_blocks = [], []
    for qi in range(qb):
        a = (a_bin[qi:qi + 1, :] == iota_hi).astype(hdt)
        b = ((lo_bin[qi:qi + 1, :] == iota_lo).astype(hdt)
             * wgt[qi:qi + 1, :].astype(hdt))
        if mode == "block":
            a_blocks.append(jnp.pad(a, ((0, pa - n_bins), (0, 0))))
            b_blocks.append(jnp.pad(b, ((0, pb - n_lo), (0, 0))))
            continue
        out_ref[qi] = jax.lax.dot_general(
            a, b, dimension_numbers=dims, precision=prec,
            preferred_element_type=jnp.float32,
        )
    if mode == "block":
        big = jax.lax.dot_general(
            jnp.concatenate(a_blocks, axis=0),
            jnp.concatenate(b_blocks, axis=0),
            dimension_numbers=dims, precision=prec,
            preferred_element_type=jnp.float32,
        )  # (qb*pa, qb*pb)
        for qi in range(qb):
            out_ref[qi] = big[qi * pa:qi * pa + n_bins,
                              qi * pb:qi * pb + n_lo]


def _spfh_hist_decorr(qb, w, n_bins, alpha, phi, theta, vf, out_ref):
    """Decorrelated-mode masked row-sums on loaded angle planes (shared with
    the run-DMA kernel)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (n_bins, w), 0)
    # binning hoisted above the per-query loop (as in the joint mode): one
    # (QB, W) pass per angle instead of qb (1, W) passes on full sublane
    # registers
    binned = []
    for x, lo, hi in ((alpha, -1.0, 1.0), (phi, -1.0, 1.0),
                      (theta, -jnp.pi / 2, jnp.pi / 2)):
        b, in_r = _bin(x, lo, hi, n_bins)
        binned.append((b, vf * in_r.astype(jnp.float32)))
    for qi in range(qb):
        rows = [
            jnp.sum((b[qi:qi + 1, :] == iota).astype(jnp.float32)
                    * wgt[qi:qi + 1, :], axis=1)
            for b, wgt in binned
        ]
        out_ref[qi] = jnp.stack(rows, axis=0)  # (3, n_bins)


def _joint_kernel(qb, w, n_bins, vals_ref, dist_ref, params_ref, out_ref):
    alpha, phi, theta, vf = _darboux(vals_ref, dist_ref, params_ref)
    _spfh_hist_joint(qb, w, n_bins, alpha, phi, theta, vf, out_ref)


def _decorr_kernel(qb, w, n_bins, vals_ref, dist_ref, params_ref, out_ref):
    alpha, phi, theta, vf = _darboux(vals_ref, dist_ref, params_ref)
    _spfh_hist_decorr(qb, w, n_bins, alpha, phi, theta, vf, out_ref)


def _default_qb() -> int:
    """Query-block rows per grid step (``SHOT_FPFH_SPFH_QB``, default 8).
    Trace-time knob for A/B sweeps; callers that pass ``qb`` explicitly
    bypass it."""
    import os

    return int(os.environ.get("SHOT_FPFH_SPFH_QB", "8"))


@functools.partial(jax.jit,
                   static_argnames=("n_bins", "decorrelated", "qb",
                                    "interpret"))
def spfh_histogram(
    vals: jnp.ndarray,      # (C, F>=6, W) feature-first window
    dist_inf: jnp.ndarray,  # (C, W), +inf marks out-of-radius/invalid lanes
    queries: jnp.ndarray,   # (C, 3) query points
    query_normals: jnp.ndarray,  # (C, 3)
    n_bins: int,
    decorrelated: bool,
    qb: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Unnormalized SPFH histograms from a dense candidate window.

    Returns (C, 3·n_bins) in the reference's interleaved decorrelated layout,
    or (C, n_bins³) joint.  Drop-in for the binning+histogram core of
    ``models.fpfh._spfh_window_block`` (the caller keeps the /count
    epilogue).
    """
    if qb is None:
        qb = _default_qb()
    c, f, w = vals.shape
    params = jnp.concatenate(
        [queries.astype(jnp.float32), query_normals.astype(jnp.float32)],
        axis=1,
    )
    params = jnp.pad(params, ((0, 0), (0, 2)))
    pad_c = (-c) % qb
    if pad_c:
        vals = jnp.pad(vals, ((0, pad_c), (0, 0), (0, 0)))
        dist_inf = jnp.pad(dist_inf, ((0, pad_c), (0, 0)),
                           constant_values=jnp.inf)
        params = jnp.pad(params, ((0, pad_c), (0, 0)))
    cp = c + pad_c

    if decorrelated:
        kern = functools.partial(_decorr_kernel, qb, w, n_bins)
        out_shape = jax.ShapeDtypeStruct((cp, 3, n_bins), jnp.float32)
        out_spec = pl.BlockSpec((qb, 3, n_bins), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        kern = functools.partial(_joint_kernel, qb, w, n_bins)
        out_shape = jax.ShapeDtypeStruct((cp, n_bins, n_bins * n_bins),
                                         jnp.float32)
        out_spec = pl.BlockSpec((qb, n_bins, n_bins * n_bins),
                                lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(cp // qb,),
        in_specs=[
            pl.BlockSpec((qb, f, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        out_specs=out_spec,
        interpret=interpret,
    )(vals.astype(jnp.float32), dist_inf.astype(jnp.float32), params)

    if decorrelated:
        # (C, 3, n_bins) -> reference interleave (bin0: α,φ,θ, bin1: ...)
        return jnp.swapaxes(out[:c], 1, 2).reshape(c, 3 * n_bins)
    return out.reshape(cp, n_bins ** 3)[:c]
