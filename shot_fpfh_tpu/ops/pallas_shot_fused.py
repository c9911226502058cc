"""Fused SHOT binning + histogram as one Pallas kernel.

The production SHOT window path (``models.shot.shot_from_window_ff``) runs, in
XLA: local-coordinate transform -> per-neighbor soft-bin indices/weights ->
factored one-hot contraction.  XLA cannot fuse the one-hot construction into
the dot, so the (Q, W, 11) and (Q, W, 32) one-hot operands stream through HBM
(~541 MB per 4096-descriptor rep — the measured HBM-peak leg of the round-3
roofline, docs/ROOFLINE.md), and the dozen (Q, W) binning intermediates add
fusion-boundary round trips on top.

This kernel fuses the whole thing: inputs are the raw feature-first window
(``vals (Q, F, W)`` with rows ``[x y z nx ny nz ...]``), the window distances,
and per-query [keypoint | local RF] parameters.  Per grid step it

  1. computes every per-neighbor quantity (local coords, angles, the four
     quadrilinear interpolations — exact reference bin conventions,
     /root/reference/shot_fpfh/descriptors/shot.py:51-306) batched on
     (QB, W) shapes, full VPU sublane utilization;
  2. builds the factored one-hot operands per query IN VMEM (never touching
     HBM) and contracts them on the MXU with k = W lane-contraction dots —
     the same 2-group algebra as ``models.shot._shot_accumulate``:
     H = onehot(cos_bin)^T B1 + onehot(cos_nb)^T B2.

HBM traffic per rep drops from ~700 MB (one-hots + intermediates) to the
~110 MB window re-read.  Angle difference vs the XLA path: phi/theta come
from the Mosaic ``_atan2`` polynomial (max err ~1e-6 rad) instead of
arccos/atan2 — far inside the descriptor oracle tolerance.

Layout notes (why this shape): per-neighbor planes live lanes-major (W in
lanes), so BOTH one-hot operands are built as (bins, W) broadcast-compares —
no transposes anywhere — and contract with
``dot_general(..., (((1,), (1,)), ((), ())))`` (A B^T orientation), the form
``pallas_shot._hist_kernel`` already proved out on Mosaic.  Booleans cast to
int32/f32 immediately (Mosaic cannot lower select/xor on i1 vectors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_shot import _atan2, _azimuth_bin, _wrap

N_COS, N_AZ, N_ELEV, N_RAD = 11, 8, 2, 2
N_LO = N_AZ * N_ELEV * N_RAD  # 32


def _fused_kernel(qb, w, radius_ref, vals_ref, dist_ref, params_ref, out_ref):
    r = radius_ref[0, 0]
    half_pi = jnp.float32(jnp.pi / 2.0)
    az_size = jnp.float32(2.0 * jnp.pi / N_AZ)

    d = dist_ref[:]  # (QB, W)
    finite = d < jnp.float32(3.0e38)
    rho = jnp.where(finite, d, 0.0)
    vf = (finite & (rho > 0)).astype(jnp.float32)

    p = params_ref  # (QB, 16): [qx qy qz | rf row-major 9 | pad]
    cx = vals_ref[:, 0, :] - p[:, 0:1]
    cy = vals_ref[:, 1, :] - p[:, 1:2]
    cz = vals_ref[:, 2, :] - p[:, 2:3]
    nx = vals_ref[:, 3, :]
    ny = vals_ref[:, 4, :]
    nz = vals_ref[:, 5, :]

    # local = centered @ rf (rf columns are the x/y/z axes; rf[i,j] at 3+i*3+j)
    lx = cx * p[:, 3:4] + cy * p[:, 6:7] + cz * p[:, 9:10]
    ly = cx * p[:, 4:5] + cy * p[:, 7:8] + cz * p[:, 10:11]
    lz = cx * p[:, 5:6] + cy * p[:, 8:9] + cz * p[:, 11:12]
    cosine = jnp.clip(
        nx * p[:, 5:6] + ny * p[:, 8:9] + nz * p[:, 11:12], -1.0, 1.0
    )

    theta = _atan2(ly, lx)
    phi = _atan2(jnp.sqrt(jnp.maximum(lx * lx + ly * ly, 0.0)), lz)

    cos_pos = (cosine + 1.0) * (N_COS / 2.0) - 0.5
    cos_bin = jnp.round(cos_pos).astype(jnp.int32)
    az_bin = _azimuth_bin(lx, ly)
    elev_bin = (lz > 0).astype(jnp.int32)
    rad_bin = (rho > r / 2.0).astype(jnp.int32)

    delta_cos = cos_pos - cos_bin.astype(jnp.float32)
    sign_cos = jnp.sign(delta_cos).astype(jnp.int32)
    abs_cos = jnp.abs(delta_cos)
    cos_nb = _wrap(cos_bin + sign_cos, N_COS)

    # radial husks (reference shot.py:73-118; naming as models/shot.py)
    half = r / 2.0
    inner = ((rho > half) & (rho < r * 0.75)) * (r * 0.75 - rho) / half
    outer = ((rho < half) & (rho > r * 0.25)) * (rho - r * 0.25) / half
    husk_cur = (rho < half) * (1.0 - jnp.abs(rho - r * 0.25) / half) + (
        rho > half
    ) * (1.0 - jnp.abs(rho - r * 0.75) / half)
    # elevation volumes (shot.py:121-171)
    at_edge = jnp.abs(phi - half_pi) < 1e-10
    upper = (
        (((phi > half_pi) | (at_edge & (lz <= 0))) & (phi <= jnp.pi * 0.75))
        * (jnp.pi * 0.75 - phi) / half_pi
    )
    lower = (
        (((phi < half_pi) & (~at_edge | (lz > 0))) & (phi >= jnp.pi * 0.25))
        * (phi - jnp.pi * 0.25) / half_pi
    )
    vert_cur = (phi < half_pi) * (1.0 - jnp.abs(phi - jnp.pi * 0.25) / half_pi) + (
        phi >= half_pi
    ) * (1.0 - jnp.abs(phi - jnp.pi * 0.75) / half_pi)
    # azimuth wrap-around
    delta_az = jnp.clip(
        (theta - (-jnp.pi + az_bin.astype(jnp.float32) * az_size)) / az_size
        - 0.5, -0.5, 0.5,
    )
    sign_az = jnp.sign(delta_az).astype(jnp.int32)
    abs_az = jnp.abs(delta_az)
    az_nb = _wrap(az_bin + sign_az, N_AZ)

    def lo(a, e, rr):
        return (a * N_ELEV + e) * N_RAD + rr

    base = lo(az_bin, elev_bin, rad_bin)
    lo_husk = lo(az_bin, elev_bin, 1 - rad_bin)
    lo_vert = lo(az_bin, 1 - elev_bin, rad_bin)
    lo_az = lo(az_nb, elev_bin, rad_bin)
    # pre-masked weights (same merge as models/shot.py::_shot_accumulate:
    # the four same-(cos,cell) contributions collapse into w_same, the
    # complementary husk/volume pairs into condition-selected single terms)
    rbf = rad_bin.astype(jnp.float32)
    ebf = elev_bin.astype(jnp.float32)
    w_same = ((1.0 - abs_cos) + husk_cur + vert_cur + (1.0 - abs_az)) * vf
    w_husk = (outer * (1.0 - rbf) + inner * rbf) * vf
    w_vert = (upper * (1.0 - ebf) + lower * ebf) * vf
    w_az = abs_az * vf
    w_cnb = abs_cos * vf

    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (N_COS, w), 0)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (N_LO, w), 0)
    dims = (((1,), (1,)), ((), ()))
    for qi in range(qb):
        def row(a, qi=qi):
            return a[qi:qi + 1, :]

        oh_base = (row(base) == iota_lo).astype(jnp.float32)
        b1 = (
            oh_base * row(w_same)
            + (row(lo_husk) == iota_lo).astype(jnp.float32) * row(w_husk)
            + (row(lo_vert) == iota_lo).astype(jnp.float32) * row(w_vert)
            + (row(lo_az) == iota_lo).astype(jnp.float32) * row(w_az)
        ).astype(jnp.bfloat16)
        b2 = (oh_base * row(w_cnb)).astype(jnp.bfloat16)
        a1 = (row(cos_bin) == iota_hi).astype(jnp.bfloat16)
        a2 = (row(cos_nb) == iota_hi).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            a1, b1, dimension_numbers=dims, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            a2, b2, dimension_numbers=dims, preferred_element_type=jnp.float32
        )
        out_ref[qi] = acc


@functools.partial(jax.jit, static_argnames=("qb", "interpret"))
def shot_binning_histogram(
    vals: jnp.ndarray,      # (Q, F>=6, W) feature-first window
    dist_inf: jnp.ndarray,  # (Q, W), +inf marks out-of-radius/invalid lanes
    keypoints: jnp.ndarray, # (Q, 3)
    rfs: jnp.ndarray,       # (Q, 3, 3) local reference frames (columns x/y/z)
    radius,
    qb: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Unnormalized (Q, 352) SHOT histograms from a dense candidate window.

    Drop-in for the binning+histogram core of ``shot_from_window_ff`` (the
    caller keeps the count/norm/min-neighborhood epilogue).
    """
    q, f, w = vals.shape
    params = jnp.concatenate(
        [keypoints.astype(jnp.float32), rfs.astype(jnp.float32).reshape(q, 9)],
        axis=1,
    )
    params = jnp.pad(params, ((0, 0), (0, 4)))
    pad_q = (-q) % qb
    if pad_q:
        vals = jnp.pad(vals, ((0, pad_q), (0, 0), (0, 0)))
        dist_inf = jnp.pad(dist_inf, ((0, pad_q), (0, 0)),
                           constant_values=jnp.inf)
        params = jnp.pad(params, ((0, pad_q), (0, 0)))
    qp = q + pad_q
    radius_arr = jnp.asarray(radius, jnp.float32).reshape(1, 1)

    out = pl.pallas_call(
        functools.partial(_fused_kernel, qb, w),
        grid=(qp // qb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((qb, f, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((qp, N_COS, N_LO), jnp.float32),
        out_specs=pl.BlockSpec((qb, N_COS, N_LO), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(radius_arr, vals.astype(jnp.float32), dist_inf.astype(jnp.float32),
      params)
    return out.reshape(qp, N_COS * N_LO)[:q]
