"""Fused SHOT local-RF + binning + histogram as one Pallas kernel.

The production SHOT window path (``models.shot.shot_from_window_ff``) runs, in
XLA: local-RF estimation (weighted covariance + eigh + sign votes) ->
local-coordinate transform -> per-neighbor soft-bin indices/weights ->
factored one-hot contraction.  XLA cannot fuse the one-hot construction into
the dot, so the (Q, W, 11) and (Q, W, 32) one-hot operands stream through HBM
(~541 MB per 4096-descriptor rep — the measured HBM-peak leg of the round-3
roofline, docs/ROOFLINE.md), the dozen (Q, W) binning intermediates add
fusion-boundary round trips on top, and the LRF stage re-reads the window.

This kernel fuses the whole thing: inputs are the raw feature-first window
(``vals (Q, F, W)`` with rows ``[x y z nx ny nz ...]``), the window distances,
and per-query parameters.  Per grid step it

  1. (optionally) computes the local reference frames in-kernel — the same
     (radius−d)-weighted covariance + cyclic-Jacobi eigh + majority sign
     votes as ``models.shot._local_rfs_ff`` / ``ops.eigh3.eigh3x3``, with the
     Jacobi rotations in trig-free half-angle form (Mosaic has no native
     sin/cos) — so the window is read from HBM exactly once;
  2. computes every per-neighbor quantity (local coords, angles, the four
     quadrilinear interpolations — exact reference bin conventions,
     /root/reference/shot_fpfh/descriptors/shot.py:51-306) batched on
     (QB, W) shapes, full VPU sublane utilization;
  3. builds the factored one-hot operands per query IN VMEM (never touching
     HBM) and contracts them on the MXU with k = W lane-contraction dots —
     the same 2-group algebra as ``models.shot._shot_accumulate``:
     H = onehot(cos_bin)^T B1 + onehot(cos_nb)^T B2.

HBM traffic per rep drops from ~700 MB (one-hots + intermediates) to the
~110 MB window read.  Angle difference vs the XLA path: phi/theta come
from the Mosaic ``_atan2`` polynomial (max err ~1e-6 rad) instead of
arccos/atan2 — far inside the descriptor oracle tolerance.

Layout notes (why this shape): per-neighbor planes live lanes-major (W in
lanes), so BOTH one-hot operands are built as (bins, W) broadcast-compares —
no transposes anywhere — and contract with
``dot_general(..., (((1,), (1,)), ((), ())))`` (A B^T orientation), the form
``pallas_shot._hist_kernel`` already proved out on Mosaic.  The LRF runs on
(QB, 1) scalar planes (the ``ops.eigh3`` plane decomposition, which replaced
batched 3x3 matmuls for a 30x win there).  Booleans cast to int32/f32
immediately (Mosaic cannot lower select/xor on i1 vectors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .descriptor_bins import N_COS, N_LO, shot_soft_bins
from .descriptor_bins import mosaic_atan2 as _atan2


def _onehot_dtype():
    """One-hot operand dtype for the in-kernel histogram contractions
    (trace-time).  Default bf16 since the round-5 hardware A/B: the v5e VPU
    DOES pack bf16 elementwise work, cutting the one-hot build — headline
    rep 4.40 -> 4.12 ms (995k desc/s); weights are histogram magnitudes, so
    the rounding matches the ~0.4% the XLA baseline already quantizes to
    (PARITY).  ``SHOT_FPFH_ONEHOT_BF16=0`` restores f32."""
    import os

    return (jnp.float32 if os.environ.get("SHOT_FPFH_ONEHOT_BF16", "1") == "0"
            else jnp.bfloat16)


def _hist_dot_mode() -> str:
    """How the per-query factored one-hot contractions are issued to the MXU
    (trace-time knob ``SHOT_FPFH_HIST_DOT``; round-5 A/B — see
    docs/ROOFLINE.md):

    - ``pair`` (default): two (11, W) x (32, W) lane-contraction dots per
      query — the round-4 form.
    - ``concat``: one (11, 2W) x (32, 2W) dot per query (the two factored
      groups lane-concatenated into a single deeper contraction) — halves
      the number of MXU issues.
    - ``block``: ONE (qb·16, 2W) x (qb·32, 2W) dot per grid step over
      row-stacked per-query operands, extracting the block-diagonal
      (11, 32) tiles.  qb× redundant flops, but the MXU runs at ~1.5%
      utilization on the tiny per-query dots, so trading flops for issue
      count can win.
    - ``aside``: fold the five contribution weights into the 11-row cos
      side instead of the 32-row lo side — the lo one-hots stay pure
      compares (no mul/add chain on (32, W) shapes), one dot per
      contribution (5/query).  Same compares, ~4x fewer weighted-sum
      elements; viable because the ``none`` ablation shows the dots are
      fully overlapped.
    - ``none``: skip the dots (histogram = one-hot row sums) — ABLATION
      ONLY, wrong results; bounds the one-hot build cost.
    """
    import os

    return os.environ.get("SHOT_FPFH_HIST_DOT", "pair")


def _n_sweeps() -> int:
    """Cyclic-Jacobi sweep count for the in-kernel LRF eigh (trace-time).
    4 matches ``ops.eigh3.eigh3x3``; ``SHOT_FPFH_JACOBI_SWEEPS`` exists for
    the roofline A/B (VERDICT r4 next #7) — 3 sweeps already push off-diagonal
    mass below f32 epsilon on SHOT's well-conditioned surface covariances,
    but the default stays 4 until a hardware A/B shows the stage moving."""
    import os

    return int(os.environ.get("SHOT_FPFH_JACOBI_SWEEPS", "4"))


def _lrf_planes(cx, cy, cz, okf, rho, r):
    """In-kernel local reference frames on (QB, 1) scalar planes.

    Same math as ``models.shot._local_rfs_ff``: (r−d)-weighted covariance,
    4-sweep cyclic Jacobi (``ops.eigh3.eigh3x3`` conventions, trig-free
    rotations), majority sign votes on the x/z axes, y = z × x, identity for
    empty neighborhoods.  Returns three [e0, e1, e2] axis-component lists.
    """
    wgt = jnp.maximum(r - rho, 0.0) * okf  # (QB, W)
    inv = 1.0 / jnp.maximum(jnp.sum(wgt, axis=1, keepdims=True), 1e-12)
    prods = {(0, 0): cx * cx, (0, 1): cx * cy, (0, 2): cx * cz,
             (1, 1): cy * cy, (1, 2): cy * cz, (2, 2): cz * cz}
    a = {k: jnp.sum(wgt * v_, axis=1, keepdims=True) * inv
         for k, v_ in prods.items()}

    # unit-magnitude scaling for f32 headroom (ops/eigh3.py:73)
    scale = jnp.abs(a[(0, 0)])
    for k in a:
        scale = jnp.maximum(scale, jnp.abs(a[k]))
    scale = jnp.maximum(scale, 1e-30)
    a = {k: v_ / scale for k, v_ in a.items()}

    one = jnp.ones_like(scale)
    zero = jnp.zeros_like(scale)
    v = {(i, j): (one if i == j else zero)
         for i in range(3) for j in range(3)}
    key = lambda i, j: (i, j) if i <= j else (j, i)  # noqa: E731

    def rotate(a, v, pp, qq):
        # trig-free Jacobi rotation zeroing A[pp, qq]: with
        # θ = ½·atan2(2·apq, aqq−app) (the eigh3x3 convention), cos θ and
        # sin θ follow from half-angle identities on cos 2θ = α/h — no
        # sin/cos, which Mosaic does not lower
        rr = ({0, 1, 2} - {pp, qq}).pop()
        app, aqq, apq = a[key(pp, pp)], a[key(qq, qq)], a[key(pp, qq)]
        apr, aqr = a[key(pp, rr)], a[key(qq, rr)]
        alpha = aqq - app
        beta = 2.0 * apq
        h = jnp.sqrt(alpha * alpha + beta * beta)
        ratio = jnp.where(h > 1e-30, alpha / jnp.maximum(h, 1e-30), 1.0)
        c = jnp.sqrt(jnp.maximum((1.0 + ratio) * 0.5, 0.0))
        s = jnp.sqrt(jnp.maximum((1.0 - ratio) * 0.5, 0.0)) * jnp.where(
            beta >= 0.0, 1.0, -1.0
        )
        c2, s2, cs = c * c, s * s, c * s
        out = dict(a)
        out[key(pp, pp)] = c2 * app - 2.0 * cs * apq + s2 * aqq
        out[key(qq, qq)] = s2 * app + 2.0 * cs * apq + c2 * aqq
        out[key(pp, qq)] = cs * (app - aqq) + (c2 - s2) * apq
        out[key(pp, rr)] = c * apr - s * aqr
        out[key(qq, rr)] = s * apr + c * aqr
        vout = dict(v)
        for row in range(3):
            vp, vq = v[(row, pp)], v[(row, qq)]
            vout[(row, pp)] = c * vp - s * vq
            vout[(row, qq)] = s * vp + c * vq
        return out, vout

    for _ in range(_n_sweeps()):  # unrolled (3 rotations/sweep, scalar planes)
        a, v = rotate(a, v, 0, 1)
        a, v = rotate(a, v, 0, 2)
        a, v = rotate(a, v, 1, 2)

    evals = [a[(0, 0)], a[(1, 1)], a[(2, 2)]]
    cols = [[v[(r_, c_)] for r_ in range(3)] for c_ in range(3)]

    def cswap(i, j):  # ascending sort network: (0,1), (1,2), (0,1)
        swap = evals[i] > evals[j]
        evals[i], evals[j] = (jnp.where(swap, evals[j], evals[i]),
                              jnp.where(swap, evals[i], evals[j]))
        ci = [jnp.where(swap, b_, a_) for a_, b_ in zip(cols[i], cols[j])]
        cj = [jnp.where(swap, a_, b_) for a_, b_ in zip(cols[i], cols[j])]
        cols[i], cols[j] = ci, cj

    cswap(0, 1)
    cswap(1, 2)
    cswap(0, 1)
    x_axis, z_axis = cols[2], cols[0]  # largest / smallest eigenvalue

    def vote_flip(axis):
        proj = cx * axis[0] + cy * axis[1] + cz * axis[2]
        neg = jnp.sum(okf * (proj < 0.0), axis=1, keepdims=True)
        nonneg = jnp.sum(okf * (proj >= 0.0), axis=1, keepdims=True)
        flip = jnp.where(neg > nonneg, -1.0, 1.0)
        return [e * flip for e in axis]

    x_axis = vote_flip(x_axis)
    z_axis = vote_flip(z_axis)
    y_axis = [z_axis[1] * x_axis[2] - z_axis[2] * x_axis[1],
              z_axis[2] * x_axis[0] - z_axis[0] * x_axis[2],
              z_axis[0] * x_axis[1] - z_axis[1] * x_axis[0]]

    empty = jnp.sum(okf, axis=1, keepdims=True) == 0.0
    for axis, ident in ((x_axis, (1.0, 0.0, 0.0)), (y_axis, (0.0, 1.0, 0.0)),
                        (z_axis, (0.0, 0.0, 1.0))):
        for i in range(3):
            axis[i] = jnp.where(empty, ident[i], axis[i])
    return x_axis, y_axis, z_axis


def _binning_histogram_body(qb, w, compute_rfs, has_rf_dist, r, r_rf,
                            planes, d, rf_d, p, out_ref, rfs_out):
    """The whole post-fetch SHOT stage on loaded arrays: (optional) in-kernel
    LRFs, soft binning, factored one-hot contraction.  Shared by the
    VMEM-window kernel (``_fused_kernel``) and the run-DMA kernel
    (``ops.pallas_shot_dma``), so the two lowering paths cannot drift.

    ``planes``: the six raw (QB, W) feature planes [x y z nx ny nz];
    ``d``: (QB, W) distance-or-big (>= 3e38 marks invalid lanes); ``rf_d``:
    the bi-scale frame-radius validity plane or None; ``p``: (QB, 16) params
    [qx qy qz | rf row-major 9 | pad]."""
    d = d[:]
    finite = d < jnp.float32(3.0e38)
    rho = jnp.where(finite, d, 0.0)
    vf = (finite & (rho > 0)).astype(jnp.float32)

    # select (not multiply) the invalid lanes to zero so a non-finite value
    # in a padding/out-of-radius lane cannot poison the histogram via NaN*0
    # — the same robustness the XLA path gets from its where-masking
    cxb = planes[0] - p[:, 0:1]
    cyb = planes[1] - p[:, 1:2]
    czb = planes[2] - p[:, 2:3]
    cx = jnp.where(finite, cxb, 0.0)
    cy = jnp.where(finite, cyb, 0.0)
    cz = jnp.where(finite, czb, 0.0)
    nx = jnp.where(finite, planes[3], 0.0)
    ny = jnp.where(finite, planes[4], 0.0)
    nz = jnp.where(finite, planes[5], 0.0)

    if compute_rfs:
        if has_rf_dist:
            # bi-scale: frames come from the rf_radius neighborhood (a
            # DIFFERENT validity plane over the same window — reference
            # shot_parallelization.py:185-239), descriptor bins from ``d``
            d2 = rf_d[:]
            finite2 = d2 < jnp.float32(3.0e38)
            rho2 = jnp.where(finite2, d2, 0.0)
            cx2 = jnp.where(finite2, cxb, 0.0)
            cy2 = jnp.where(finite2, cyb, 0.0)
            cz2 = jnp.where(finite2, czb, 0.0)
            x_ax, y_ax, z_ax = _lrf_planes(
                cx2, cy2, cz2, finite2.astype(jnp.float32), rho2, r_rf
            )
        else:
            # cx/cy/cz are already where-masked to zero on invalid lanes
            x_ax, y_ax, z_ax = _lrf_planes(
                cx, cy, cz, finite.astype(jnp.float32), rho, r
            )
        rfs_ref = rfs_out[0]
        # rf row-major [x0 y0 z0 x1 y1 z1 x2 y2 z2] (columns are the axes);
        # one full-block store (a lane concat lowers more robustly on Mosaic
        # than nine strided single-column stores)
        rfs_ref[:] = jnp.concatenate(
            [x_ax[0], y_ax[0], z_ax[0],
             x_ax[1], y_ax[1], z_ax[1],
             x_ax[2], y_ax[2], z_ax[2],
             jnp.zeros((qb, 7), jnp.float32)], axis=1,
        )
    else:
        x_ax = [p[:, 3:4], p[:, 6:7], p[:, 9:10]]
        y_ax = [p[:, 4:5], p[:, 7:8], p[:, 10:11]]
        z_ax = [p[:, 5:6], p[:, 8:9], p[:, 11:12]]

    # local = centered @ rf (rf columns are the x/y/z axes)
    lx = cx * x_ax[0] + cy * x_ax[1] + cz * x_ax[2]
    ly = cx * y_ax[0] + cy * y_ax[1] + cz * y_ax[2]
    lz = cx * z_ax[0] + cy * z_ax[1] + cz * z_ax[2]
    cosine = jnp.clip(
        nx * z_ax[0] + ny * z_ax[1] + nz * z_ax[2], -1.0, 1.0
    )

    theta = _atan2(ly, lx)
    phi = _atan2(jnp.sqrt(jnp.maximum(lx * lx + ly * ly, 0.0)), lz)
    # shared reference bin conventions (ops.descriptor_bins), merged to the
    # 2-group form of models/shot.py::_shot_accumulate; weights pre-masked
    sb = shot_soft_bins(lx, ly, lz, rho, theta, phi, cosine, r)
    base, lo_husk, lo_vert, lo_az = sb.base, sb.lo_husk, sb.lo_vert, sb.lo_az
    cos_bin, cos_nb = sb.cos_bin, sb.cos_nb
    w_same = sb.w_same * vf
    w_husk = sb.w_husk_nb * vf
    w_vert = sb.w_vert_nb * vf
    w_az = sb.abs_az * vf
    w_cnb = sb.abs_cos * vf

    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (N_COS, w), 0)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (N_LO, w), 0)
    dims = (((1,), (1,)), ((), ()))
    # A/B knob: build the one-hot operands in bf16 (halves the VPU element
    # width of the 10+ (bins, W) mul/add passes IF the VPU packs bf16 2x —
    # the open question this knob measures; the round-4 "Bad lhs type" was
    # the explicit fp32 contract precision, not bf16 itself, so the dots use
    # DEFAULT precision in bf16 mode).  Default f32 until a hardware A/B
    # shows a win; weights are histogram magnitudes ~1-4, so bf16 rounding
    # is the same ~0.4% the XLA baseline already accepts (PARITY).
    hdt = _onehot_dtype()
    prec = (jax.lax.Precision.DEFAULT if hdt == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    mode = _hist_dot_mode()
    a_blocks, b_blocks = [], []
    for qi in range(qb):
        def row(a, qi=qi):
            return a[qi:qi + 1, :].astype(hdt)

        def rowi(a, qi=qi):
            return a[qi:qi + 1, :]

        oh_base = (rowi(base) == iota_lo).astype(hdt)
        a1 = (rowi(cos_bin) == iota_hi).astype(hdt)
        a2 = (rowi(cos_nb) == iota_hi).astype(hdt)
        if mode == "aside":
            pairs = (
                (a1 * row(w_same), oh_base),
                (a1 * row(w_husk), (rowi(lo_husk) == iota_lo).astype(hdt)),
                (a1 * row(w_vert), (rowi(lo_vert) == iota_lo).astype(hdt)),
                (a1 * row(w_az), (rowi(lo_az) == iota_lo).astype(hdt)),
                (a2 * row(w_cnb), oh_base),
            )
            acc = jnp.zeros((N_COS, N_LO), jnp.float32)
            for a_, b_ in pairs:
                acc = acc + jax.lax.dot_general(
                    a_, b_, dimension_numbers=dims, precision=prec,
                    preferred_element_type=jnp.float32,
                )
            out_ref[qi] = acc
            continue
        b1 = (
            oh_base * row(w_same)
            + (rowi(lo_husk) == iota_lo).astype(hdt) * row(w_husk)
            + (rowi(lo_vert) == iota_lo).astype(hdt) * row(w_vert)
            + (rowi(lo_az) == iota_lo).astype(hdt) * row(w_az)
        )
        b2 = oh_base * row(w_cnb)
        if mode == "pair":
            acc = jax.lax.dot_general(
                a1, b1, dimension_numbers=dims, precision=prec,
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                a2, b2, dimension_numbers=dims, precision=prec,
                preferred_element_type=jnp.float32,
            )
            out_ref[qi] = acc
        elif mode == "concat":
            a = jnp.concatenate([a1, a2], axis=1)  # (11, 2W)
            b = jnp.concatenate([b1, b2], axis=1)  # (32, 2W)
            out_ref[qi] = jax.lax.dot_general(
                a, b, dimension_numbers=dims, precision=prec,
                preferred_element_type=jnp.float32,
            )
        elif mode == "none":  # ablation: no contraction, wrong results
            out_ref[qi] = (
                jnp.sum(b1 + b2, axis=1).astype(jnp.float32)[None, :]
                + jnp.sum(a1 + a2, axis=1).astype(jnp.float32)[:, None]
            )
        else:  # block: row-stack, one dot per grid step below
            pad = jnp.zeros((16 - N_COS, a1.shape[1]), hdt)
            a_blocks.append(jnp.concatenate(
                [jnp.concatenate([a1, a2], axis=1),
                 jnp.concatenate([pad, pad], axis=1)], axis=0))  # (16, 2W)
            b_blocks.append(jnp.concatenate([b1, b2], axis=1))   # (32, 2W)
    if mode == "block":
        a_all = jnp.concatenate(a_blocks, axis=0)  # (qb*16, 2W)
        b_all = jnp.concatenate(b_blocks, axis=0)  # (qb*32, 2W)
        big = jax.lax.dot_general(
            a_all, b_all, dimension_numbers=dims, precision=prec,
            preferred_element_type=jnp.float32,
        )  # (qb*16, qb*32): block-diagonal (11, 32) tiles are the answers
        for qi in range(qb):
            out_ref[qi] = big[qi * 16:qi * 16 + N_COS,
                              qi * N_LO:(qi + 1) * N_LO]


def _fused_kernel(qb, w, compute_rfs, has_rf_dist, radius_ref, vals_ref,
                  dist_ref, *refs):
    if has_rf_dist:
        rf_dist_ref, params_ref, out_ref, *rfs_out = refs
    else:
        rf_dist_ref = None
        params_ref, out_ref, *rfs_out = refs
    planes = [vals_ref[:, f, :] for f in range(6)]
    _binning_histogram_body(
        qb, w, compute_rfs, has_rf_dist,
        radius_ref[0, 0], radius_ref[0, 1],
        planes, dist_ref, rf_dist_ref, params_ref[:], out_ref, rfs_out,
    )


def _default_qb() -> int:
    """Query-block rows per grid step (``SHOT_FPFH_SHOT_QB``, default 8).
    Trace-time knob for A/B sweeps; callers that pass ``qb`` explicitly
    bypass it.  qb also sets the lane count of the in-kernel Jacobi LRF's
    (qb, 1) scalar planes."""
    import os

    return int(os.environ.get("SHOT_FPFH_SHOT_QB", "8"))


@functools.partial(jax.jit, static_argnames=("qb", "interpret"))
def shot_binning_histogram(
    vals: jnp.ndarray,      # (Q, F>=6, W) feature-first window
    dist_inf: jnp.ndarray,  # (Q, W), +inf marks out-of-radius/invalid lanes
    keypoints: jnp.ndarray, # (Q, 3)
    rfs,                    # (Q, 3, 3) local RFs (columns x/y/z), or None
    radius,
    rf_dist_inf=None,       # (Q, W) rf-radius validity plane (bi-scale)
    rf_radius=None,
    qb: int | None = None,
    interpret: bool = False,
):
    """Unnormalized (Q, 352) SHOT histograms from a dense candidate window.

    Drop-in for the local-RF + binning + histogram core of
    ``shot_from_window_ff`` (the caller keeps the count/norm/min-neighborhood
    epilogue).  With ``rfs=None`` the local reference frames are computed
    inside the kernel (one HBM read of the window for the whole stage) and
    returned: ``(hist (Q, 352), rfs (Q, 3, 3))`` — from the ``dist_inf``
    neighborhood, or from the ``rf_dist_inf``/``rf_radius`` one when given
    (the bi-scale convention: frames and bins use different radii over the
    same window).  With ``rfs`` given (e.g. multiscale shared frames), only
    the histograms are returned.
    """
    if qb is None:
        qb = _default_qb()
    q, f, w = vals.shape
    compute_rfs = rfs is None
    has_rf_dist = compute_rfs and rf_dist_inf is not None
    params = keypoints.astype(jnp.float32)
    if compute_rfs:
        params = jnp.pad(params, ((0, 0), (0, 13)))
    else:
        params = jnp.concatenate(
            [params, rfs.astype(jnp.float32).reshape(q, 9)], axis=1
        )
        params = jnp.pad(params, ((0, 0), (0, 4)))
    pad_q = (-q) % qb
    if pad_q:
        vals = jnp.pad(vals, ((0, pad_q), (0, 0), (0, 0)))
        dist_inf = jnp.pad(dist_inf, ((0, pad_q), (0, 0)),
                           constant_values=jnp.inf)
        params = jnp.pad(params, ((0, pad_q), (0, 0)))
        if has_rf_dist:
            rf_dist_inf = jnp.pad(rf_dist_inf, ((0, pad_q), (0, 0)),
                                  constant_values=jnp.inf)
    qp = q + pad_q
    radius_arr = jnp.stack([
        jnp.asarray(radius, jnp.float32),
        jnp.asarray(radius if rf_radius is None else rf_radius, jnp.float32),
    ]).reshape(1, 2)

    dist_spec = pl.BlockSpec((qb, w), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((qb, f, w), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        dist_spec,
    ]
    args = [radius_arr, vals.astype(jnp.float32),
            dist_inf.astype(jnp.float32)]
    if has_rf_dist:
        in_specs.append(dist_spec)
        args.append(rf_dist_inf.astype(jnp.float32))
    in_specs.append(pl.BlockSpec((qb, 16), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    args.append(params)

    out_shapes = [jax.ShapeDtypeStruct((qp, N_COS, N_LO), jnp.float32)]
    out_specs = [pl.BlockSpec((qb, N_COS, N_LO), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    if compute_rfs:
        out_shapes.append(jax.ShapeDtypeStruct((qp, 16), jnp.float32))
        out_specs.append(pl.BlockSpec((qb, 16), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_fused_kernel, qb, w, compute_rfs, has_rf_dist),
        grid=(qp // qb,),
        in_specs=in_specs,
        out_shape=out_shapes,
        out_specs=out_specs,
        interpret=interpret,
    )(*args)
    hist = out[0].reshape(qp, N_COS * N_LO)[:q]
    if compute_rfs:
        return hist, out[1][:q, :9].reshape(q, 3, 3)
    return hist
