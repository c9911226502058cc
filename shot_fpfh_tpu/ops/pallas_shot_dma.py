"""Run-DMA fused SHOT: window fetch + LRF + binning + histogram, ONE kernel.

The round-3/4 roofline (docs/ROOFLINE.md) pins the production SHOT rep's two
largest terms to hardware bounds the XLA formulation cannot cross:

- the candidate **gather is INDEX-bound** (~278 M idx/s at every row width
  measured) — 1.41 ms of the 4.80 ms rep is XLA fetching the window row-group
  by row-group;
- the **binning/LRF stages lose ~1.2 ms to fusion boundaries** (the dozen
  (Q, W) intermediates round-trip HBM), which `pallas_shot_fused` removes but
  still pays the gather.

This kernel removes both at once.  The xy-row window of a surface grid is
2h+1 CONTIGUOUS runs in the sorted table (ops/grid_hash.py::_xyrow_runs), so
instead of gathering ~hundreds of rows per query by index, each query issues
2h+1 **async DMA copies of whole runs** from the tile-chunked HBM table into
VMEM — the same streaming pattern `pallas_radius._pca_kernel` proved on
hardware at ~843 GB/s (bandwidth-, not index-bound: ~0.15 ms for the bench
window vs the gather's 1.41 ms floor).  The copied tiles are then assembled
into the batched feature-plane layout and the ENTIRE post-fetch stage runs
in-kernel via the shared ``pallas_shot_fused._binning_histogram_body`` —
local frames (trig-free Jacobi), exact reference soft bins, factored one-hot
MXU contraction — so no per-neighbor intermediate ever touches HBM.

Estimated composite floor with this kernel: ~0.15 ms DMA + ~0.6 ms one-hot
contraction + ~1 ms VPU binning/LRF ≈ 1.8 ms/4096 (≥2.2 M desc/s) vs the
4.80 ms measured XLA rep — to be validated on hardware (gated OFF until
then, like every Pallas kernel here; see DESIGN.md §10/§11).

Cited reference behavior: descriptors/shot.py:51-306 (bin conventions via
ops.descriptor_bins), shot_parallelization.py:185-239 (bi-scale frames).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_radius import TILE, _on_tpu, tile_table
from .pallas_shot_fused import N_COS, N_LO, _binning_histogram_body


def _align_vma(arrays):
    """Inside ``shard_map`` (``check_vma=True``, the default) every
    ``pallas_call`` operand must agree on its varying-mesh-axes set and the
    out ``ShapeDtypeStruct`` must declare one; outside shard_map this is a
    no-op.  Returns ``(aligned_arrays, vma-or-None)`` — replicated operands
    (the tiled table, the radius scalars) are ``pcast`` to varying over the
    union of the block inputs' axes (the keypoint shard axis)."""
    vma = frozenset()
    for x in arrays:
        vma |= getattr(jax.typeof(x), "vma", frozenset())
    if not vma:
        return list(arrays), None

    def cast(x):
        missing = vma - getattr(jax.typeof(x), "vma", frozenset())
        if not missing:
            return x
        return jax.lax.pcast(x, tuple(sorted(missing)), to="varying")

    return [cast(x) for x in arrays], vma


def _stream_planes(qb, n_runs, run_tiles, table_ref, runs_ref, seg_ref,
                   scratch, sems, smem, smem_sem):
    """Shared DMA prologue: copy the block's runs, assemble the batched
    (QB, W) feature planes, and build the run-segment validity mask.
    Returns ``(planes [6 x (QB, W)], valid (QB, W))``."""
    cp = pltpu.make_async_copy(runs_ref, smem, smem_sem)
    cp.start()
    cp.wait()

    # one DMA per (query, run): (run_tiles, 8, TILE) table tiles -> scratch
    # (the proven _pca_kernel pattern; one semaphore per query)
    def dma(q, j):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(smem[q, 3 * j], run_tiles)],
            scratch.at[q, j],
            sems.at[q],
        )

    for q in range(qb):
        for j in range(n_runs):
            dma(q, j).start()
    for q in range(qb):
        for j in range(n_runs):
            dma(q, j).wait()

    # assemble batched (QB, W) feature planes from the per-(run, tile)
    # scratch segments: a lane concat of static slices (the layout the shared
    # body and its dots expect); W = n_runs * run_tiles * TILE
    w = n_runs * run_tiles * TILE
    planes = []
    for f in range(6):
        segs = [scratch[:, j, u, f, :]
                for j in range(n_runs) for u in range(run_tiles)]
        planes.append(jnp.concatenate(segs, axis=1))

    # validity: lane -> (run j, row offset u*TILE + lane%TILE); a lane is a
    # true window row iff its row offset lies in the run's [s_off, e_off)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    valid = jnp.zeros((qb, w), jnp.bool_)
    seg_i = seg_ref[:]
    for j in range(n_runs):
        base = j * run_tiles * TILE
        row_off = lane - base
        in_run = (lane >= base) & (lane < base + run_tiles * TILE)
        s_j = seg_i[:, 2 * j:2 * j + 1]
        e_j = seg_i[:, 2 * j + 1:2 * j + 2]
        valid = valid | (in_run & (row_off >= s_j) & (row_off < e_j))
    return planes, valid


def _dma_kernel(qb, n_runs, run_tiles, compute_rfs, has_rf,
                radius_ref, runs_ref, seg_ref, params_ref, table_ref,
                out_ref, *rest):
    if compute_rfs:
        rfs_out, cnt_ref = rest[0], rest[1]
        scratch, sems, smem, smem_sem = rest[2:]
        rfs_outs = [rfs_out]
    else:
        cnt_ref = rest[0]
        scratch, sems, smem, smem_sem = rest[1:]
        rfs_outs = []

    w = n_runs * run_tiles * TILE
    planes, valid = _stream_planes(qb, n_runs, run_tiles, table_ref,
                                   runs_ref, seg_ref, scratch, sems, smem,
                                   smem_sem)
    p = params_ref[:]
    r = radius_ref[0, 0]
    dx = planes[0] - p[:, 0:1]
    dy = planes[1] - p[:, 1:2]
    dz = planes[2] - p[:, 2:3]
    rho2 = dx * dx + dy * dy + dz * dz
    big = jnp.float32(3.4e38)  # body convention: >= 3e38 marks invalid
    d = jnp.where(valid & (rho2 <= r * r), jnp.sqrt(rho2), big)
    rf_d = None
    if has_rf:
        r_rf = radius_ref[0, 1]
        rf_d = jnp.where(valid & (rho2 <= r_rf * r_rf), jnp.sqrt(rho2), big)

    # neighborhood size for the caller's min-neighborhood/normalize epilogue
    cnt = jnp.sum(((d < jnp.float32(3.0e38)) & (d > 0)).astype(jnp.float32),
                  axis=1, keepdims=True)
    cnt_ref[:] = jnp.concatenate(
        [cnt, jnp.zeros((qb, 15), jnp.float32)], axis=1)

    _binning_histogram_body(
        qb, w, compute_rfs, has_rf, r, radius_ref[0, 1],
        planes, d, rf_d, p, out_ref, rfs_outs,
    )


@functools.partial(
    jax.jit, static_argnames=("qb", "interpret", "normalize",
                              "min_neighborhood_size"),
)
def shot_descriptor_dma(
    grid,
    keypoints: jnp.ndarray,   # (Q, 3)
    radius,
    rfs=None,                 # (Q, 3, 3) shared frames (multiscale), or None
    rf_radius=None,           # bi-scale: frames from this radius
    normalize: bool = True,
    min_neighborhood_size: int = 100,
    qb: int = 8,
    interpret: bool | None = None,
):
    """(Q, 352) SHOT descriptors + frames straight from the grid: run-DMA
    fetch + in-kernel LRF/binning/histogram, zero XLA gathers.

    Drop-in for ``window_distances`` + ``shot_from_window_ff`` on xy-row
    grids built with normals extras.  Returns ``(desc (Q, 352), rfs)``.
    """
    from ..models.shot import _shot_finalize
    from .grid_hash import _xyrow_runs

    assert getattr(grid, "use_xyrow", False) and grid.xyrow_run_cap > 0, (
        "shot_descriptor_dma needs an xy-row grid (surface-like cloud, "
        "build_grid with a cell table)"
    )
    assert grid.packed_sorted.shape[1] >= 6, "grid needs extras=normals"
    if interpret is None:
        interpret = not _on_tpu()

    queries = jnp.asarray(keypoints, jnp.float32)
    q = queries.shape[0]
    n_runs = 2 * grid.halo + 1
    nt = -(-grid.packed_sorted.shape[0] // TILE)
    run_tiles = min(-(-int(grid.xyrow_run_cap) // TILE) + 1, nt)
    table = tile_table(grid.packed_sorted[:, :6], 8)

    start, end = _xyrow_runs(grid, queries)            # (Q, n_runs)
    t = jnp.clip(start // TILE, 0, max(nt - run_tiles, 0))
    s_off = start - t * TILE
    e_off = jnp.maximum(end - t * TILE, s_off)

    pad_q = (-q) % qb
    qp = q + pad_q
    blocks = qp // qb

    runs_cols = [jnp.zeros((q,), jnp.int32)] * 32
    for j in range(n_runs):
        runs_cols[3 * j] = t[:, j]
        runs_cols[3 * j + 1] = s_off[:, j]
        runs_cols[3 * j + 2] = e_off[:, j]
    runs = jnp.pad(jnp.stack(runs_cols, axis=1), ((0, pad_q), (0, 96)))

    seg_cols = [jnp.zeros((q,), jnp.int32)] * 32
    for j in range(n_runs):
        seg_cols[2 * j] = s_off[:, j]
        seg_cols[2 * j + 1] = e_off[:, j]
    seg = jnp.pad(jnp.stack(seg_cols, axis=1), ((0, pad_q), (0, 0)))

    compute_rfs = rfs is None
    has_rf = compute_rfs and rf_radius is not None
    params = queries
    if compute_rfs:
        params = jnp.pad(params, ((0, 0), (0, 13)))
    else:
        params = jnp.concatenate(
            [params, jnp.asarray(rfs, jnp.float32).reshape(q, 9)], axis=1)
        params = jnp.pad(params, ((0, 0), (0, 4)))
    params = jnp.pad(params, ((0, pad_q), (0, 0)))

    radius_arr = jnp.stack([
        jnp.asarray(radius, jnp.float32),
        jnp.asarray(radius if rf_radius is None else rf_radius, jnp.float32),
    ]).reshape(1, 2)

    (radius_arr, runs, seg, params, table), vma = _align_vma(
        (radius_arr, runs, seg, params, table))
    out_shapes = [jax.ShapeDtypeStruct((qp, N_COS, N_LO), jnp.float32,
                                       vma=vma)]
    out_specs = [pl.BlockSpec((qb, N_COS, N_LO), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    if compute_rfs:
        out_shapes.append(jax.ShapeDtypeStruct((qp, 16), jnp.float32,
                                               vma=vma))
        out_specs.append(pl.BlockSpec((qb, 16), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    out_shapes.append(jax.ShapeDtypeStruct((qp, 16), jnp.float32, vma=vma))
    out_specs.append(pl.BlockSpec((qb, 16), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _dma_kernel, qb, n_runs, run_tiles, compute_rfs, has_rf)
    out = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((qb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 32), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((qb, n_runs, run_tiles, 8, TILE), jnp.float32),
            pltpu.SemaphoreType.DMA((qb,)),
            pltpu.SMEM((qb, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(radius_arr, runs, seg, params, table)

    hist = out[0].reshape(qp, N_COS * N_LO)[:q]
    if compute_rfs:
        rfs_out = out[1].reshape(qp, 16)[:q, :9].reshape(q, 3, 3)
        cnt = out[2].reshape(qp, 16)[:q, 0]
    else:
        rfs_out = jnp.asarray(rfs, jnp.float32)
        cnt = out[1].reshape(qp, 16)[:q, 0]
    desc = _shot_finalize(hist, cnt, normalize, min_neighborhood_size)
    return desc, rfs_out


def _spfh_dma_kernel(qb, n_runs, run_tiles, n_bins, decorrelated,
                     radius_ref, runs_ref, seg_ref, params_ref, table_ref,
                     out_ref, cnt_ref, scratch, sems, smem, smem_sem):
    """SPFH (FPFH pass 1) over run-DMA windows: Darboux + bins + contraction
    via the bodies shared with ``pallas_fpfh_fused``."""
    from .descriptor_bins import darboux_angles
    from .pallas_fpfh_fused import _spfh_hist_decorr, _spfh_hist_joint
    from .descriptor_bins import mosaic_atan2 as _atan2

    w = n_runs * run_tiles * TILE
    planes, seg_valid = _stream_planes(qb, n_runs, run_tiles, table_ref,
                                       runs_ref, seg_ref, scratch, sems,
                                       smem, smem_sem)
    p = params_ref[:]   # (QB, 16): [qx qy qz | unx uny unz | pad...]
    r = radius_ref[0, 0]
    dxb = planes[0] - p[:, 0:1]
    dyb = planes[1] - p[:, 1:2]
    dzb = planes[2] - p[:, 2:3]
    rho2 = dxb * dxb + dyb * dyb + dzb * dzb
    ok = seg_valid & (rho2 <= r * r)       # in-radius incl. self (the /count
    valid = ok & (rho2 > 0)                # denominator); self excluded from
    okf = ok                               # the bin weights (fpfh.py:62-88)
    dx = jnp.where(okf, dxb, 0.0)
    dy = jnp.where(okf, dyb, 0.0)
    dz = jnp.where(okf, dzb, 0.0)
    nx = jnp.where(okf, planes[3], 0.0)
    ny = jnp.where(okf, planes[4], 0.0)
    nz = jnp.where(okf, planes[5], 0.0)
    ux, uy, uz = p[:, 3:4], p[:, 4:5], p[:, 5:6]
    d_safe = jnp.where(valid, jnp.sqrt(rho2), 1.0)
    alpha, phi, theta = darboux_angles(dx, dy, dz, nx, ny, nz, ux, uy, uz,
                                       d_safe, atan2=_atan2)
    vf = valid.astype(jnp.float32)

    cnt = jnp.maximum(
        jnp.sum(ok.astype(jnp.float32), axis=1, keepdims=True), 1.0)
    cnt_ref[:] = jnp.concatenate(
        [cnt, jnp.zeros((qb, 15), jnp.float32)], axis=1)

    if decorrelated:
        _spfh_hist_decorr(qb, w, n_bins, alpha, phi, theta, vf, out_ref)
    else:
        _spfh_hist_joint(qb, w, n_bins, alpha, phi, theta, vf, out_ref)


@functools.partial(
    jax.jit, static_argnames=("n_bins", "decorrelated", "qb", "interpret"),
)
def spfh_block_dma(
    grid,
    table,
    qc: jnp.ndarray,    # (C, 3) queries; rows at 1.0e6 are padding
    qn: jnp.ndarray,    # (C, 3) query normals
    radius,
    n_bins: int,
    decorrelated: bool,
    qb: int = 8,
    interpret: bool | None = None,
):
    """One (C,)-query block of count-normalized SPFH via run-DMA windows.
    ``table`` is ``tile_table(grid.packed_sorted[:, :6], 8)`` (hoisted so
    chunked/sharded callers build it once).  C must be a multiple of qb."""
    from .grid_hash import _xyrow_runs

    if interpret is None:
        interpret = not _on_tpu()
    chunk = qc.shape[0]
    n = grid.packed_sorted.shape[0]
    n_runs = 2 * grid.halo + 1
    nt = -(-n // TILE)
    run_tiles = min(-(-int(grid.xyrow_run_cap) // TILE) + 1, nt)
    radius_arr = jnp.stack([
        jnp.asarray(radius, jnp.float32), jnp.asarray(radius, jnp.float32),
    ]).reshape(1, 2)

    start, end = _xyrow_runs(grid, qc)
    t = jnp.clip(start // TILE, 0, max(nt - run_tiles, 0))
    s_off = start - t * TILE
    e_off = jnp.maximum(end - t * TILE, s_off)
    runs_cols = [jnp.zeros((chunk,), jnp.int32)] * 32
    seg_cols = [jnp.zeros((chunk,), jnp.int32)] * 32
    for j in range(n_runs):
        runs_cols[3 * j] = t[:, j]
        runs_cols[3 * j + 1] = s_off[:, j]
        runs_cols[3 * j + 2] = e_off[:, j]
        seg_cols[2 * j] = s_off[:, j]
        seg_cols[2 * j + 1] = e_off[:, j]
    runs = jnp.pad(jnp.stack(runs_cols, axis=1), ((0, 0), (0, 96)))
    seg = jnp.stack(seg_cols, axis=1)
    params = jnp.concatenate([qc, qn, jnp.zeros((chunk, 10))], axis=1)

    (radius_arr, runs, seg, params, table), vma = _align_vma(
        (radius_arr, runs, seg, params, table))
    if decorrelated:
        out_shape = [jax.ShapeDtypeStruct((chunk, 3, n_bins), jnp.float32,
                                          vma=vma)]
        out_spec = [pl.BlockSpec((qb, 3, n_bins), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)]
    else:
        out_shape = [jax.ShapeDtypeStruct((chunk, n_bins, n_bins ** 2),
                                          jnp.float32, vma=vma)]
        out_spec = [pl.BlockSpec((qb, n_bins, n_bins ** 2),
                                 lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)]
    out_shape.append(jax.ShapeDtypeStruct((chunk, 16), jnp.float32, vma=vma))
    out_spec.append(pl.BlockSpec((qb, 16), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))

    kernel = functools.partial(_spfh_dma_kernel, qb, n_runs, run_tiles,
                               n_bins, decorrelated)
    hist, cnt = pl.pallas_call(
        kernel,
        grid=(chunk // qb,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((qb, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 32), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=out_shape,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((qb, n_runs, run_tiles, 8, TILE), jnp.float32),
            pltpu.SemaphoreType.DMA((qb,)),
            pltpu.SMEM((qb, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(radius_arr, runs, seg, params, table)
    if decorrelated:
        # (C, 3, n_bins) -> reference interleave (fpfh.py:62-88)
        hist = jnp.swapaxes(hist, 1, 2).reshape(chunk, 3 * n_bins)
    else:
        hist = hist.reshape(chunk, n_bins ** 3)
    return hist / cnt[:, 0:1]


@functools.partial(
    jax.jit, static_argnames=("n_bins", "decorrelated", "qb", "chunk",
                              "interpret"),
)
def spfh_sorted_dma(
    grid,
    radius,
    n_bins: int,
    decorrelated: bool,
    qb: int = 8,
    chunk: int = 8192,
    interpret: bool | None = None,
):
    """SPFH for every cloud point in grid-SORTED order via run-DMA windows —
    the DMA counterpart of ``models.fpfh._spfh_window_sorted`` (same
    contract: count-normalized (N_pad, D), queries are the sorted points,
    query normals from the grid extras).  At the 1M-point scale this pass is
    the dominant FPFH term; the DMA fetch replaces its index-bound gather."""
    assert getattr(grid, "use_xyrow", False) and grid.xyrow_run_cap > 0
    assert grid.packed_sorted.shape[1] >= 6, "grid needs extras=normals"
    if interpret is None:
        interpret = not _on_tpu()

    pts = grid.packed_sorted[:, :3]
    nrm = grid.packed_sorted[:, 3:6]
    n = pts.shape[0]
    table = tile_table(grid.packed_sorted[:, :6], 8)

    n_chunks = -(-n // chunk)
    padded = n_chunks * chunk
    pts_p = jnp.pad(pts, ((0, padded - n), (0, 0)), constant_values=1.0e6)
    nrm_p = jnp.pad(nrm, ((0, padded - n), (0, 0)))
    d_out = 3 * n_bins if decorrelated else n_bins ** 3

    def one(args):
        return spfh_block_dma(grid, table, args[0], args[1], radius, n_bins,
                              decorrelated, qb=qb, interpret=interpret)

    out = jax.lax.map(one, (pts_p.reshape(n_chunks, chunk, 3),
                            nrm_p.reshape(n_chunks, chunk, 3)))
    return out.reshape(padded, d_out)
