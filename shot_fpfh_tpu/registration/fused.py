"""Fully-fused registration: the whole pipeline as ONE XLA program.

The reference executes registration as a sequence of host-orchestrated stages
(scripts/register_point_clouds.py:25-158).  Here the complete chain —

  SHOT descriptors (scan+ref) → ratio matching → RANSAC → point-to-plane ICP

— compiles into a single ``jit``: zero host round-trips, every intermediate
stays in HBM, and XLA schedules/fuses across stage boundaries.  This is the
production serving entry point (and the driver's ``entry()`` flagship step).

Fixed-shape tricks that make it possible:
- keypoints are padded with validity masks; invalid keypoints produce all-zero
  descriptors (the SHOT sparse-neighborhood convention doubles as padding).
- "variable-length" match lists become a boolean ``valid_match`` row mask.
- RANSAC samples 4 *valid* matches per draw via masked Gumbel-top-k (no
  dynamic-shape choice), and counts inliers only over valid rows.
- ICP runs its bounded ``lax.while_loop`` on a pre-subsampled padded scan.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.solvers import solve_point_to_plane, solve_point_to_point
from ..core.transform import RigidTransform
from ..models.shot import local_reference_frames, shot_from_neighborhoods
from ..ops.grid_hash import grid_nearest_neighbor
from ..ops.neighbors import nearest_neighbor, radius_search
from .matching import descriptor_sq_dists, top2_rows


class FusedResult(NamedTuple):
    ransac_transform: RigidTransform
    icp_transform: RigidTransform
    ransac_inlier_ratio: jnp.ndarray
    n_matches: jnp.ndarray
    icp_rms: jnp.ndarray
    icp_converged: jnp.ndarray
    # keypoint indices derived by register_pair's host wrapper (grid
    # subsampling at keypoint_voxel); None when fused_registration is called
    # directly.  Recorded so callers (pipeline.run_fused) don't repeat the
    # full-cloud subsample passes.
    scan_keypoint_idx: np.ndarray | None = None
    ref_keypoint_idx: np.ndarray | None = None


def _shot(kp, valid, sup, nrm, radius, k_max, min_nb, grid=None,
          rf_radius=None, local_rfs=None, return_rfs=False):
    """Single-scale SHOT, or bi-scale when ``rf_radius`` is given (local
    frames from the ``rf_radius`` neighborhood, bins over ``radius`` — the
    reference's ``compute_descriptor_bi_scale``, shot_parallelization.py).
    ``local_rfs``/``return_rfs`` thread shared frames across multiscale
    scales (reference shot_parallelization.py:241-312)."""
    if grid is not None:
        # grid path: grouped feature-planar window fetch, no top-k — the
        # exact uncapped radius neighborhoods at ~2x the selected-k
        # throughput (requires the grid built with extras=normals and a cell
        # covering max(radius, rf_radius))
        from ..models.shot import _use_dma_kernel, shot_from_window_ff
        from ..ops.grid_hash import window_distances

        if _use_dma_kernel(grid):
            # run-DMA fused kernel: no XLA gather; padding keypoints are
            # zeroed post-hoc (the gather path folds ``valid`` into the
            # window mask instead — same per-row result)
            from ..ops.pallas_shot_dma import shot_descriptor_dma

            desc, rfs = shot_descriptor_dma(
                grid, kp, radius, rfs=local_rfs,
                rf_radius=rf_radius if local_rfs is None else None,
                normalize=True, min_neighborhood_size=min_nb,
            )
            desc = jnp.where(valid[:, None], desc, 0.0)
            return (desc, rfs) if return_rfs else desc

        vals, d, win_ok, _rows = window_distances(grid, kp)
        ok = win_ok & (d <= radius) & valid[:, None]
        rf_dist_inf = None
        if rf_radius is not None and local_rfs is None:
            ok_rf = win_ok & (d <= rf_radius) & valid[:, None]
            rf_dist_inf = jnp.where(ok_rf, d, jnp.inf)
        desc, rfs = shot_from_window_ff(
            kp, vals, jnp.where(ok, d, jnp.inf), radius,
            normalize=True, min_neighborhood_size=min_nb,
            local_rfs=local_rfs,
            rf_dist_inf=rf_dist_inf,
            rf_radius=rf_radius if rf_dist_inf is not None else None,
        )
        return (desc, rfs) if return_rfs else desc
    search_r = radius if rf_radius is None else jnp.maximum(radius, rf_radius)
    nbr = radius_search(kp, sup, search_r, k_max)
    mask = nbr.mask & valid[:, None] & (nbr.dist <= radius)
    nb_pts, nb_nrm = sup[nbr.idx], nrm[nbr.idx]
    if local_rfs is not None:
        rfs = local_rfs
    elif rf_radius is None:
        rfs = local_reference_frames(kp, nb_pts, mask, radius)
    else:
        mask_rf = nbr.mask & valid[:, None] & (nbr.dist <= rf_radius)
        rfs = local_reference_frames(kp, nb_pts, mask_rf, rf_radius)
    desc = shot_from_neighborhoods(
        kp, nb_pts, nb_nrm, mask, rfs, radius,
        normalize=True, min_neighborhood_size=min_nb,
    )
    return (desc, rfs) if return_rfs else desc


def _fpfh(kp_idx, valid, sup, nrm, radius, k_max, n_bins, decorrelated,
          grid=None):
    """FPFH leg of the fused program (reference fpfh.py:16-117): SPFH over
    every support point, then keypoint aggregation.  ``kp_idx`` are
    SORTED-order indices when ``grid`` is given (the FPFH grid's permutation)
    and original cloud indices otherwise; invalid (padding) rows zero out so
    matching's nonzero-row convention treats them like empty SHOT rows."""
    if grid is not None:
        from ..models.fpfh import (_fpfh_window_aggregate, _spfh_window_sorted,
                                   _use_dma_spfh)

        if _use_dma_spfh(grid):
            from ..ops.pallas_shot_dma import spfh_sorted_dma

            spfh_sorted = spfh_sorted_dma(grid, radius, n_bins, decorrelated)
        else:
            spfh_sorted = _spfh_window_sorted(grid, radius, n_bins,
                                              decorrelated)
        desc = _fpfh_window_aggregate(grid, spfh_sorted, kp_idx, radius)
    else:
        from ..models.fpfh import _fpfh_aggregate, _spfh_from_values
        from ..ops.grid_hash import radius_search_with_values_auto

        nbr, vals = radius_search_with_values_auto(sup, sup, nrm, radius, k_max)
        spfh = _spfh_from_values(
            sup, nrm, vals[..., :3], vals[..., 3:6], nbr.dist, nbr.mask,
            radius, n_bins, decorrelated,
        )
        desc = _fpfh_aggregate(spfh, nbr.idx, nbr.dist, nbr.mask, kp_idx)
    return jnp.where(valid[:, None], desc, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_max", "min_neighborhood_size", "n_draws", "draw_size", "max_iter",
        "point_to_plane", "descriptor", "fpfh_n_bins", "fpfh_decorrelated",
        "ms_radii",
    ),
)
def fused_registration(
    scan_kp: jnp.ndarray,        # (Qs, 3) padded scan keypoints
    scan_kp_valid: jnp.ndarray,  # (Qs,)
    ref_kp: jnp.ndarray,         # (Qr, 3)
    ref_kp_valid: jnp.ndarray,   # (Qr,)
    scan_support: jnp.ndarray,   # (Ns, 3) descriptor support clouds
    scan_normals: jnp.ndarray,
    ref_support: jnp.ndarray,    # (Nr, 3)
    ref_normals: jnp.ndarray,
    scan_sub: jnp.ndarray,       # (S, 3) ICP-subsampled scan
    scan_sub_valid: jnp.ndarray,  # (S,)
    key: jax.Array,
    *,
    radius: float,
    ratio_threshold: float = 0.9,
    ransac_threshold: float = 0.3,
    d_max: float = 0.3,
    rms_threshold: float = 1e-4,
    k_max: int = 256,
    min_neighborhood_size: int = 10,
    n_draws: int = 2048,
    draw_size: int = 4,
    max_iter: int = 40,
    point_to_plane: bool = True,
    scan_grid=None,
    ref_grid=None,
    ref_icp_grid=None,
    descriptor: str = "shot",      # "shot" | "fpfh" | "shot_multiscale"
    rf_radius=None,                # bi-scale SHOT: frames from this radius
    fpfh_n_bins: int = 5,
    fpfh_decorrelated: bool = False,
    scan_kp_idx=None,              # FPFH: keypoint indices (sorted order
    ref_kp_idx=None,               # when the fpfh grids are given)
    scan_fpfh_grid=None,
    ref_fpfh_grid=None,
    ms_radii=None,                 # multiscale: static tuple of scale radii
) -> FusedResult:
    # ---- descriptors + matching -------------------------------------------
    if descriptor == "fpfh":
        scan_desc = _fpfh(scan_kp_idx, scan_kp_valid, scan_support,
                          scan_normals, radius, k_max, fpfh_n_bins,
                          fpfh_decorrelated, grid=scan_fpfh_grid)
        ref_desc = _fpfh(ref_kp_idx, ref_kp_valid, ref_support, ref_normals,
                         radius, k_max, fpfh_n_bins, fpfh_decorrelated,
                         grid=ref_fpfh_grid)
    elif descriptor == "shot_multiscale":
        # per-scale SHOT with the first (smallest-radius) scale's frames
        # shared (reference shot_parallelization.py:241-312); the window is
        # fetched ONCE per cloud at the largest radius and every scale masks
        # it — cheaper than the staged per-scale re-fetch.  Scales
        # CONCATENATE to (Q, 352·S) — the reference multiscale WORKFLOW's
        # layout (compute_descriptor_multiscale, pipeline.py:223-270), which
        # the staged pipeline matches like any flat descriptor — so every
        # fused matching mode (simple/ratio/double) applies; the stacked
        # min-over-scales matcher remains available through the staged
        # ``match_descriptors`` (reference matching.py:77-136).
        def ms_stack(kp, kp_valid, sup, nrm, grid):
            descs, rfs = [], None
            for r in ms_radii:
                d_s, rfs_s = _shot(kp, kp_valid, sup, nrm, r, k_max,
                                   min_neighborhood_size, grid=grid,
                                   local_rfs=rfs, return_rfs=True)
                if rfs is None:
                    rfs = rfs_s
                descs.append(d_s)
            return jnp.concatenate(descs, axis=1)   # (Q, 352·S)

        scan_desc = ms_stack(scan_kp, scan_kp_valid, scan_support,
                             scan_normals, scan_grid)
        ref_desc = ms_stack(ref_kp, ref_kp_valid, ref_support, ref_normals,
                            ref_grid)
    else:
        scan_desc = _shot(scan_kp, scan_kp_valid, scan_support, scan_normals,
                          radius, k_max, min_neighborhood_size,
                          grid=scan_grid, rf_radius=rf_radius)
        ref_desc = _shot(ref_kp, ref_kp_valid, ref_support, ref_normals,
                         radius, k_max, min_neighborhood_size,
                         grid=ref_grid, rf_radius=rf_radius)

    # ---- ratio matching ----------------------------------------------------
    ref_ok = jnp.any(ref_desc != 0, axis=1) & ref_kp_valid
    d2 = descriptor_sq_dists(scan_desc, ref_desc)
    d2 = jnp.where(ref_ok[None, :], d2, jnp.inf)
    nn_idx, d1_sq, d2_sq = top2_rows(d2)
    d1 = jnp.sqrt(jnp.maximum(d1_sq, 0.0))        # inf rows stay inf
    dsecond = jnp.sqrt(jnp.maximum(d2_sq, 0.0))
    scan_ok = jnp.any(scan_desc != 0, axis=1) & scan_kp_valid
    ratio = d1 / jnp.where(dsecond > 0, dsecond, 1.0)
    valid_match = scan_ok & (ratio <= ratio_threshold) & jnp.isfinite(d1)
    n_matches = jnp.sum(valid_match)

    src = scan_kp                      # (Qs, 3)
    dst = ref_kp[nn_idx]               # (Qs, 3)
    match_w = valid_match.astype(jnp.float32)

    # ---- RANSAC (masked Gumbel-top-k sampling) ----------------------------
    thr2 = jnp.asarray(ransac_threshold, jnp.float32) ** 2
    chunk = 256
    n_chunks = -(-n_draws // chunk)

    def score_chunk(carry, k_chunk):
        best_count, best_rot, best_t = carry
        g = jax.random.gumbel(k_chunk, (chunk, src.shape[0]))
        logits = jnp.where(valid_match[None, :], g, -jnp.inf)
        _, draws = jax.lax.top_k(logits, draw_size)  # (chunk, draw_size)
        tf = solve_point_to_point(src[draws], dst[draws])
        moved = jnp.einsum("cij,mj->cmi", tf.rotation, src) + tf.translation[:, None, :]
        dd = jnp.sum((moved - dst[None]) ** 2, axis=-1)
        counts = jnp.sum((dd <= thr2).astype(jnp.float32) * match_w[None, :], axis=-1)
        i = jnp.argmax(counts)
        better = counts[i] > best_count
        return (
            jnp.where(better, counts[i], best_count),
            jnp.where(better, tf.rotation[i], best_rot),
            jnp.where(better, tf.translation[i], best_t),
        ), None

    keys = jax.random.split(key, n_chunks)
    init = (jnp.float32(-1.0), jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
    (best_count, rot0, t0), _ = jax.lax.scan(score_chunk, init, keys)
    ransac_tf = RigidTransform(rot0, t0).normalize_rotation()
    inlier_ratio = best_count / jnp.maximum(n_matches.astype(jnp.float32), 1.0)

    # ---- ICP --------------------------------------------------------------
    sub_w_base = scan_sub_valid.astype(jnp.float32)

    def body(state):
        i, rot, t, _rms, _done = state
        moved = scan_sub @ rot.T + t
        if ref_icp_grid is not None:
            # exact when d_max <= the ICP grid's cell size (see
            # grid_nearest_neighbor); register_pair builds it that way
            dist, nn = grid_nearest_neighbor(ref_icp_grid, moved)
        else:
            dist, nn = nearest_neighbor(moved, ref_support)
        w = (dist <= d_max).astype(jnp.float32) * sub_w_base
        # grid 1-NN reports dist=inf for windowless queries; w is 0 there but
        # inf * 0 = NaN, so zero the distance before weighting
        dist = jnp.where(jnp.isfinite(dist), dist, 0.0)
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        target = ref_support[nn]
        if point_to_plane:
            delta = solve_point_to_plane(moved, target, ref_normals[nn], w)
            residual = jnp.abs(jnp.sum((moved - target) * ref_normals[nn], axis=-1))
            rms = jnp.sum(residual * w) / wsum
        else:
            delta = solve_point_to_point(moved, target, w)
            rms = jnp.sqrt(jnp.sum(w * dist**2) / wsum)
        composed = delta @ RigidTransform(rot, t)
        return i + 1, composed.rotation, composed.translation, rms, rms < rms_threshold

    def cond(state):
        i, *_r, done = state
        return (i < max_iter) & (~done)

    state = (jnp.asarray(0, jnp.int32), ransac_tf.rotation, ransac_tf.translation,
             jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(False))
    _, rot, t, rms, done = jax.lax.while_loop(cond, body, state)

    return FusedResult(
        ransac_transform=ransac_tf,
        icp_transform=RigidTransform(rot, t),
        ransac_inlier_ratio=inlier_ratio,
        n_matches=n_matches,
        icp_rms=rms,
        icp_converged=done,
    )


def fused_registration_mesh(
    mesh,
    scan_kp: np.ndarray,
    scan_kp_valid: np.ndarray,
    ref_kp: np.ndarray,
    ref_kp_valid: np.ndarray,
    scan_support: np.ndarray,
    scan_normals: np.ndarray,
    ref_support: np.ndarray,
    ref_normals: np.ndarray,
    scan_sub: np.ndarray,
    scan_sub_valid: np.ndarray,
    key: jax.Array,
    *,
    radius: float,
    ratio_threshold: float = 0.9,
    ransac_threshold: float = 0.3,
    d_max: float = 0.3,
    rms_threshold: float = 1e-4,
    k_max: int = 256,
    min_neighborhood_size: int = 10,
    n_draws: int = 2048,
    draw_size: int = 4,
    max_iter: int = 40,
    point_to_plane: bool = True,
    scan_grid=None,
    ref_grid=None,
    ref_icp_grid=None,
    descriptor: str = "shot",
    rf_radius=None,
    fpfh_n_bins: int = 5,
    fpfh_decorrelated: bool = False,
    scan_kp_idx=None,
    ref_kp_idx=None,
    scan_fpfh_grid=None,
    ref_fpfh_grid=None,
    ms_radii=None,
) -> FusedResult:
    """``fused_registration`` sharded over a multi-device mesh — still ONE
    XLA program (VERDICT r4 next #2: ``--fused`` composes with
    ``--n_devices``).

    Sharding layout (same axes as the staged ``parallel.sharded`` stages,
    SURVEY §5):

    - **descriptors** — scan/ref keypoints row-sharded, grids replicated;
      FPFH's SPFH pass shards the support rows and ``all_gather``s the SPFH
      table for the keypoint aggregation (the one big collective).
    - **matching** — scan rows sharded; the ref descriptors are
      ``all_gather``ed (keypoint sets are small relative to supports).
    - **RANSAC** — draws are solved identically everywhere from the gathered
      match list (same PRNG stream as single-device, so results are
      bit-identical); inlier counting shards over matches and ``psum``s.
      Counts are exact integer-valued f32 sums, so the argmax — and hence the
      chosen transform — matches the single-device program exactly.
    - **ICP** — subsampled scan rows sharded; each iteration psums the 6x6
      point-to-plane normal equations / Kabsch sufficient statistics.

    Row counts of every sharded input must divide the mesh size
    (``register_pair`` pads to ``lcm(pad_multiple, n_devices)``)."""
    import jax.tree_util as jtu
    from jax.sharding import PartitionSpec as P

    from ..core.solvers import (
        point_to_plane_normal_eq,
        point_to_point_stats,
        solve_point_to_plane_from_normal_eq,
        solve_point_to_point_from_stats,
    )
    from ..parallel.mesh import POINTS_AXIS as AX, replicate, shard_rows

    n_dev = mesh.devices.size
    for name, arr in (("scan_kp", scan_kp), ("ref_kp", ref_kp),
                      ("scan_sub", scan_sub)):
        if len(arr) % n_dev:
            raise ValueError(
                f"{name} rows ({len(arr)}) must divide the mesh ({n_dev})")

    scan_sup32 = np.asarray(scan_support, np.float32)
    ref_sup32 = np.asarray(ref_support, np.float32)
    data = {
        "scan_kp": shard_rows(np.asarray(scan_kp, np.float32), mesh),
        "scan_v": shard_rows(np.asarray(scan_kp_valid, bool), mesh),
        "ref_kp": shard_rows(np.asarray(ref_kp, np.float32), mesh),
        "ref_v": shard_rows(np.asarray(ref_kp_valid, bool), mesh),
        "sub": shard_rows(np.asarray(scan_sub, np.float32), mesh),
        "sub_v": shard_rows(np.asarray(scan_sub_valid, bool), mesh),
        "key": replicate(np.asarray(jax.random.key_data(key)), mesh),
        "scan_sup": replicate(scan_sup32, mesh),
        "scan_nrm": replicate(np.asarray(scan_normals, np.float32), mesh),
        "ref_sup": replicate(ref_sup32, mesh),
        "ref_nrm": replicate(np.asarray(ref_normals, np.float32), mesh),
    }
    specs = {
        "scan_kp": P(AX, None), "scan_v": P(AX),
        "ref_kp": P(AX, None), "ref_v": P(AX),
        "sub": P(AX, None), "sub_v": P(AX),
        "key": P(), "scan_sup": P(), "scan_nrm": P(),
        "ref_sup": P(), "ref_nrm": P(),
    }

    def add_grid(name, g):
        if g is not None:
            data[name] = jtu.tree_map(lambda x: replicate(np.asarray(x), mesh), g)
            specs[name] = jtu.tree_map(lambda _: P(), g)

    add_grid("scan_grid", scan_grid)
    add_grid("ref_grid", ref_grid)
    add_grid("ref_icp_grid", ref_icp_grid)
    add_grid("scan_fpfh_grid", scan_fpfh_grid)
    add_grid("ref_fpfh_grid", ref_fpfh_grid)

    use_dma = False
    for g in (scan_grid, ref_grid):
        if g is not None:
            from ..models.shot import _use_dma_kernel

            use_dma = use_dma or _use_dma_kernel(g)
    for g in (scan_fpfh_grid, ref_fpfh_grid):
        if g is not None:
            from ..models.fpfh import _use_dma_spfh

            use_dma = use_dma or _use_dma_spfh(g)

    # FPFH: SPFH row-id shards (grid case) / sentinel-padded support shards
    spfh_chunk = 4096
    if descriptor == "fpfh":
        data["scan_kpi"] = shard_rows(np.asarray(scan_kp_idx, np.int32), mesh)
        data["ref_kpi"] = shard_rows(np.asarray(ref_kp_idx, np.int32), mesh)
        specs["scan_kpi"] = specs["ref_kpi"] = P(AX)
        for side, sup, nrm, g in (
            ("scan", scan_sup32, np.asarray(scan_normals, np.float32),
             scan_fpfh_grid),
            ("ref", ref_sup32, np.asarray(ref_normals, np.float32),
             ref_fpfh_grid),
        ):
            n = len(sup)
            if g is not None:
                per_dev = -(-n // (n_dev * spfh_chunk)) * spfh_chunk
                ids = np.arange(per_dev * n_dev, dtype=np.int32)
                data[f"{side}_spfh_ids"] = shard_rows(ids, mesh)
                specs[f"{side}_spfh_ids"] = P(AX)
            else:
                per_dev = -(-n // n_dev)
                q = np.full((per_dev * n_dev, 3), 1.0e6, np.float32)
                q[:n] = sup
                qn = np.zeros((per_dev * n_dev, 3), np.float32)
                qn[:n] = nrm
                data[f"{side}_spfh_q"] = shard_rows(q, mesh)
                data[f"{side}_spfh_qn"] = shard_rows(qn, mesh)
                specs[f"{side}_spfh_q"] = P(AX, None)
                specs[f"{side}_spfh_qn"] = P(AX, None)

    def gat(x, axis=0):
        return jax.lax.all_gather(x, AX, axis=axis, tiled=True)

    def body(d):
        vary = lambda x: jax.lax.pcast(x, AX, to="varying")  # noqa: E731

        # ---- descriptors (keypoint/support rows sharded) --------------------
        if descriptor == "fpfh":
            from ..models.fpfh import (_fpfh_window_agg_block,
                                       _spfh_from_values, _spfh_window_block)
            from ..ops.grid_hash import radius_search_with_values_auto

            def fpfh_side(side, sup, nrm, kp_blk, valid_blk):
                g = d.get(f"{side}_fpfh_grid")
                if g is not None:
                    n = len(sup)

                    def one(ib):
                        safe = jnp.minimum(ib, n - 1)
                        rowvals = g.packed_sorted[safe]
                        qc = jnp.where((ib < n)[:, None], rowvals[:, :3], 1.0e6)
                        if use_dma:
                            from ..ops.pallas_radius import tile_table
                            from ..ops.pallas_shot_dma import spfh_block_dma

                            table = tile_table(g.packed_sorted[:, :6], 8)
                            return spfh_block_dma(g, table, qc,
                                                  rowvals[:, 3:6], radius,
                                                  fpfh_n_bins,
                                                  fpfh_decorrelated)
                        return _spfh_window_block(g, qc, rowvals[:, 3:6],
                                                  radius, fpfh_n_bins,
                                                  fpfh_decorrelated)

                    ids_blk = d[f"{side}_spfh_ids"]
                    m = ids_blk.shape[0] // spfh_chunk
                    spfh_blk = jax.lax.map(
                        one, ids_blk.reshape(m, spfh_chunk)
                    ).reshape(ids_blk.shape[0], -1)
                    spfh_full = gat(spfh_blk)
                    group = 8
                    ng = -(-n // group)
                    spfh_g = spfh_full[:ng * group].reshape(
                        ng, group * spfh_full.shape[1])
                    desc_blk = _fpfh_window_agg_block(
                        g, spfh_full, spfh_g, kp_blk, radius, group)
                else:
                    q_blk = d[f"{side}_spfh_q"]
                    qn_blk = d[f"{side}_spfh_qn"]
                    nbr, vals = radius_search_with_values_auto(
                        q_blk, sup, nrm, radius, k_max)
                    spfh_blk = _spfh_from_values(
                        q_blk, qn_blk, vals[..., :3], vals[..., 3:6],
                        nbr.dist, nbr.mask, radius, fpfh_n_bins,
                        fpfh_decorrelated)
                    spfh_full = gat(spfh_blk)
                    kp_pts = sup[kp_blk]
                    nbr2, _ = radius_search_with_values_auto(
                        kp_pts, sup, nrm, radius, k_max)
                    dd = nbr2.dist
                    m2 = nbr2.mask & (dd > 0)
                    w = jnp.where(m2, 1.0 / jnp.where(m2, dd, 1.0), 0.0)
                    acc = jnp.einsum("ckd,ck->cd", spfh_full[nbr2.idx], w)
                    count = jnp.maximum(
                        jnp.sum(nbr2.mask, axis=-1), 1).astype(jnp.float32)
                    desc_blk = spfh_full[kp_blk] + acc / count[:, None]
                return jnp.where(valid_blk[:, None], desc_blk, 0.0)

            scan_desc = fpfh_side("scan", d["scan_sup"], d["scan_nrm"],
                                  d["scan_kpi"], d["scan_v"])
            ref_desc_blk = fpfh_side("ref", d["ref_sup"], d["ref_nrm"],
                                     d["ref_kpi"], d["ref_v"])
        elif descriptor == "shot_multiscale":
            # scales concatenate to (Q, 352·S) — the reference multiscale
            # workflow's layout — so the common matching leg below applies
            def ms_stack(kp_blk, v_blk, sup, nrm, g):
                descs, rfs = [], None
                for r in ms_radii:
                    d_s, rfs_s = _shot(kp_blk, v_blk, sup, nrm, r, k_max,
                                       min_neighborhood_size, grid=g,
                                       local_rfs=rfs, return_rfs=True)
                    if rfs is None:
                        rfs = rfs_s
                    descs.append(d_s)
                return jnp.concatenate(descs, axis=1)

            scan_desc = ms_stack(d["scan_kp"], d["scan_v"], d["scan_sup"],
                                 d["scan_nrm"], d.get("scan_grid"))
            ref_desc_blk = ms_stack(d["ref_kp"], d["ref_v"], d["ref_sup"],
                                    d["ref_nrm"], d.get("ref_grid"))
        else:
            scan_desc = _shot(d["scan_kp"], d["scan_v"], d["scan_sup"],
                              d["scan_nrm"], radius, k_max,
                              min_neighborhood_size, grid=d.get("scan_grid"),
                              rf_radius=rf_radius)
            ref_desc_blk = _shot(d["ref_kp"], d["ref_v"], d["ref_sup"],
                                 d["ref_nrm"], radius, k_max,
                                 min_neighborhood_size, grid=d.get("ref_grid"),
                                 rf_radius=rf_radius)

        # ---- matching (scan rows sharded, ref side gathered) ----------------
        ref_kp_full = gat(d["ref_kp"])
        ref_v_full = gat(d["ref_v"])
        ref_desc = gat(ref_desc_blk)                   # (Qr, D)
        ref_ok = jnp.any(ref_desc != 0, axis=1) & ref_v_full
        d2 = descriptor_sq_dists(scan_desc, ref_desc)
        d2 = jnp.where(ref_ok[None, :], d2, jnp.inf)
        nn_idx, d1_sq, d2_sq = top2_rows(d2)
        d1 = jnp.sqrt(jnp.maximum(d1_sq, 0.0))
        dsecond = jnp.sqrt(jnp.maximum(d2_sq, 0.0))
        scan_ok = jnp.any(scan_desc != 0, axis=1) & d["scan_v"]
        ratio = d1 / jnp.where(dsecond > 0, dsecond, 1.0)
        valid_match = scan_ok & (ratio <= ratio_threshold) & jnp.isfinite(d1)
        n_matches = jax.lax.psum(jnp.sum(valid_match), AX)

        src_blk = d["scan_kp"]
        dst_blk = ref_kp_full[nn_idx]
        match_w_blk = valid_match.astype(jnp.float32)

        # ---- RANSAC: replicated draws (same PRNG stream as single-device),
        # sharded inlier counting psum-reduced -------------------------------
        src_full = gat(src_blk)
        dst_full = gat(dst_blk)
        vm_full = gat(valid_match)
        thr2 = jnp.asarray(ransac_threshold, jnp.float32) ** 2
        chunk = 256
        n_chunks = -(-n_draws // chunk)

        def score_chunk(carry, k_chunk):
            best_count, best_rot, best_t = carry
            g = jax.random.gumbel(k_chunk, (chunk, src_full.shape[0]))
            logits = jnp.where(vm_full[None, :], g, -jnp.inf)
            _, draws = jax.lax.top_k(logits, draw_size)
            tf = solve_point_to_point(src_full[draws], dst_full[draws])
            moved = (jnp.einsum("cij,mj->cmi", tf.rotation, src_blk)
                     + tf.translation[:, None, :])
            dd = jnp.sum((moved - dst_blk[None]) ** 2, axis=-1)
            local = jnp.sum((dd <= thr2).astype(jnp.float32)
                            * match_w_blk[None, :], axis=-1)
            counts = jax.lax.psum(local, AX)
            i = jnp.argmax(counts)
            better = counts[i] > best_count
            return (
                jnp.where(better, counts[i], best_count),
                jnp.where(better, tf.rotation[i], best_rot),
                jnp.where(better, tf.translation[i], best_t),
            ), None

        keys = jax.random.split(jax.random.wrap_key_data(d["key"]), n_chunks)
        # carries touch all_gather-derived (hence vma-varying) values: the
        # init must be pcast to varying for the scan types to line up
        init = (vary(jnp.float32(-1.0)), vary(jnp.eye(3, dtype=jnp.float32)),
                vary(jnp.zeros(3, jnp.float32)))
        (best_count, rot0, t0), _ = jax.lax.scan(score_chunk, init, keys)
        ransac_tf = RigidTransform(rot0, t0).normalize_rotation()
        ransac_rot, ransac_t = ransac_tf.rotation, ransac_tf.translation
        inlier_ratio = best_count / jnp.maximum(n_matches.astype(jnp.float32), 1.0)

        # ---- ICP: scan rows sharded, psum-able solver forms ----------------
        scan_sub_blk = d["sub"]
        sub_w_base = d["sub_v"].astype(jnp.float32)
        icp_grid = d.get("ref_icp_grid")
        ref_sup = d["ref_sup"]
        ref_nrm = d["ref_nrm"]

        def icp_body(state):
            i, rot, t, _rms, _done = state
            moved = scan_sub_blk @ rot.T + t
            if icp_grid is not None:
                dist, nn = grid_nearest_neighbor(icp_grid, moved)
            else:
                dist, nn = nearest_neighbor(moved, ref_sup)
            w = (dist <= d_max).astype(jnp.float32) * sub_w_base
            dist = jnp.where(jnp.isfinite(dist), dist, 0.0)
            wsum = jnp.maximum(jax.lax.psum(jnp.sum(w), AX), 1.0)
            target = ref_sup[nn]
            if point_to_plane:
                gtg, gth = point_to_plane_normal_eq(moved, target,
                                                    ref_nrm[nn], w)
                gtg = jax.lax.psum(gtg, AX)
                gth = jax.lax.psum(gth, AX)
                delta = solve_point_to_plane_from_normal_eq(gtg, gth)
                residual = jnp.abs(jnp.sum((moved - target) * ref_nrm[nn],
                                           axis=-1))
                rms = jax.lax.psum(jnp.sum(residual * w), AX) / wsum
            else:
                stats = point_to_point_stats(moved, target, w)
                stats = jax.tree_util.tree_map(
                    lambda x: jax.lax.psum(x, AX), stats)
                delta = solve_point_to_point_from_stats(*stats)
                rms = jnp.sqrt(jax.lax.psum(jnp.sum(w * dist**2), AX) / wsum)
            composed = delta @ RigidTransform(rot, t)
            return (i + 1, composed.rotation, composed.translation, rms,
                    rms < rms_threshold)

        def icp_cond(state):
            i, *_r, done = state
            return (i < max_iter) & (~done)

        state = (jnp.asarray(0, jnp.int32), ransac_rot, ransac_t,
                 jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(False))
        _, rot, t, rms, done = jax.lax.while_loop(icp_cond, icp_body, state)

        # Outputs mix vma-invariant (psum-derived) and vma-varying
        # (all_gather-derived) values whose per-device contents are identical
        # by construction; stack them on a leading device axis and let the
        # host take row 0 — uniform, and it also works under check_vma=False
        # (the DMA-kernel gate), where P() out_specs would be rejected.
        def out_stack(x):
            vma = getattr(jax.typeof(x), "vma", frozenset())
            if AX not in vma:
                x = vary(x)
            return x[None]

        return tuple(out_stack(o) for o in (
            ransac_rot, ransac_t, rot, t, inlier_ratio,
            n_matches, rms, done))

    out_specs = tuple(P(AX, *([None] * n)) for n in (2, 1, 2, 1, 0, 0, 0, 0))
    run = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(specs,), out_specs=out_specs,
        check_vma=not use_dma,
    ))
    outs = run(data)

    from ..parallel.mesh import host_array

    def first(x):
        return np.asarray(host_array(x))[0]

    (ransac_rot, ransac_t, rot, t, inlier_ratio, n_matches, rms,
     done) = (first(o) for o in outs)
    return FusedResult(
        ransac_transform=RigidTransform(jnp.asarray(ransac_rot),
                                        jnp.asarray(ransac_t)),
        icp_transform=RigidTransform(jnp.asarray(rot), jnp.asarray(t)),
        ransac_inlier_ratio=inlier_ratio,
        n_matches=n_matches,
        icp_rms=rms,
        icp_converged=done,
    )


def register_pair(
    scan: np.ndarray,
    scan_normals: np.ndarray,
    ref: np.ndarray,
    ref_normals: np.ndarray,
    *,
    keypoint_voxel: float,
    icp_voxel: float,
    radius: float,
    key=None,
    pad_multiple: int = 256,
    mesh=None,
    **fused_kwargs,
) -> FusedResult:
    """Host-facing wrapper: keypoint selection + ICP subsampling on device
    (dynamic sizes), padding to stable buckets, then the single fused program.

    ``descriptor="fpfh"`` / ``rf_radius=...`` (bi-scale SHOT) route the
    descriptor leg accordingly — the reference's default descriptor configs
    all compile into the one program (VERDICT r3 #6).

    Above ``AUTO_GRID_MIN_POINTS`` the support clouds get grid-hash engines
    (descriptor search + ICP 1-NN) so the fused program scales to ~1M-point
    clouds on one chip.  With a multi-device ``mesh`` the whole program
    shards over it instead (``fused_registration_mesh``)."""
    import math

    from ..core.subsampling import grid_subsample
    from ..ops.grid_hash import AUTO_GRID_MIN_POINTS, build_grid

    if key is None:
        key = jax.random.key(72)
    use_mesh = mesh is not None and mesh.devices.size > 1
    if use_mesh:
        # every row-sharded input must divide the mesh
        pad_multiple = math.lcm(pad_multiple, mesh.devices.size)

    def pad(arr, mult):
        n = len(arr)
        target = -(-max(n, 1) // mult) * mult
        out = np.zeros((target,) + arr.shape[1:], arr.dtype)
        out[:n] = arr
        valid = np.arange(target) < n
        return out, valid

    scan32 = np.asarray(scan, np.float32)
    ref32 = np.asarray(ref, np.float32)
    scan_kp_idx = np.asarray(grid_subsample(scan32, keypoint_voxel))
    ref_kp_idx = np.asarray(grid_subsample(ref32, keypoint_voxel))
    scan_kp, scan_kp_valid = pad(scan32[scan_kp_idx], pad_multiple)
    ref_kp, ref_kp_valid = pad(ref32[ref_kp_idx], pad_multiple)
    scan_sub, scan_sub_valid = pad(scan32[grid_subsample(scan32, icp_voxel)], pad_multiple)

    descriptor = fused_kwargs.get("descriptor", "shot")
    rf_radius = fused_kwargs.get("rf_radius")
    ms_radii = fused_kwargs.get("ms_radii")
    # the SHOT window must cover the largest radius any scale bins over
    # (bi-scale frame radius / every multiscale radius); FPFH's grid
    # convention is cell = radius/2 with halo=2
    shot_cell = max(radius, rf_radius) if rf_radius is not None else radius
    if ms_radii is not None:
        shot_cell = max(ms_radii)

    grids = {}
    if descriptor == "fpfh":
        # FPFH aggregates SPFH at keypoint INDICES; sorted order under a grid
        if len(scan32) >= AUTO_GRID_MIN_POINTS:
            g = build_grid(scan32, radius / 2,
                           extras=np.asarray(scan_normals, np.float32), halo=2)
            grids["scan_fpfh_grid"] = g
            inv = np.zeros(len(scan32), np.int32)
            inv[np.asarray(g.orig_idx)] = np.arange(len(scan32), dtype=np.int32)
            kp_for_fused = inv[scan_kp_idx]
        else:
            kp_for_fused = scan_kp_idx
        fused_kwargs["scan_kp_idx"] = jnp.asarray(
            pad(kp_for_fused.astype(np.int32), pad_multiple)[0])
        if len(ref32) >= AUTO_GRID_MIN_POINTS:
            g = build_grid(ref32, radius / 2,
                           extras=np.asarray(ref_normals, np.float32), halo=2)
            grids["ref_fpfh_grid"] = g
            inv = np.zeros(len(ref32), np.int32)
            inv[np.asarray(g.orig_idx)] = np.arange(len(ref32), dtype=np.int32)
            kp_for_fused = inv[ref_kp_idx]
        else:
            kp_for_fused = ref_kp_idx
        fused_kwargs["ref_kp_idx"] = jnp.asarray(
            pad(kp_for_fused.astype(np.int32), pad_multiple)[0])
    else:
        if len(scan32) >= AUTO_GRID_MIN_POINTS:
            grids["scan_grid"] = build_grid(
                scan32, shot_cell, extras=np.asarray(scan_normals, np.float32))
        if len(ref32) >= AUTO_GRID_MIN_POINTS:
            grids["ref_grid"] = build_grid(
                ref32, shot_cell, extras=np.asarray(ref_normals, np.float32))
    if len(ref32) >= AUTO_GRID_MIN_POINTS:
        # pin d_max once so the ICP grid's cell size (its exactness bound)
        # and the fused program always agree
        d_max = fused_kwargs.setdefault("d_max", 0.3)
        grids["ref_icp_grid"] = build_grid(ref32, float(d_max))

    if use_mesh:
        res = fused_registration_mesh(
            mesh, scan_kp, scan_kp_valid, ref_kp, ref_kp_valid,
            scan32, np.asarray(scan_normals, np.float32),
            ref32, np.asarray(ref_normals, np.float32),
            scan_sub, scan_sub_valid,
            key, radius=radius, **grids, **fused_kwargs,
        )
    else:
        res = fused_registration(
            jnp.asarray(scan_kp), jnp.asarray(scan_kp_valid),
            jnp.asarray(ref_kp), jnp.asarray(ref_kp_valid),
            jnp.asarray(scan32), jnp.asarray(scan_normals, jnp.float32),
            jnp.asarray(ref32), jnp.asarray(ref_normals, jnp.float32),
            jnp.asarray(scan_sub), jnp.asarray(scan_sub_valid),
            key, radius=radius, **grids, **fused_kwargs,
        )
    return res._replace(scan_keypoint_idx=scan_kp_idx,
                        ref_keypoint_idx=ref_kp_idx)
