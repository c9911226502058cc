"""PCA-based normals and geometric features, batched over query points.

TPU rewrite of the reference's per-point loops
(descriptors/pca_based_descriptors.py:15-244): one ``radius_search``/``knn``
call produces fixed-shape masked neighborhoods, and a single batched 3x3
eigendecomposition (``ops.eigh3``) replaces N calls to ``np.linalg.eigh``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.eigh3 import eigh3x3, pca_eigh
from ..ops.grid_hash import (
    AUTO_GRID_MIN_POINTS,
    build_grid,
    grid_radius_pca,
    knn_auto,
)
from ..ops.neighbors import radius_search


def _normals_knn(query_points, cloud_points, k, pre_computed_normals):
    nbr = knn_auto(query_points, cloud_points, k)
    return _normals_from_neighborhoods(query_points, cloud_points, nbr, pre_computed_normals)


@jax.jit
def _normals_from_neighborhoods(query_points, cloud_points, nbr, pre_computed_normals):
    pts = cloud_points[nbr.idx]
    _, v, _ = pca_eigh(pts, nbr.mask)
    normals = v[..., :, 0]  # eigenvector of the smallest eigenvalue
    if pre_computed_normals is not None:
        flip = jnp.sum(normals * pre_computed_normals, axis=-1) < 0
        normals = jnp.where(flip[..., None], -normals, normals)
    return normals


@functools.partial(jax.jit, static_argnames=("k_max",))
def _normals_radius(query_points, cloud_points, radius, k_max, pre_computed_normals):
    nbr = radius_search(query_points, cloud_points, radius, k_max)
    pts = cloud_points[nbr.idx]
    _, v, _ = pca_eigh(pts, nbr.mask)
    normals = v[..., :, 0]
    if pre_computed_normals is not None:
        flip = jnp.sum(normals * pre_computed_normals, axis=-1) < 0
        normals = jnp.where(flip[..., None], -normals, normals)
    return normals


def compute_normals(
    query_points,
    cloud_points,
    *,
    k: int | None = None,
    radius: float | None = None,
    pre_computed_normals=None,
    k_max: int = 64,
    mesh=None,
):
    """PCA normals (reference ``compute_normals``,
    pca_based_descriptors.py:29-59): normal = smallest-eigenvalue eigenvector
    of the neighborhood covariance, optionally sign-aligned to
    ``pre_computed_normals``.

    With a multi-device ``mesh`` the query axis shards over it
    (``parallel.sharded.sharded_normals``)."""
    assert k is not None or radius is not None, "Provide k or radius."
    if mesh is not None and mesh.devices.size > 1:
        from ..parallel.sharded import sharded_normals

        return sharded_normals(
            query_points, cloud_points, mesh,
            k=k, radius=radius,
            pre_computed_normals=pre_computed_normals, k_max=k_max,
        )
    q = jnp.asarray(query_points, jnp.float32)
    c = jnp.asarray(cloud_points, jnp.float32)
    pre = None if pre_computed_normals is None else jnp.asarray(pre_computed_normals, jnp.float32)
    if k is not None:
        return _normals_knn(q, c, k, pre)
    if c.shape[0] >= AUTO_GRID_MIN_POINTS:
        # fused path: covariance reduced over the candidate window directly —
        # no top-k / k_max cap, ALL in-radius neighbors contribute.  On TPU
        # the Pallas run-DMA kernel streams candidates ~4x faster than the
        # XLA gather formulation (measured at 1M points).
        from ..ops.pallas_radius import _on_tpu, radius_pca_pallas

        grid = build_grid(c, float(radius))
        if _on_tpu():
            cov, _, _ = radius_pca_pallas(grid, q, radius)
        else:
            cov, _, _ = grid_radius_pca(grid, q, radius)
        return _normals_from_cov(cov, pre)
    return _normals_radius(q, c, radius, k_max, pre)


@jax.jit
def _normals_from_cov(cov, pre_computed_normals):
    _, v = eigh3x3(cov)
    normals = v[..., :, 0]
    if pre_computed_normals is not None:
        flip = jnp.sum(normals * pre_computed_normals, axis=-1) < 0
        normals = jnp.where(flip[..., None], -normals, normals)
    return normals


def compute_sphericity(query_points, cloud_points, radius, k_max: int = 64):
    """λ_min / (λ_max + 1e-6) on radius neighborhoods
    (reference pca_based_descriptors.py:62-74).

    Large clouds go through the grid engine's fused covariance reduction
    (uncapped, no O(Q·N) brute pass)."""
    q = jnp.asarray(query_points, jnp.float32)
    c = jnp.asarray(cloud_points, jnp.float32)
    if c.shape[0] >= AUTO_GRID_MIN_POINTS:
        grid = build_grid(np.asarray(c), float(radius))
        cov, _, _ = grid_radius_pca(grid, q, radius)
        w, _ = eigh3x3(cov)
        return w[..., 0] / (w[..., 2] + 1e-6)
    return _sphericity_brute(q, c, radius, k_max)


@functools.partial(jax.jit, static_argnames=("k_max",))
def _sphericity_brute(q, c, radius, k_max: int):
    nbr = radius_search(q, c, radius, k_max)
    w, _, _ = pca_eigh(c[nbr.idx], nbr.mask)
    return w[..., 0] / (w[..., 2] + 1e-6)


def local_pca_with_moments(query_points, cloud_points, radius, k_max: int = 64):
    """Batched local PCA + first/second moments
    (reference ``compute_local_pca_with_moments``,
    pca_based_descriptors.py:77-147).

    Deviation: moments project the centered neighborhood onto the eigenvector
    *columns* (the intended basis); the reference uses ``@ eigenvectors.T``
    (line 131), an apparent transposition slip.
    Returns (eigenvalues (Q,3), eigenvectors (Q,3,3), moments (Q,8), sizes (Q,)).

    Large clouds run over grouped feature-planar windows (uncapped, exact —
    the brute path at any size would be an O(Q·N) matmul)."""
    q = jnp.asarray(query_points, jnp.float32)
    c = jnp.asarray(cloud_points, jnp.float32)
    if c.shape[0] >= AUTO_GRID_MIN_POINTS:
        grid = build_grid(np.asarray(c), float(radius) / 2, halo=2)
        return _pca_moments_window(grid, q, radius)
    return _pca_moments_brute(q, c, radius, k_max)


@jax.jit
def _pca_moments_window(grid, q, radius):
    """Feature-planar window formulation of ``local_pca_with_moments``."""
    from ..ops.grid_hash import window_distances

    vals, d, win_ok, _rows = window_distances(grid, q)
    ok = win_ok & (d <= radius)
    okf = ok.astype(jnp.float32)
    count = jnp.maximum(jnp.sum(okf, axis=-1), 1.0)
    # accumulate query-centered (|p - q| <= radius) so f32 stays accurate for
    # clouds far from the origin, then re-center about the barycenter
    rel = jnp.where(ok[:, None, :], vals[:, :3, :] - q[:, :, None], 0.0)
    bary_off = jnp.sum(rel, axis=-1) / count[:, None]
    centered = jnp.where(ok[:, None, :], rel - bary_off[:, :, None], 0.0)
    cov = jnp.einsum("qiw,qjw->qij", centered, centered) / count[:, None, None]
    w, v = eigh3x3(cov)
    proj = jnp.einsum("qiw,qij->qjw", centered, v)
    mean_abs = jnp.abs(jnp.sum(proj, axis=-1) / count[:, None])
    mean_sq = jnp.sum(proj**2, axis=-1) / count[:, None]
    vert = centered[:, 2, :]
    vert_mean = jnp.sum(vert, axis=-1) / count
    vert_sq = jnp.sum(vert**2, axis=-1) / count
    moments = jnp.concatenate(
        [mean_abs, mean_sq, vert_mean[:, None], vert_sq[:, None]], axis=1
    )
    return w, v, moments, jnp.sum(ok, axis=-1)


@functools.partial(jax.jit, static_argnames=("k_max",))
def _pca_moments_brute(q, c, radius, k_max: int):
    nbr = radius_search(q, c, radius, k_max)
    pts = c[nbr.idx]
    w, v, bary = pca_eigh(pts, nbr.mask)
    m = nbr.mask.astype(jnp.float32)
    count = jnp.maximum(jnp.sum(m, axis=-1), 1.0)

    centered = (pts - bary[..., None, :]) * m[..., None]
    proj = jnp.einsum("qki,qij->qkj", centered, v)  # coords in eigenbasis
    mean_abs = jnp.abs(jnp.sum(proj, axis=1) / count[:, None])
    mean_sq = jnp.sum(proj**2, axis=1) / count[:, None]
    vert = centered[..., 2]
    vert_mean = jnp.sum(vert, axis=1) / count
    vert_sq = jnp.sum(vert**2, axis=1) / count
    moments = jnp.concatenate(
        [mean_abs, mean_sq, vert_mean[:, None], vert_sq[:, None]], axis=1
    )
    return w, v, moments, jnp.sum(nbr.mask, axis=-1)


def compute_pca_based_basic_features(query_points, cloud_points, radius, k_max: int = 64):
    """(verticality, linearity, planarity, sphericity)
    (reference pca_based_descriptors.py:150-184).  Large clouds use the
    grid engine's fused covariance (uncapped)."""
    q = jnp.asarray(query_points, jnp.float32)
    c = jnp.asarray(cloud_points, jnp.float32)
    if c.shape[0] >= AUTO_GRID_MIN_POINTS:
        grid = build_grid(np.asarray(c), float(radius))
        cov, _, _ = grid_radius_pca(grid, q, radius)
        w, v = eigh3x3(cov)
    else:
        nbr = radius_search(q, c, radius, k_max)
        w, v, _ = pca_eigh(c[nbr.idx], nbr.mask)
    lbd3, lbd2, lbd1 = w[..., 0], w[..., 1], w[..., 2] + 1e-6
    normals = v[..., :, 0]
    verticality = 2.0 * jnp.arcsin(jnp.clip(jnp.abs(normals[..., 2]), 0, 1)) / jnp.pi
    linearity = 1.0 - lbd2 / lbd1
    planarity = (lbd2 - lbd3) / lbd1
    sphericity = lbd3 / lbd1
    return verticality, linearity, planarity, sphericity


def compute_pca_based_features(query_points, cloud_points, radius, k_max: int = 64,
                               verbose: bool = False):
    """Full 21-column eigen-feature stack
    (reference ``compute_pca_based_features``, pca_based_descriptors.py:187-244).

    ``verbose`` logs the neighborhood-size statistics and renders their
    histogram through :func:`shot_fpfh_tpu.analysis.plot_neighborhood_sizes`
    (the reference's inline ``plt.hist``, pca_based_descriptors.py:105-119);
    it defaults to False here because it forces a device→host sync."""
    w, v, moments, sizes = local_pca_with_moments(query_points, cloud_points, radius, k_max)
    if verbose:
        from ..analysis import plot_neighborhood_sizes

        plot_neighborhood_sizes(np.asarray(sizes))
    lbd3, lbd2, lbd1 = w[..., 0], w[..., 1], w[..., 2] + 1e-6
    normals = v[..., :, 0]
    principal_axis = v[..., :, 2]

    eigensum = jnp.sum(w, axis=-1)
    eigen_square_sum = jnp.sum(w**2, axis=-1)
    omnivariance = jnp.cbrt(jnp.prod(w, axis=-1))
    eigenentropy = jnp.sum(-w * jnp.log(w + 1e-6), axis=-1)
    linearity = 1.0 - lbd2 / lbd1
    planarity = (lbd2 - lbd3) / lbd1
    sphericity = lbd3 / lbd1
    curvature_change = lbd3 / jnp.maximum(eigensum, 1e-12)
    arcsin = lambda x: 2.0 * jnp.arcsin(jnp.clip(jnp.abs(x), 0, 1)) / jnp.pi  # noqa: E731
    cols = [
        eigensum, eigen_square_sum, omnivariance, eigenentropy,
        linearity, planarity, sphericity, curvature_change,
        arcsin(normals[..., 2]), arcsin(principal_axis[..., 2]),
        arcsin(normals[..., 0]), arcsin(normals[..., 1]),
    ]
    return jnp.concatenate(
        [jnp.stack(cols, axis=1), moments, sizes[:, None].astype(jnp.float32)], axis=1
    )
