"""Keypoint selection strategies (reference keypoint_selection.py:11-122).

All four reference strategies, rebuilt fixed-shape:

- ``iterative``: greedy coverage — select a point, mark its radius ball
  visited, repeat.  A bounded ``lax.while_loop`` whose per-step work is one
  (N,) distance row; no KDTree required.
- ``subsampling``: voxel-grid representative selection (``core.subsampling``).
- ``random``: explicit ``jax.random`` keys (the reference mixes a seeded
  module RNG and the unseeded global NumPy RNG — SURVEY.md §2.4.7).
- ``subsampling_with_density``: voxel representatives whose voxel population
  (or radius-ball count when a distinct density radius is given) exceeds a
  threshold.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .core.subsampling import grid_subsample, voxel_counts_for_representatives
from .ops.neighbors import radius_count


@jax.jit
def _iterative_masked(points: jnp.ndarray, radius) -> jnp.ndarray:
    """Greedy coverage; returns a boolean 'selected' mask of shape (N,)."""
    n = points.shape[0]
    r2 = jnp.asarray(radius, jnp.float32) ** 2

    def cond(state):
        visited, _ = state
        return ~jnp.all(visited)

    def body(state):
        visited, selected = state
        # first unvisited point (argmax of ~visited finds the first True)
        i = jnp.argmax(~visited)
        selected = selected.at[i].set(True)
        d2 = jnp.sum((points - points[i]) ** 2, axis=-1)
        return visited | (d2 <= r2), selected

    visited0 = jnp.zeros(n, bool)
    selected0 = jnp.zeros(n, bool)
    _, selected = jax.lax.while_loop(cond, body, (visited0, selected0))
    return selected


@jax.jit
def _iterative_rounds(idx: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Round-parallel greedy coverage from precomputed (N, k) neighborhoods.

    The sequential greedy ("pick first unvisited, mark its ball visited") is
    the lexicographically-first maximal independent set of the radius graph.
    That fixpoint is computable in rounds: select every unvisited point whose
    index is minimal among its *unvisited* in-radius neighbors, mark selected
    points' neighborhoods visited, repeat.  Each round is one masked segment-
    min + gather — tens of device rounds instead of one sequential device
    round per keypoint."""
    n = idx.shape[0]
    own = jnp.arange(n, dtype=jnp.int32)

    def cond(state):
        visited, _selected, rounds = state
        return (~jnp.all(visited)) & (rounds < n)

    def body(state):
        visited, selected, rounds = state
        unvis = ~visited
        # index of each unvisited neighbor, sentinel n elsewhere
        nbr_unvis = jnp.where(mask & unvis[idx], idx, n)
        min_nbr = jnp.min(nbr_unvis, axis=1)
        # self is its own neighbor (distance 0 survives any top-k cap), so for
        # an unvisited point min_nbr <= own; >= means own index is the minimum
        new_sel = unvis & (min_nbr >= own)
        covered = jnp.any(mask & new_sel[idx], axis=1)
        return visited | covered | new_sel, selected | new_sel, rounds + 1

    state = (jnp.zeros(n, bool), jnp.zeros(n, bool), jnp.asarray(0, jnp.int32))
    _, selected, _ = jax.lax.while_loop(cond, body, state)
    return selected


def select_keypoints_iteratively(points, radius, k_max: int = 128) -> np.ndarray:
    """Greedy coverage keypoints (reference keypoint_selection.py:11-31).

    Small clouds run the exact sequential ``lax.while_loop`` (one device round
    per keypoint).  Large clouds switch to the round-parallel formulation over
    grid-hash neighborhoods — same greedy fixpoint, except that radius balls
    holding more than ``k_max`` points are truncated to the nearest ``k_max``
    (the framework-wide neighborhood-cap semantics), which can only make the
    selection slightly denser.  When the measured neighborhoods saturate the
    cap, ``k_max`` is doubled (up to 8x) and the search re-run so the exact
    greedy semantics hold on dense clouds too; if the densest ball exceeds
    even that, the remaining truncation is WARNED about instead of silently
    deviating from the reference's exact cover (ADVICE r2 #4)."""
    import logging

    from .ops.grid_hash import AUTO_GRID_MIN_POINTS, build_grid, grid_radius_search

    pts = jnp.asarray(points, jnp.float32)
    if pts.shape[0] < AUTO_GRID_MIN_POINTS:
        return np.nonzero(np.asarray(_iterative_masked(pts, radius)))[0]
    grid_pts = (np.ascontiguousarray(points, np.float32)
                if isinstance(points, np.ndarray) else pts)
    grid = build_grid(grid_pts, float(radius) / 2, halo=2)
    k_cap = k_max
    nbr = grid_radius_search(grid, pts, radius, k_cap)
    while int(np.asarray(jnp.max(nbr.count))) >= k_cap and k_cap < 8 * k_max:
        k_cap *= 2
        nbr = grid_radius_search(grid, pts, radius, k_cap)
    if int(np.asarray(jnp.max(nbr.count))) >= k_cap:
        logging.getLogger(__name__).warning(
            "select_keypoints_iteratively: radius balls exceed the %d-neighbor "
            "cap even after auto-raising from %d; the greedy cover may be "
            "slightly denser than the reference's exact semantics "
            "(raise k_max or shrink the radius)", k_cap, k_max,
        )
    return np.nonzero(np.asarray(_iterative_rounds(nbr.idx, nbr.mask)))[0]


def select_keypoints_subsampling(points, voxel_size) -> np.ndarray:
    return grid_subsample(points, voxel_size)


def select_keypoints_randomly(points, n_feature_points: int, key=None) -> np.ndarray:
    """Random *points* (coordinates), as the reference returns
    (keypoint_selection.py:47-53)."""
    if key is None:
        key = jax.random.key(1)
    idx = jax.random.choice(key, len(points), shape=(n_feature_points,), replace=False)
    return np.asarray(points)[np.asarray(idx)]


def select_query_indices_randomly(n_points: int, n_feature_points: int, key=None) -> np.ndarray:
    if key is None:
        key = jax.random.key(0)
    idx = jax.random.choice(key, n_points, shape=(n_feature_points,), replace=False)
    return np.asarray(idx)


def select_keypoints_with_density_threshold(
    points,
    voxel_size,
    density_threshold_value: int,
    density_threshold_radius: float | None = None,
) -> np.ndarray:
    """Voxel representatives filtered by local density
    (reference keypoint_selection.py:65-122)."""
    pts = jnp.asarray(points, jnp.float32)
    idx, mask, counts = voxel_counts_for_representatives(pts, voxel_size)
    idx = np.asarray(idx)[np.asarray(mask)]
    counts = np.asarray(counts)[np.asarray(mask)]
    if density_threshold_radius is None or density_threshold_radius == voxel_size:
        return idx[counts > density_threshold_value]
    ball = np.asarray(radius_count(pts[idx], pts, density_threshold_radius))
    return idx[ball > density_threshold_value]
