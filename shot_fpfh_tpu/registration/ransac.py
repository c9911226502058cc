"""RANSAC coarse alignment — all draws batched on device.

The reference loops 10,000 draws in Python, one 3x3 SVD at a time
(matching/ransac.py:17-82).  Here every draw is a row of a batched tensor
program: sample ``(n_draws, draw_size)`` match indices, solve all Kabsch
problems with one batched SVD, count inliers with a chunked
``(draws, matches)`` distance tensor, and argmax.  Randomness comes from an
explicit ``jax.random`` key (the reference uses a module-global NumPy RNG with
seed 72 — SURVEY.md §2.4.7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.solvers import solve_point_to_point
from ..core.transform import RigidTransform

_DRAW_CHUNK = 512


@functools.partial(jax.jit, static_argnames=("n_draws", "draw_size"))
def ransac_on_matches(
    scan_matched: jnp.ndarray,
    ref_matched: jnp.ndarray,
    key: jax.Array,
    n_draws: int = 10000,
    draw_size: int = 4,
    distance_threshold: float = 1.0,
) -> tuple[jnp.ndarray, RigidTransform]:
    """Best rigid transform over random draws of matched keypoint pairs.

    ``scan_matched``/``ref_matched``: (M, 3) matched keypoint coordinates.
    Returns ``(inlier_ratio, transform)`` like the reference
    (ransac.py:82: best inlier count / M, quaternion-renormalized transform).
    """
    m = scan_matched.shape[0]
    scan_matched = jnp.asarray(scan_matched, jnp.float32)
    ref_matched = jnp.asarray(ref_matched, jnp.float32)

    keys = jax.random.split(key, n_draws)
    # sample without replacement per draw
    draws = jax.vmap(
        lambda k: jax.random.choice(k, m, shape=(draw_size,), replace=False)
    )(keys)  # (n_draws, draw_size)

    n_chunks = -(-n_draws // _DRAW_CHUNK)
    pad = n_chunks * _DRAW_CHUNK - n_draws
    draws = jnp.pad(draws, ((0, pad), (0, 0))).reshape(n_chunks, _DRAW_CHUNK, draw_size)
    chunk_valid = (
        jnp.arange(n_chunks * _DRAW_CHUNK).reshape(n_chunks, _DRAW_CHUNK) < n_draws
    )

    thr2 = jnp.asarray(distance_threshold, jnp.float32) ** 2

    def score_chunk(carry, inputs):
        best_count, best_rot, best_t = carry
        draw_idx, valid = inputs
        src = scan_matched[draw_idx]  # (C, draw_size, 3)
        dst = ref_matched[draw_idx]
        tf = solve_point_to_point(src, dst)  # batched (C,)
        moved = jnp.einsum("cij,mj->cmi", tf.rotation, scan_matched) + tf.translation[:, None, :]
        d2 = jnp.sum((moved - ref_matched[None]) ** 2, axis=-1)  # (C, M)
        counts = jnp.where(valid, jnp.sum(d2 <= thr2, axis=-1), -1)
        i = jnp.argmax(counts)
        better = counts[i] > best_count
        best_count = jnp.where(better, counts[i], best_count)
        best_rot = jnp.where(better, tf.rotation[i], best_rot)
        best_t = jnp.where(better, tf.translation[i], best_t)
        return (best_count, best_rot, best_t), None

    init = (
        jnp.asarray(-1, jnp.int32),
        jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, jnp.float32),
    )
    (best_count, best_rot, best_t), _ = jax.lax.scan(
        score_chunk, init, (draws, chunk_valid)
    )
    best = RigidTransform(best_rot, best_t).normalize_rotation()
    return best_count.astype(jnp.float32) / m, best
