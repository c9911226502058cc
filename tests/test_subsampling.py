import numpy as np
import jax.numpy as jnp

from shot_fpfh_tpu.core import grid_subsample
from shot_fpfh_tpu.core.subsampling import voxel_counts_for_representatives


def reference_grid_subsampling(points, voxel_size):
    """NumPy oracle re-deriving the reference semantics (core/subsampling.py):
    per non-empty voxel keep the index of the point closest to the voxel
    barycenter."""
    cells = ((points - points.min(axis=0)) // voxel_size).astype(int)
    keys, inverse = np.unique(cells, axis=0, return_inverse=True)
    out = []
    for v in range(len(keys)):
        members = np.nonzero(inverse == v)[0]
        bary = points[members].mean(axis=0)
        out.append(members[np.linalg.norm(points[members] - bary, axis=1).argmin()])
    return np.sort(np.array(out))


def test_grid_subsample_matches_reference(rng, surface_cloud):
    pts = surface_cloud.astype(np.float32)
    for voxel in [0.1, 0.25, 0.5]:
        ours = np.sort(grid_subsample(pts, voxel))
        theirs = reference_grid_subsampling(pts, voxel)
        np.testing.assert_array_equal(ours, theirs)


def test_grid_subsample_one_point_per_voxel(rng):
    pts = rng.uniform(size=(50, 3)).astype(np.float32) * 100
    idx = grid_subsample(pts, 0.001)  # tiny voxels: everything kept
    assert len(idx) == 50


def test_grid_subsample_single_voxel(rng):
    pts = rng.normal(scale=0.01, size=(30, 3)).astype(np.float32)
    idx = grid_subsample(pts, 10.0)
    assert len(idx) == 1
    bary = pts.mean(axis=0)
    expected = np.linalg.norm(pts - bary, axis=1).argmin()
    assert idx[0] == expected


def test_voxel_counts(rng, surface_cloud):
    pts = surface_cloud.astype(np.float32)
    voxel = 0.3
    idx, mask, counts = voxel_counts_for_representatives(jnp.asarray(pts), voxel)
    idx, mask, counts = np.asarray(idx), np.asarray(mask), np.asarray(counts)
    cells = ((pts - pts.min(axis=0)) // voxel).astype(int)
    _, inverse, np_counts = np.unique(
        cells, axis=0, return_inverse=True, return_counts=True
    )
    assert mask.sum() == len(np_counts)
    # each representative's count equals its voxel population
    for i in np.nonzero(mask)[0][:20]:
        v = inverse[idx[i]]
        assert counts[i] == np_counts[v]
