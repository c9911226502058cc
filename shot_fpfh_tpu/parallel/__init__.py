from .mesh import POINTS_AXIS, make_mesh, pad_to_multiple, replicate, shard_rows
from .sharded import (
    RingMatchResult,
    ring_match,
    sharded_icp,
    sharded_ransac,
    sharded_shot_descriptors,
)

__all__ = [
    "POINTS_AXIS",
    "make_mesh",
    "pad_to_multiple",
    "replicate",
    "shard_rows",
    "RingMatchResult",
    "ring_match",
    "sharded_icp",
    "sharded_ransac",
    "sharded_shot_descriptors",
]
