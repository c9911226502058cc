"""Multi-host orchestration: N-host pod-slice registration (BASELINE config #5).

The reference is single-node; multi-host is a new requirement of the TPU
rebuild (SURVEY.md intro).  Design:

- ``jax.distributed.initialize`` once per process (DCN coordination).
- Each host loads/keeps its local shard of the keypoint work
  (``jax.make_array_from_process_local_data``); the support cloud is
  replicated per host (point clouds are small next to HBM).
- All compute reuses the single-program sharded stages in ``sharded.py`` —
  GSPMD makes an 8-chip-per-host x N-host mesh look like one mesh whose
  collectives ride ICI within a host and DCN across hosts.  The stages'
  communication profile keeps DCN traffic tiny: descriptors never cross
  hosts except as ring tiles (matching) and 6x6/22-float psums (ICP/RANSAC).

Nothing here requires real multi-host hardware to validate the program
structure: the same code runs on any mesh, and ``scaling_report`` measures
scaling efficiency on whatever devices exist (the driver's multichip dry-run
covers N=8 virtual devices).
"""

from __future__ import annotations

import logging
import time

import jax
import numpy as np

from .mesh import make_mesh
from .sharded import ring_match, sharded_shot_descriptors

logger = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up DCN coordination; no-op on single-process runs."""
    if num_processes is None or num_processes <= 1:
        logger.info("single-process run: skipping jax.distributed.initialize")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def host_local_keypoint_shard(keypoints: np.ndarray) -> np.ndarray:
    """The contiguous keypoint block this host is responsible for."""
    n = len(keypoints)
    p, np_total = jax.process_index(), jax.process_count()
    per = -(-n // np_total)
    return keypoints[p * per: (p + 1) * per]


def global_keypoint_array(local_block: np.ndarray, mesh):
    """Assemble the process-local blocks into one global row-sharded array."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(mesh.axis_names[0], None))
    return jax.make_array_from_process_local_data(sharding, local_block)


def scaling_report(
    n_keypoints: int = 2048,
    n_support: int = 20000,
    radius: float = 0.9,
    k_max: int = 128,
    device_counts: tuple = (1, 0),
) -> dict:
    """Measure sharded-SHOT scaling efficiency across device counts
    (0 = all devices).  Returns {n_devices: descriptors_per_sec}."""
    rng = np.random.default_rng(0)
    support = rng.normal(size=(n_support, 3)).astype(np.float32) * 4
    normals = rng.normal(size=(n_support, 3))
    normals = (normals / np.linalg.norm(normals, axis=1, keepdims=True)).astype(np.float32)
    keypoints = support[:n_keypoints]

    results = {}
    for count in device_counts:
        mesh = make_mesh(count)
        n_dev = mesh.devices.size

        def run():
            desc = sharded_shot_descriptors(
                keypoints, support, normals, radius, mesh,
                k_max=k_max, min_neighborhood_size=5,
            )
            return desc

        run()  # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            run()
        per_sec = n_keypoints * reps / (time.perf_counter() - t0)
        results[n_dev] = per_sec
        logger.info("%d device(s): %.0f descriptors/s", n_dev, per_sec)
    counts = sorted(results)
    if len(counts) > 1:
        base, top = counts[0], counts[-1]
        eff = results[top] / (results[base] * top / base)
        logger.info("scaling efficiency %d->%d devices: %.0f%%", base, top, eff * 100)
        results["efficiency"] = eff
    return results
