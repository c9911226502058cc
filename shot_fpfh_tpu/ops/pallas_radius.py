"""Pallas fused radius-reduction kernels: run-DMA candidate streaming.

XLA's gather lowers each candidate row to its own access — measured
row-count-bound at ~0.3M rows/ms regardless of row width, which makes the
candidate gather the dominant cost of every neighbor-dependent stage.  But
grid candidates are not random rows: each query's 27-cell window is 9
CONTIGUOUS z-column runs of the cell-sorted cloud (grid_hash layout).  These
kernels DMA those runs directly from a tile-chunked HBM table into VMEM
(measured ~70x the gather's effective row rate) and reduce them in place —
no top-k, no k_max truncation, no neighborhood materialization.

Layouts
-------
- Table: ``(n_tiles, 8, 128)`` f32 — row ``r`` of the packed cell-sorted
  cloud lives at ``[r // 128, :, r % 128]``; sublanes are the packed features
  ``[x, y, z, nx, ny, nz, 0, 0]``.  A run of rows is a dim-0 slice, which
  Mosaic DMAs at any offset (lane/sublane dims stay full tiles).
- Runs: per query 9 x (tile_start, start_off, end_off) int32 in a
  ``(blocks, QB, 32)`` array (offsets relative to ``tile_start * 128``);
  query positions ride in a parallel f32 array.  The kernel copies its
  blocks into SMEM and reads scalars from there (DMA addresses and broadcast
  scalars must come from SMEM — Mosaic cannot bitcast an SMEM scalar).
- Scratch: ``(QB, run_tiles, 8, 9 * 128)`` — run j's tiles land in lane
  segment ``[128 j, 128 (j + 1))``, so ONE vector op processes all nine runs
  of a query (the per-run (1, 128) formulation was issue-bound: ~9x more
  vector instructions for the same FLOPs).

The kernel processes ``QB`` queries per grid step: issues all 9*QB run DMAs
up front (maximum overlap), waits, then reduces each query's fused tile rows
with masked VPU ops — validity = lane row in [start, end), plus the exact
radius test.

``interpret=True`` (automatic off-TPU) runs the same kernel through the
Pallas interpreter so CPU tests validate semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid_hash import HashGrid, _zcolumn_runs

TILE = 128
RUNS = 9
LANES = RUNS * TILE  # 1152


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


_FUSED = {"enabled": None}  # None: resolve from SHOT_FPFH_FUSED on first use


def fused_kernels_enabled() -> bool:
    """Whether the fused Pallas descriptor kernels (ops/pallas_shot_fused,
    ops/pallas_fpfh_fused) replace the XLA window paths.  TPU only —
    CPU/virtual-mesh runs always keep the XLA path (same math).  Default ON
    since the round-4 hardware A/B (benchmarks/profile_window.py on a v5e
    chip: fused 4.60 ms vs XLA 4.75 ms per 4096 descriptors, with all 10
    hardware-parity tests green); set ``SHOT_FPFH_FUSED=0`` to force the XLA
    path.  Use :func:`set_fused_kernels` to toggle at runtime — the flag is
    read at TRACE time, so mutating the environment variable after a program
    has compiled has no effect."""
    if _FUSED["enabled"] is None:
        import os

        _FUSED["enabled"] = os.environ.get("SHOT_FPFH_FUSED", "1") != "0"
    return _FUSED["enabled"] and _on_tpu()


def set_fused_kernels(enabled: bool) -> None:
    """Toggle the fused descriptor kernels; drops compiled programs from the
    jit cache so the toggle takes effect immediately (the flag is read at
    trace time)."""
    if _FUSED["enabled"] is not None and _FUSED["enabled"] != bool(enabled):
        jax.clear_caches()
    _FUSED["enabled"] = bool(enabled)


_DMA = {"enabled": None}  # None: resolve from SHOT_FPFH_DMA on first use


def dma_kernel_enabled() -> bool:
    """Whether the run-DMA fused SHOT kernel (ops/pallas_shot_dma) replaces
    the gather-based window path on qualifying grids (xy-row mode with
    normals extras).  TPU only; default OFF: the round-4 hardware A/B
    measured 4.65 ms per 4096 descriptors — better than the XLA path
    (4.75 ms) but behind the gather+fused-kernel route (4.60 ms), so its
    in-kernel fetch buys nothing over the XLA gather on this workload
    (DESIGN.md §11).  Set ``SHOT_FPFH_DMA=1`` to enable; same trace-time
    semantics as :func:`fused_kernels_enabled`."""
    if _DMA["enabled"] is None:
        import os

        _DMA["enabled"] = os.environ.get("SHOT_FPFH_DMA", "0") != "0"
    return _DMA["enabled"] and _on_tpu()


def set_dma_kernel(enabled: bool) -> None:
    """Toggle the run-DMA SHOT kernel; clears jit caches like
    :func:`set_fused_kernels`."""
    if _DMA["enabled"] is not None and _DMA["enabled"] != bool(enabled):
        jax.clear_caches()
    _DMA["enabled"] = bool(enabled)


@functools.partial(jax.jit, static_argnames=("n_feat",))
def tile_table(packed: jnp.ndarray, n_feat: int = 8) -> jnp.ndarray:
    """Pack ``(N, F)`` rows into the ``(n_tiles, 8, TILE)`` DMA layout."""
    n, f = packed.shape
    nt = -(-n // TILE)
    out = jnp.zeros((nt * TILE, n_feat), jnp.float32)
    out = out.at[:n, :f].set(packed.astype(jnp.float32))
    return out.reshape(nt, TILE, n_feat).transpose(0, 2, 1)


def _pack_runs(grid: HashGrid, queries: jnp.ndarray, qb: int, run_tiles: int,
               r2=None):
    """Returns (runs (blocks, QB, 32) int32, qpos (blocks, QB, 32) f32):
    runs lanes [3j..3j+2] = (tile_start, start_off, end_off); qpos lanes
    0..2 = query xyz, lane 3 = per-query squared radius when ``r2`` is given
    (scalar or (Q,); kernels that take a static radius ignore the lane).
    (Both padded to 128 lanes for Mosaic.)"""
    q = queries.shape[0]
    blocks = -(-q // qb)
    start, end = _zcolumn_runs(grid, queries)            # (Q, 9)
    nt = -(-grid.packed_sorted.shape[0] // TILE)
    t = jnp.clip(start // TILE, 0, max(nt - run_tiles, 0))
    cols = [jnp.zeros((q,), jnp.int32)] * 32
    for j in range(RUNS):
        cols[3 * j] = t[:, j]
        cols[3 * j + 1] = start[:, j] - t[:, j] * TILE
        cols[3 * j + 2] = end[:, j] - t[:, j] * TILE
    # 128-lane layout: Mosaic only lowers VMEM blocks whose lane dim is a
    # full 128 tile (a 32-lane block fails memref slicing)
    lanes = jnp.pad(jnp.stack(cols, axis=1), ((0, 0), (0, 96)))
    r2_lane = (jnp.zeros((q, 1), jnp.float32) if r2 is None
               else jnp.broadcast_to(
                   jnp.asarray(r2, jnp.float32), (q,))[:, None])
    qpos = jnp.concatenate(
        [queries.astype(jnp.float32), r2_lane,
         jnp.zeros((q, 124), jnp.float32)], axis=1
    )
    pad = blocks * qb - q
    return (jnp.pad(lanes, ((0, pad), (0, 0))).reshape(blocks, qb, 128),
            jnp.pad(qpos, ((0, pad), (0, 0))).reshape(blocks, qb, 128))


def _pca_kernel(run_tiles, qb, runs_ref, qpos_ref, table_ref, out_ref,
                scratch, sems, smem, smem_q, smem_sem):
    """Accumulates count / Σdiff / Σdiff⊗diff per query (diff = p - q).

    The squared radius is read per query from qpos lane 3 (SMEM) — not a
    static arg — so one compiled kernel serves any radius, including
    per-query adaptive radii (the k-targeting normals route)."""
    cp = pltpu.make_async_copy(runs_ref.at[0], smem, smem_sem)
    cp.start()
    cp.wait()
    cq = pltpu.make_async_copy(qpos_ref.at[0], smem_q, smem_sem)
    cq.start()
    cq.wait()

    def dma(q, j):
        # one semaphore per query shared by its 9 run copies (the sflag space
        # caps total semaphores; per-copy sems overflow it at qb=64)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(smem[q, 3 * j], run_tiles)],
            scratch.at[q, :, :, pl.ds(j * TILE, TILE)],
            sems.at[q],
        )

    for q in range(qb):
        for j in range(RUNS):
            dma(q, j).start()
    for q in range(qb):
        for j in range(RUNS):
            dma(q, j).wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) % TILE
    for q in range(qb):
        qx = smem_q[q, 0]
        qy = smem_q[q, 1]
        qz = smem_q[q, 2]
        r2 = smem_q[q, 3]  # per-query squared radius (qpos lane 3)
        # per-run [start, end) offsets broadcast into their lane segments
        seg_s = jnp.concatenate(
            [jnp.full((1, TILE), smem[q, 3 * j + 1], jnp.int32)
             for j in range(RUNS)], axis=1)
        seg_e = jnp.concatenate(
            [jnp.full((1, TILE), smem[q, 3 * j + 2], jnp.int32)
             for j in range(RUNS)], axis=1)
        acc = jnp.zeros((16, LANES), jnp.float32)
        for u in range(run_tiles):
            tile = scratch[q, u]                         # (8, LANES)
            row = lane + u * TILE                        # offset within run
            dx = tile[0:1, :] - qx
            dy = tile[1:2, :] - qy
            dz = tile[2:3, :] - qz
            d2 = dx * dx + dy * dy + dz * dz
            m = ((row >= seg_s) & (row < seg_e) & (d2 <= r2)).astype(jnp.float32)
            acc = acc + jnp.concatenate([
                m, m * dx, m * dy, m * dz,
                m * dx * dx, m * dy * dy, m * dz * dz,
                m * dx * dy, m * dx * dz, m * dy * dz,
                jnp.zeros((6, LANES), jnp.float32),
            ], axis=0)
        out_ref[0, q, :] = jnp.sum(acc, axis=1)


@functools.partial(
    jax.jit, static_argnames=("run_tiles", "qb", "interpret")
)
def _pca_call(runs, qpos, table, run_tiles: int, qb: int,
              interpret: bool):
    blocks = runs.shape[0]
    kernel = functools.partial(_pca_kernel, run_tiles, qb)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((blocks, qb, 16), jnp.float32),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((1, qb, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, qb, 16), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((qb, run_tiles, 8, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((qb,)),
            pltpu.SMEM((qb, 128), jnp.int32),
            pltpu.SMEM((qb, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(runs, qpos, table)


def radius_pca_pallas(
    grid: HashGrid, queries, radius, qb: int = 32
):
    """Fused radius-neighborhood PCA via run-DMA streaming — the Pallas
    counterpart of ``grid_hash.grid_radius_pca`` (same contract: covariance
    with the reference's centered/count normalization, barycenter, count; ALL
    in-radius points contribute, no k cap).

    ``radius`` may be a scalar or a per-query ``(Q,)`` vector; it rides in
    qpos lane 3 rather than being baked into the compile, so one compiled
    kernel serves every radius.
    """
    assert grid.halo == 1, "Pallas kernels stream 9 z-column runs (halo=1)"
    if not grid.has_table:
        from .grid_hash import grid_radius_pca

        return grid_radius_pca(grid, queries, radius)
    queries = jnp.asarray(queries, jnp.float32)
    q = queries.shape[0]
    run_tiles = min(
        -(-int(grid.col_cap) // TILE) + 1,
        -(-grid.packed_sorted.shape[0] // TILE),
    )
    table = tile_table(grid.packed_sorted[:, :3], 8)
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    runs, qpos = _pack_runs(grid, queries, qb, run_tiles, r2=r2)
    out = _pca_call(runs, qpos, table, run_tiles, qb,
                    interpret=not _on_tpu())
    out = out.reshape(-1, 16)[:q]
    count = out[:, 0]
    safe = jnp.maximum(count, 1.0)
    mean = out[:, 1:4] / safe[:, None]                    # E[p - q]
    xx, yy, zz, xy, xz, yz = (out[:, 4 + i] / safe for i in range(6))
    second = jnp.stack([
        jnp.stack([xx, xy, xz], -1),
        jnp.stack([xy, yy, yz], -1),
        jnp.stack([xz, yz, zz], -1),
    ], -2)
    cov = second - jnp.einsum("qi,qj->qij", mean, mean)
    bary = mean + queries
    return cov, bary, count


def _dist_kernel(run_tiles, qb, r2, runs_ref, qpos_ref, table_ref, out_ref,
                 scratch, sems, smem, smem_q, smem_sem):
    """Masked candidate distances: out[q, j*RT*128 + u*128 + lane] = d or inf.

    The caller reconstructs candidate slots from the run table
    (slot = tile_start_j * 128 + u * 128 + lane), so distances are the only
    kernel output; selection (top-k) and the k-row value gather stay in XLA
    where they are already efficient.
    """
    cp = pltpu.make_async_copy(runs_ref.at[0], smem, smem_sem)
    cp.start()
    cp.wait()
    cq = pltpu.make_async_copy(qpos_ref.at[0], smem_q, smem_sem)
    cq.start()
    cq.wait()

    def dma(q, j):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(smem[q, 3 * j], run_tiles)],
            scratch.at[q, :, :, pl.ds(j * TILE, TILE)],
            sems.at[q],
        )

    for q in range(qb):
        for j in range(RUNS):
            dma(q, j).start()
    for q in range(qb):
        for j in range(RUNS):
            dma(q, j).wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) % TILE
    inf = jnp.float32(jnp.inf)
    for q in range(qb):
        qx, qy, qz = smem_q[q, 0], smem_q[q, 1], smem_q[q, 2]
        seg_s = jnp.concatenate(
            [jnp.full((1, TILE), smem[q, 3 * j + 1], jnp.int32)
             for j in range(RUNS)], axis=1)
        seg_e = jnp.concatenate(
            [jnp.full((1, TILE), smem[q, 3 * j + 2], jnp.int32)
             for j in range(RUNS)], axis=1)
        for u in range(run_tiles):
            tile = scratch[q, u]
            row = lane + u * TILE
            dx = tile[0:1, :] - qx
            dy = tile[1:2, :] - qy
            dz = tile[2:3, :] - qz
            d2 = dx * dx + dy * dy + dz * dz
            d = jnp.sqrt(d2)
            ok = (row >= seg_s) & (row < seg_e) & (d2 <= r2)
            out_ref[0, q, u, :] = jnp.where(ok, d, inf)[0]


@functools.partial(
    jax.jit, static_argnames=("r2", "run_tiles", "qb", "interpret")
)
def _dist_call(runs, qpos, table, r2: float, run_tiles: int, qb: int,
               interpret: bool):
    blocks = runs.shape[0]
    kernel = functools.partial(_dist_kernel, run_tiles, qb, r2)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((blocks, qb, run_tiles, LANES),
                                       jnp.float32),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((1, qb, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, qb, run_tiles, LANES),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((qb, run_tiles, 8, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((qb,)),
            pltpu.SMEM((qb, 128), jnp.int32),
            pltpu.SMEM((qb, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(runs, qpos, table)


def _fetch_kernel(run_tiles, qb, r2, runs_ref, qpos_ref, table_ref,
                  dist_ref, vals_ref, scratch, sems, smem, smem_q, smem_sem):
    """Run-DMA window fetch: writes the DENSE candidate window — gathered
    ``[x y z nx ny nz 0 0]`` rows plus masked distance (inf outside the run
    bounds / radius) — so XLA consumes candidates with plain dense loads
    instead of a row gather (measured row-count-bound at ~0.3M rows/ms)."""
    cp = pltpu.make_async_copy(runs_ref.at[0], smem, smem_sem)
    cp.start()
    cp.wait()
    cq = pltpu.make_async_copy(qpos_ref.at[0], smem_q, smem_sem)
    cq.start()
    cq.wait()

    def dma(q, j):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(smem[q, 3 * j], run_tiles)],
            scratch.at[q, :, :, pl.ds(j * TILE, TILE)],
            sems.at[q],
        )

    for q in range(qb):
        for j in range(RUNS):
            dma(q, j).start()
    for q in range(qb):
        for j in range(RUNS):
            dma(q, j).wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) % TILE
    inf = jnp.float32(jnp.inf)
    for q in range(qb):
        qx, qy, qz = smem_q[q, 0], smem_q[q, 1], smem_q[q, 2]
        seg_s = jnp.concatenate(
            [jnp.full((1, TILE), smem[q, 3 * j + 1], jnp.int32)
             for j in range(RUNS)], axis=1)
        seg_e = jnp.concatenate(
            [jnp.full((1, TILE), smem[q, 3 * j + 2], jnp.int32)
             for j in range(RUNS)], axis=1)
        for u in range(run_tiles):
            tile = scratch[q, u]
            row = lane + u * TILE
            dx = tile[0:1, :] - qx
            dy = tile[1:2, :] - qy
            dz = tile[2:3, :] - qz
            d2 = dx * dx + dy * dy + dz * dz
            ok = (row >= seg_s) & (row < seg_e) & (d2 <= r2)
            dist_ref[0, q, u, :] = jnp.where(ok, jnp.sqrt(d2), inf)[0]
            # feature-first output: 8 features in sublanes, candidates in
            # lanes at segment [u*LANES, (u+1)*LANES) — no transpose needed
            # downstream
            vals_ref[0, q, :, u * LANES:(u + 1) * LANES] = tile


@functools.partial(
    jax.jit, static_argnames=("r2", "run_tiles", "qb", "interpret")
)
def _fetch_call(runs, qpos, table, r2: float, run_tiles: int, qb: int,
                interpret: bool):
    blocks = runs.shape[0]
    kernel = functools.partial(_fetch_kernel, run_tiles, qb, r2)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((blocks, qb, run_tiles, LANES), jnp.float32),
            jax.ShapeDtypeStruct((blocks, qb, 8, run_tiles * LANES),
                                 jnp.float32),
        ),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((1, qb, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, qb, run_tiles, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, 8, run_tiles * LANES),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((qb, run_tiles, 8, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((qb,)),
            pltpu.SMEM((qb, 128), jnp.int32),
            pltpu.SMEM((qb, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(runs, qpos, table)


def fetch_windows_pallas(grid: HashGrid, queries, radius, qb: int = 32):
    """Dense candidate windows via run-DMA: returns ``(values, dist)`` with
    ``values`` (Q, 8, W) FEATURE-FIRST ``[x y z nx ny nz 0 0]`` rows and
    ``dist`` (Q, W) the distance or +inf where invalid, W = 9·run_tiles·128.

    This replaces the XLA candidate gather — the dominant cost of the
    descriptor leg (10.1 of 21 ms at bench scale) — with contiguous-run DMA
    at ~70x the gather's effective row rate.  The feature-first layout is
    deliberate: the consumer (``models.shot.shot_from_window_ff``) reads it
    with einsums directly, avoiding the (Q, W, 8) transpose that made the
    first dense-window attempt HBM-bound.  No top-k — the window carries the
    EXACT uncapped radius neighborhood."""
    assert grid.halo == 1, "Pallas kernels stream 9 z-column runs (halo=1)"
    assert grid.has_table, "dense window fetch needs the cell-start table"
    queries = jnp.asarray(queries, jnp.float32)
    q = queries.shape[0]
    run_tiles = min(
        -(-int(grid.col_cap) // TILE) + 1,
        -(-grid.packed_sorted.shape[0] // TILE),
    )
    table = tile_table(grid.packed_sorted, 8)
    runs, qpos = _pack_runs(grid, queries, qb, run_tiles)
    dists, vals = _fetch_call(runs, qpos, table, float(radius) ** 2,
                              run_tiles, qb, interpret=not _on_tpu())
    w = run_tiles * LANES
    dist = dists.reshape(-1, w)[:q]
    vals = vals.reshape(-1, 8, w)[:q]
    return vals, dist


def grid_radius_search_pallas(
    grid: HashGrid, queries, radius, k_max: int,
    qb: int = 32, with_values: bool = False,
):
    """Hybrid radius search: Pallas streams candidate distances (run-DMA),
    XLA selects the k_max nearest and gathers values — same contract as
    ``grid_hash.grid_radius_search``.

    The division of labor follows the measurements: candidate loading is
    ~10x faster through run DMA than through XLA's row gather, while top-k
    and the final k-row gather are already efficient in XLA.

    Measured (TPU v5e, 4096 queries / 50k cloud / k=256): ~26 ms vs ~23 ms
    for the XLA compacted search — the wider un-compacted candidate buffer
    (run_tiles*9*128 vs window_cap) costs back in top-k what the DMA saves,
    so this path is an alternative, not the default.  It wins when
    window_cap is close to the padded width (deep 3D clouds).
    """
    from .grid_hash import grid_radius_search

    assert grid.halo == 1, "Pallas kernels stream 9 z-column runs (halo=1)"
    if not grid.has_table:
        return grid_radius_search(grid, queries, radius, k_max,
                                  with_values=with_values)
    queries = jnp.asarray(queries, jnp.float32)
    q = queries.shape[0]
    run_tiles = min(
        -(-int(grid.col_cap) // TILE) + 1,
        -(-grid.packed_sorted.shape[0] // TILE),
    )
    table = tile_table(grid.packed_sorted, 8)
    runs, qpos = _pack_runs(grid, queries, qb, run_tiles)
    dists = _dist_call(runs, qpos, table, float(radius) ** 2, run_tiles, qb,
                       interpret=not _on_tpu())
    return _select_k(grid, runs, dists, queries, k_max, run_tiles,
                     with_values)


@functools.partial(jax.jit, static_argnames=("k_max", "run_tiles",
                                              "with_values"))
def _select_k(grid, runs, dists, queries, k_max: int, run_tiles: int,
              with_values: bool):
    from .neighbors import Neighborhoods

    q = queries.shape[0]
    blocks, qb = runs.shape[0], runs.shape[1]
    w = run_tiles * LANES
    # kernel layout (b, q, u, j*128+lane) -> (q, j, u, lane) so candidates
    # group per run, matching the slot arithmetic below
    d = dists.reshape(blocks, qb, run_tiles, RUNS, TILE)
    d = d.transpose(0, 1, 3, 2, 4).reshape(-1, w)[:q]
    # candidate slot for (run j, tile u, lane l) = tile_start_j*128 + u*128 + l
    t = runs.reshape(-1, 128)[:q, 0:RUNS * 3:3]       # (Q, 9) tile starts
    base = jnp.repeat(t * TILE, run_tiles * TILE, axis=1)
    off = jnp.tile(
        jnp.arange(run_tiles * TILE, dtype=jnp.int32)[None, :], (1, RUNS))
    slots = base + off                                 # (Q, 9*RT*128)
    k_eff = min(k_max, w)
    neg, pos = jax.lax.top_k(-d, k_eff)
    dist_k = -neg
    mask_k = jnp.isfinite(dist_k)
    slot_k = jnp.take_along_axis(slots, pos, axis=1)
    slot_k = jnp.where(mask_k, slot_k, 0)
    idx_k = grid.orig_idx[jnp.where(mask_k, jnp.minimum(
        slot_k, grid.orig_idx.shape[0] - 1), 0)]
    if k_eff < k_max:
        pad = ((0, 0), (0, k_max - k_eff))
        idx_k = jnp.pad(idx_k, pad)
        dist_k = jnp.pad(dist_k, pad, constant_values=jnp.inf)
        mask_k = jnp.pad(mask_k, pad)
        slot_k = jnp.pad(slot_k, pad)
    nbr = Neighborhoods(
        jnp.where(mask_k, idx_k, 0).astype(jnp.int32),
        jnp.where(mask_k, dist_k, jnp.inf),
        mask_k,
    )
    if with_values:
        safe = jnp.minimum(slot_k, grid.packed_sorted.shape[0] - 1)
        vals = jnp.where(mask_k[..., None], grid.packed_sorted[safe], 0.0)
        return nbr, vals
    return nbr
