"""Micro-experiment: Pallas run-DMA throughput vs XLA row gather.

Table layout: tile-chunked (N/128, 8, 128) — row r lives at
[r // 128, :, r % 128].  A contiguous run of rows spans a dim-0 slice, which
Mosaic can DMA at any offset (the lane/sublane dims stay full tiles).

Loads the same total rows as the bench search (4096 queries x 9 runs x 128
rows) and compares against the XLA row gather (~13 ms).
"""

from __future__ import annotations

import sys, time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 50_000
QB = 8            # queries per program
RUNS = 9
RUN_TILES = 2     # 128-row tiles DMA'd per run
NQ = 4096
N_TILES = (N + 127) // 128


def kernel(starts_ref, table_ref, out_ref, scratch, sems):
    # starts_ref: (NQ*RUNS,) int32 tile starts (flat scalar prefetch, no pad)
    # table_ref: (N_TILES, 8, 128) HBM; scratch: (QB*RUNS, RUN_TILES, 8, 128)
    i = pl.program_id(0)
    base = i * QB * RUNS
    for k in range(QB * RUNS):
        t = starts_ref[base + k]
        pltpu.make_async_copy(
            table_ref.at[pl.ds(t, RUN_TILES)],
            scratch.at[k],
            sems.at[k],
        ).start()
    for k in range(QB * RUNS):
        t = starts_ref[base + k]
        pltpu.make_async_copy(
            table_ref.at[pl.ds(t, RUN_TILES)],
            scratch.at[k],
            sems.at[k],
        ).wait()
    acc = jnp.zeros((8, 128), jnp.float32)
    for k in range(QB * RUNS):
        acc = acc + jnp.sum(scratch[k], axis=0)
    out_ref[:, :] = acc


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(N_TILES, 8, 128)).astype(np.float32))
    starts = jnp.asarray(
        rng.integers(0, N_TILES - RUN_TILES, size=(NQ, RUNS)).astype(np.int32)
    )
    n_blocks = NQ // QB

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((QB * RUNS, RUN_TILES, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((QB * RUNS,)),
        ],
    )
    f = jax.jit(lambda s, t: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid_spec=grid_spec,
    )(s, t))

    out = f(starts.reshape(-1), table)
    jax.block_until_ready(out)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(starts.reshape(-1), table)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1000
    rows = NQ * RUNS * RUN_TILES * 128
    print(f"pallas run-DMA: {ms:.2f} ms for {rows/1e6:.2f}M rows "
          f"({rows * 32 / ms / 1e6:.1f} GB/s effective, "
          f"{NQ * RUNS / ms:.0f} DMAs/ms)")

    idx = jnp.asarray(rng.integers(0, N, size=(NQ, RUNS * RUN_TILES * 128 // 2)
                                   ).astype(np.int32))
    tbl_rows = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))
    g = jax.jit(lambda i: tbl_rows[i].sum(axis=(1, 2)))
    jax.block_until_ready(g(idx))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = g(idx)
    jax.block_until_ready(o)
    ms2 = (time.perf_counter() - t0) / reps * 1000
    print(f"xla row gather:  {ms2:.2f} ms for HALF the rows "
          f"({idx.shape[0] * idx.shape[1] / 1e6:.2f}M)")


if __name__ == "__main__":
    main()
