"""Component breakdown of the CURRENT headline path (round 3).

Times nested prefixes of the grouped-window SHOT pipeline so each stage's
marginal cost falls out by subtraction:

  1. fetch        — grouped feature-planar window gather + distances
  2. + LRF        — feature-first local reference frames
  3. + histogram  — binning + factored one-hot MXU contraction
  4. + matching   — nearest-descriptor self-match

Also measures micro-benchmarks for the roofline doc:
  - raw gather index rate and bytes/s at several row widths (f32 vs bf16)
  - the histogram contraction alone on synthetic operands
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from shot_fpfh_tpu.utils.perf import enable_compilation_cache

enable_compilation_cache()

from bench import make_terrain
from shot_fpfh_tpu.models.shot import (
    _local_rfs_ff,
    _shot_accumulate,
    shot_from_window_ff,
)
from shot_fpfh_tpu.ops.grid_hash import build_grid, window_distances
from shot_fpfh_tpu.registration.matching import nearest_descriptor

REPS = int(os.environ.get("PROF_REPS", 50))


def _perturb(a, delta):
    # anti-CSE input perturbation (keeps the rep loop's body live across
    # iterations).  An int first arg (e.g. a raw gather's index array) must
    # stay int — a promoted float indexer crashes at trace time — so it gets
    # a 0/1 additive nudge instead (JAX read-indexing clamps out-of-bounds,
    # so +1 on the max index is safe).
    if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating):
        return a + delta
    return a + (jnp.asarray(delta * 1e7, jnp.int32) % 2)  # i*1e-7 -> i % 2


def timed(name, fn, *args, extra=""):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(*((_perturb(a[0], i * 1e-7),) + a[1:]))
            leaves = jax.tree_util.tree_leaves(out)
            return acc + jnp.sum(leaves[0].astype(jnp.float32))

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    float(loop(*args))  # compile
    best = np.inf
    for s in (0.5, 0.25):
        t0 = time.perf_counter()
        float(loop(*((_perturb(args[0], s),) + args[1:])))
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{name:52s} {best*1e3:8.3f} ms/rep {extra}", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    n_support, n_kp, radius = 50_000, 4096, 0.9
    cloud = make_terrain(n_support, rng)
    nrm = rng.normal(size=(n_support, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    kp = jnp.asarray(cloud[rng.choice(n_support, n_kp, replace=False)])

    float(jnp.zeros(()).sum())  # tunnel warmup
    grid = build_grid(cloud, radius / 2, extras=nrm, halo=2)
    # this surface-like terrain selects the xy-row run mode, whose gathered
    # window uses xyrow_group_cap — size the fetch-rate math off the cap the
    # measured path actually gathers (ADVICE r3 #2)
    gc = grid.xyrow_group_cap if grid.use_xyrow else grid.group_cap
    W = gc * 8
    mode = "xyrow" if grid.use_xyrow else "zcol"
    print(f"window_cap={grid.window_cap} run_mode={mode} group_cap={gc} "
          f"-> W={W}", flush=True)

    # true neighborhood stats (for the roofline's useful-work ratio)
    _v, d, ok, _r = jax.jit(lambda q: window_distances(grid, q))(kp)
    ok_np = np.asarray(ok)
    inr = np.asarray(ok & (d <= radius))
    print(f"window rows: mean {ok_np.sum(1).mean():.0f}, max {ok_np.sum(1).max()}"
          f" | in-radius: mean {inr.sum(1).mean():.0f}, max {inr.sum(1).max()}",
          flush=True)

    def fetch(q):
        return window_distances(grid, q)[1]

    def fetch_lrf(q):
        vals, d, ok2, _ = window_distances(grid, q)
        okr = ok2 & (d <= radius)
        centered = jnp.where(okr[:, None, :], vals[:, :3, :] - q[:, :, None], 0.0)
        return _local_rfs_ff(centered, jnp.where(okr, d, 0.0), okr, radius)

    def full_desc(q):
        vals, d, ok2, _ = window_distances(grid, q)
        dist_inf = jnp.where(ok2 & (d <= radius), d, jnp.inf)
        desc, _rfs = shot_from_window_ff(q, vals, dist_inf, radius,
                                         normalize=True,
                                         min_neighborhood_size=100)
        return desc

    def full_match(q):
        desc = full_desc(q)
        idx, _ = nearest_descriptor(desc, desc, jnp.ones(desc.shape[0], bool))
        return desc, idx

    t_fetch = timed("fetch (grouped gather + dist)", fetch, kp)
    t_lrf = timed("fetch + LRF", fetch_lrf, kp)
    t_desc = timed("fetch + LRF + binning + histogram", full_desc, kp)
    t_all = timed("fetch + LRF + hist + matching", full_match, kp)

    # fused Pallas kernel A/B on the same pipeline (TPU only)
    from shot_fpfh_tpu.ops.pallas_radius import _on_tpu, set_fused_kernels

    if _on_tpu():
        set_fused_kernels(True)
        timed("fetch + FUSED kernel (LRF+bin+hist)", full_desc, kp)
        timed("fetch + FUSED kernel + matching", full_match, kp)
        set_fused_kernels(False)
        # run-DMA kernel: fetch happens IN the kernel (no XLA gather), so
        # it replaces the whole fetch+LRF+bin+hist chain in one program
        if grid.use_xyrow and grid.xyrow_run_cap > 0:
            from shot_fpfh_tpu.ops.pallas_shot_dma import shot_descriptor_dma

            def dma_desc(q):
                return shot_descriptor_dma(grid, q, radius,
                                           min_neighborhood_size=100)[0]

            def dma_match(q):
                desc = dma_desc(q)
                idx, _ = nearest_descriptor(desc, desc,
                                            jnp.ones(desc.shape[0], bool))
                return desc, idx

            timed("DMA kernel (fetch+LRF+bin+hist in-kernel)", dma_desc, kp)
            timed("DMA kernel + matching", dma_match, kp)
    idx_count = n_kp * gc
    bytes_moved = idx_count * 8 * 8 * 4  # G=8 rows x 8 features x f32
    print(f"marginals: fetch {t_fetch*1e3:.2f} | LRF {1e3*(t_lrf-t_fetch):.2f} "
          f"| hist {1e3*(t_desc-t_lrf):.2f} | match {1e3*(t_all-t_desc):.2f} ms",
          flush=True)
    print(f"fetch rate: {idx_count/t_fetch/1e6:.2f} M idx/s, "
          f"{bytes_moved/t_fetch/1e9:.1f} GB/s gathered", flush=True)

    # ------------------------------------------------- gather micro-bench ---
    n_groups = grid.packed_sorted.shape[0] // 8 + 1
    idx = jnp.asarray(rng.integers(0, n_groups, size=(n_kp, gc)), jnp.int32)

    for width_f, dtype, label in (
        (64, jnp.float32, "64 f32 (256B: current layout)"),
        (32, jnp.float32, "32 f32 (128B)"),
        (16, jnp.float32, "16 f32 (64B)"),
        (8, jnp.float32, "8 f32 (32B)"),
        (64, jnp.bfloat16, "64 bf16 (128B)"),
        (32, jnp.bfloat16, "32 bf16 (64B)"),
    ):
        table = jnp.asarray(
            rng.normal(size=(n_groups, width_f)), dtype
        )

        def g(i, t=table):
            return t[i].astype(jnp.float32).sum(axis=-1)

        t = timed(f"raw gather {label}", g, idx)
        print(f"   -> {idx_count/t/1e6:.2f} M idx/s, "
              f"{idx_count*width_f*table.dtype.itemsize/t/1e9:.1f} GB/s",
              flush=True)

    # --------------------------------------------- histogram micro-bench ---
    w_arr = jnp.asarray(rng.random((n_kp, W)), jnp.float32)
    hi = jnp.asarray(rng.integers(0, 11, size=(n_kp, W)), jnp.int32)
    lo_i = jnp.asarray(rng.integers(0, 32, size=(n_kp, W)), jnp.int32)
    valid = jnp.asarray(rng.random((n_kp, W)) < 0.5)

    def hist_only(w_in):
        from shot_fpfh_tpu.models.shot import _shot_bilinear_histogram

        return _shot_bilinear_histogram(
            [(hi, [(lo_i, w_in), (lo_i, w_in), (lo_i, w_in), (lo_i, w_in)]),
             (hi, [(lo_i, w_in)])],
            valid,
        )

    t_h = timed("histogram contraction alone (5 terms)", hist_only, w_arr)
    mxu_flop = 2 * 2 * n_kp * W * 11 * 32  # two contractions of width W
    print(f"   -> contraction {mxu_flop/t_h/1e12:.2f} TFLOP/s "
          f"(vs ~197 bf16 peak)", flush=True)

    # binning marginal: accumulate minus histogram
    lx = jnp.asarray(rng.normal(size=(n_kp, W)), jnp.float32)
    ly = jnp.asarray(rng.normal(size=(n_kp, W)), jnp.float32)
    lz = jnp.asarray(rng.normal(size=(n_kp, W)), jnp.float32)
    rho = jnp.sqrt(lx**2 + ly**2 + lz**2) * 0.2
    cosine = jnp.asarray(rng.uniform(-1, 1, size=(n_kp, W)), jnp.float32)

    def accumulate(lx_in):
        return _shot_accumulate(lx_in, ly, lz, rho, cosine, valid, radius,
                                True, 100)

    t_acc = timed("binning + histogram (accumulate)", accumulate, lx)
    print(f"   -> binning marginal ~{1e3*(t_acc-t_h):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
