"""A/B the scanned-ref-tile top-2 matcher vs the round-4 materialize+rescan
matcher on the 100k x 100k Lowe workload (VERDICT r4 next #1).

Usage: python benchmarks/ab_match.py  (runs on the live device)

Measures, device-resident descriptors, best-of-2 warm calls:
  - old-style: dense (CHUNK, K_ref) strip + two argmin passes, f32
  - new scan:  ref-tile scan with running top-2 carry, f32
  - new scan:  bf16 operands / f32 accumulation
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from shot_fpfh_tpu.registration.matching import (
    _CHUNK, _pad_rows, descriptor_sq_dists, top2_rows, top2_descriptor,
)
from shot_fpfh_tpu.utils.perf import enable_compilation_cache


@jax.jit
def top2_materialized(a, b, b_valid):
    """The round-4 matcher, kept verbatim for the A/B."""
    def one_chunk(ac):
        d2 = descriptor_sq_dists(ac, b)
        d2 = jnp.where(b_valid[None, :], d2, jnp.inf)
        i1, d1_sq, d2_sq = top2_rows(d2)
        return i1, jnp.sqrt(d1_sq), jnp.sqrt(d2_sq)

    ap, n_chunks = _pad_rows(a, _CHUNK)
    idx, d1, d2 = jax.lax.map(one_chunk, ap.reshape(n_chunks, _CHUNK, -1))
    n = a.shape[0]
    return idx.reshape(-1)[:n], d1.reshape(-1)[:n], d2.reshape(-1)[:n]


def force(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if isinstance(leaf, jax.Array):
            np.asarray(jax.device_get(leaf.ravel()[-1:]))
    return out


def best_of(fn, k=3):
    force(fn())  # compile
    times = []
    for _ in range(k):
        t0 = time.perf_counter()
        force(fn())
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    float(jnp.zeros(()).sum())  # tunnel warmup

    rng = np.random.default_rng(0)
    n = 100_000
    a = jnp.asarray(rng.normal(size=(n, 352)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(n, 352)).astype(np.float32))
    valid = jnp.ones(n, bool)

    from shot_fpfh_tpu.ops.pallas_match import top2_matmul_pallas
    from shot_fpfh_tpu.registration.matching import _top_scan

    t_old = best_of(lambda: top2_materialized(a, b, valid))
    print(f"old (materialized strip, f32): {t_old:.3f}s", flush=True)

    t_f32 = best_of(lambda: _top_scan(a, b, valid, False, True))
    print(f"new (ref-tile scan, f32):      {t_f32:.3f}s", flush=True)

    t_bf16 = best_of(lambda: _top_scan(a, b, valid, True, True))
    print(f"new (ref-tile scan, bf16):     {t_bf16:.3f}s", flush=True)

    t_pl32 = best_of(lambda: top2_matmul_pallas(a, b, valid, use_bf16=False))
    print(f"pallas (fused epilogue, f32):  {t_pl32:.3f}s", flush=True)

    t_pl = best_of(lambda: top2_matmul_pallas(a, b, valid, use_bf16=True))
    print(f"pallas (fused epilogue, bf16): {t_pl:.3f}s", flush=True)

    i_s, d1_s, _ = force(_top_scan(a, b, valid, True, True))
    i_p, d1_p, _ = force(top2_matmul_pallas(a, b, valid, use_bf16=True))
    same_p = float(np.mean(np.asarray(i_s) == np.asarray(i_p)))
    print(f"pallas vs scan bf16 idx agreement: {same_p:.5f}", flush=True)

    # agreement check between the variants on this workload
    i_o, d1_o, d2_o = force(top2_materialized(a, b, valid))
    i_f, d1_f, d2_f = force(top2_descriptor(a, b, valid, use_bf16=False))
    i_b, d1_b, d2_b = force(top2_descriptor(a, b, valid, use_bf16=True))
    same_f = float(np.mean(np.asarray(i_o) == np.asarray(i_f)))
    same_b = float(np.mean(np.asarray(i_o) == np.asarray(i_b)))
    err_b = float(np.max(np.abs(np.asarray(d1_b) - np.asarray(d1_f))
                         / np.maximum(np.asarray(d1_f), 1e-6)))
    print(f"idx agreement: f32 {same_f:.5f}, bf16 {same_b:.5f}; "
          f"bf16 d1 max rel err {err_b:.4f}", flush=True)


if __name__ == "__main__":
    main()
