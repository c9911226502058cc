"""Debug the bf16 Mosaic lowering of the match kernel: try layouts in one
process (small shapes first for real error messages, then time at 100k)."""

import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def force(x):
    for leaf in jax.tree_util.tree_leaves(x):
        if isinstance(leaf, jax.Array):
            np.asarray(jax.device_get(leaf.ravel()[-1:]))
    return x


def make(variant, BQ, BK, dp, cdt):
    """variant: 'plain' (b as (K, D), dims ((1,),(1,))) or 'bt' (b.T)."""

    def kernel(a_ref, b_ref, an_ref, bn_ref, bv_ref, i1_ref, d1_ref, d2_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            i1_ref[:] = jnp.zeros_like(i1_ref)
            d1_ref[:] = jnp.full_like(d1_ref, jnp.inf)
            d2_ref[:] = jnp.full_like(d2_ref, jnp.inf)

        # bf16 operands + an explicit fp32 contract precision is rejected by
        # Mosaic ("Bad lhs type"); DEFAULT precision with f32
        # preferred_element_type emits the native bf16-multiply/f32-accumulate
        prec = (jax.lax.Precision.DEFAULT if cdt == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        if variant == "plain":
            prod = jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (1,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
        else:
            prod = jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
        d2t = jnp.maximum(an_ref[:] + bn_ref[:] - 2.0 * prod, 0.0)
        d2t = jnp.where(bv_ref[:] > 0, d2t, jnp.inf)
        i1t = jnp.argmin(d2t, axis=1).astype(jnp.int32)[:, None]
        d1t = jnp.min(d2t, axis=1, keepdims=True)
        cols = jax.lax.broadcasted_iota(jnp.int32, d2t.shape, 1)
        d2t2 = jnp.min(jnp.where(cols == i1t, jnp.inf, d2t), axis=1,
                       keepdims=True)
        ci, cd1, cd2 = i1_ref[:], d1_ref[:], d2_ref[:]
        gi = j * d2t.shape[1] + i1t
        better = d1t < cd1
        i1_ref[:] = jnp.where(better, gi, ci)
        d1_ref[:] = jnp.where(better, d1t, cd1)
        d2_ref[:] = jnp.minimum(jnp.maximum(cd1, d1t),
                                jnp.minimum(cd2, d2t2))

    def run(a, b, valid):
        n, dim = a.shape
        nb = b.shape[0]
        ac = a.astype(cdt)
        bc = b.astype(cdt)
        an = jnp.sum(ac.astype(jnp.float32) ** 2, axis=-1)
        bn = jnp.sum(bc.astype(jnp.float32) ** 2, axis=-1)
        qp = -(-n // BQ) * BQ
        kp = -(-nb // BK) * BK
        ap = jnp.pad(ac, ((0, qp - n), (0, dp - dim)))
        bp_ = jnp.pad(bc, ((0, kp - nb), (0, dp - dim)))
        if variant == "bt":
            bp_ = bp_.T
        anp = jnp.pad(an, (0, qp - n))[:, None]
        bnp = jnp.pad(bn, (0, kp - nb))[None, :]
        bvp = jnp.pad(valid.astype(jnp.float32), (0, kp - nb))[None, :]
        grid = (qp // BQ, kp // BK)
        row_spec = pl.BlockSpec((BQ, 1), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)
        b_spec = (pl.BlockSpec((BK, dp), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM)
                  if variant == "plain" else
                  pl.BlockSpec((dp, BK), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM))
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BQ, dp), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                b_spec,
                row_spec,
                pl.BlockSpec((1, BK), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BK), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(row_spec, row_spec, row_spec),
            out_shape=(
                jax.ShapeDtypeStruct((qp, 1), jnp.int32),
                jax.ShapeDtypeStruct((qp, 1), jnp.float32),
                jax.ShapeDtypeStruct((qp, 1), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(ap, bp_, anp, bnp, bvp)
        return tuple(o[:n, 0] for o in outs)

    return jax.jit(run)


def main():
    from shot_fpfh_tpu.utils.perf import enable_compilation_cache
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    float(jnp.zeros(()).sum())

    rng = np.random.default_rng(0)
    a_s = jnp.asarray(rng.normal(size=(2048, 352)).astype(np.float32))
    b_s = jnp.asarray(rng.normal(size=(2048, 352)).astype(np.float32))
    v_s = jnp.ones(2048, bool)

    ok = {}
    for BQ, BK in ((1024, 1024), (1024, 2048), (2048, 1024), (2048, 2048),
                   (1024, 4096), (4096, 1024), (512, 2048)):
        tag = f"plain/bf16/BQ{BQ}/BK{BK}"
        try:
            f = make("plain", BQ, BK, 384, jnp.bfloat16)
            i1, d1, d2 = force(f(a_s, b_s, v_s))
            print(f"{tag}: compiles+runs, i1[0:3]={np.asarray(i1[:3])}",
                  flush=True)
            ok[tag] = f
        except Exception:
            print(f"{tag}: FAILED", flush=True)
            traceback.print_exc()

    n = 100_000
    a = jnp.asarray(rng.normal(size=(n, 352)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(n, 352)).astype(np.float32))
    v = jnp.ones(n, bool)
    for tag, f in ok.items():
        try:
            force(f(a, b, v))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                force(f(a, b, v))
                best = min(best, time.perf_counter() - t0)
            print(f"{tag} @100k^2: {best:.3f}s", flush=True)
        except Exception:
            print(f"{tag} @100k^2: FAILED", flush=True)
            traceback.print_exc()


if __name__ == "__main__":
    main()
