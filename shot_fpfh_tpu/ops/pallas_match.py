"""Fused distance-matmul + top-2 epilogue kernel for descriptor matching.

Replaces the stage the reference runs as ``scipy.cdist`` + ``argpartition``
(matching/matching.py:197-202).  The XLA route (``registration.matching._top_scan``)
scans ref tiles and reduces each (1024, 4096) f32 distance tile into a running
top-2 carry — but XLA still materializes every tile in HBM between the matmul
and the reduction (~80 GB of write+read traffic at 100k x 100k).  Here the
tile lives only in VMEM: each grid step does one MXU dot
(``(BQ, D) x (D, BK)``, bf16 operands / f32 accumulation), forms the masked
squared distances in registers, reduces them to per-row ``(i1, d1, d2)``, and
merges into accumulators held in the (revisited) output blocks.  HBM traffic
drops to streaming the descriptor operands themselves.

Tie semantics match the XLA path exactly: within a tile ``argmin`` takes the
first minimum; across tiles the strict ``<`` merge keeps the earlier tile, so
the result is bit-identical to a dense argmin in index order.

Gate: :func:`match_kernel_enabled` (``SHOT_FPFH_MATCH_PALLAS``; TPU only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_radius import _on_tpu

_BQ = 1024   # scan-row block: held in VMEM across the whole ref sweep
_BK = 4096   # ref-tile block per grid step (v5e sweep: 4096 best of
             # {1024: 0.154s, 2048: 0.150s, 4096: 0.141s} at 100k x 100k;
             # flat within ~8%, so one bucketed shape beats per-size tuning)

_MATCH_PALLAS = {"enabled": None}


def match_kernel_enabled() -> bool:
    """Whether descriptor top-1/top-2 matching routes through the fused
    Pallas matmul+reduction kernel.  TPU only — CPU keeps the XLA tile scan
    (same math).  Default resolved from ``SHOT_FPFH_MATCH_PALLAS`` on first
    use; see DESIGN.md §12 for the measured A/B that set the default."""
    if _MATCH_PALLAS["enabled"] is None:
        import os

        _MATCH_PALLAS["enabled"] = os.environ.get(
            "SHOT_FPFH_MATCH_PALLAS", "1") != "0"
    return _MATCH_PALLAS["enabled"] and _on_tpu()


def set_match_kernel(enabled: bool) -> None:
    """Toggle the matching kernel; clears jit caches (trace-time flag)."""
    if (_MATCH_PALLAS["enabled"] is not None
            and _MATCH_PALLAS["enabled"] != bool(enabled)):
        jax.clear_caches()
    _MATCH_PALLAS["enabled"] = bool(enabled)


def _kernel(packed_epilogue, a_ref, b_ref, an_ref, bn_ref, bv_ref,
            i1_ref, d1_ref, d2_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        i1_ref[:] = jnp.zeros_like(i1_ref)
        d1_ref[:] = jnp.full_like(d1_ref, jnp.inf)
        d2_ref[:] = jnp.full_like(d2_ref, jnp.inf)

    # bf16 operands with an explicit fp32 contract precision are REJECTED by
    # Mosaic ("Bad lhs type" on tpu.matmul); DEFAULT precision + f32
    # preferred_element_type emits the native bf16-multiply/f32-accumulate
    # MXU form (measured on v5e; same lesson as the round-4 fused-kernel fix)
    prec = (jax.lax.Precision.DEFAULT if a_ref.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    prod = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )                                             # (BQ, BK)
    d2t = jnp.maximum(an_ref[:] + bn_ref[:] - 2.0 * prod, 0.0)
    d2t = jnp.where(bv_ref[:] > 0, d2t, jnp.inf)

    if packed_epilogue:
        # index-in-mantissa trick: non-negative f32 bit patterns order like
        # the floats, so replacing the low 12 mantissa bits with the column
        # index makes ONE int min return (quantized distance, argmin) — and
        # a second masked int min the runner-up — replacing the multi-pass
        # argmin + take + iota-masked min.  Costs 2^-12 relative distance
        # quantization (round toward zero), far under the bf16 operand
        # rounding this mode rides with; ties break to the lowest index,
        # same as argmin.  Masked +inf columns become NaN-pattern INTEGERS
        # (0x7f800000 | idx) — harmless: int ordering still puts them above
        # every finite pattern, and clearing the index bits restores exact
        # +inf for all-invalid rows.
        assert d2t.shape[1] <= 1 << 12
        bits = pltpu.bitcast(jnp.abs(d2t), jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, d2t.shape, 1)
        packed = (bits & jnp.int32(~0xFFF)) | cols
        # (bits come from jnp.abs below, so -0.0 cannot leak a negative
        # integer pattern into the min)
        m1 = jnp.min(packed, axis=1, keepdims=True)
        i1t = m1 & jnp.int32(0xFFF)
        d1t = pltpu.bitcast(m1 & jnp.int32(~0xFFF), jnp.float32)
        big = jnp.int32(0x7F7FF000)  # max-finite pattern w/ index bits clear
        m2 = jnp.min(jnp.where(packed == m1, big, packed), axis=1,
                     keepdims=True)
        d2t2 = pltpu.bitcast(m2 & jnp.int32(~0xFFF), jnp.float32)
        d2t2 = jnp.where(m2 >= big, jnp.inf, d2t2)
    else:
        i1t = jnp.argmin(d2t, axis=1).astype(jnp.int32)[:, None]   # (BQ, 1)
        d1t = jnp.min(d2t, axis=1, keepdims=True)
        cols = jax.lax.broadcasted_iota(jnp.int32, d2t.shape, 1)
        d2t2 = jnp.min(jnp.where(cols == i1t, jnp.inf, d2t), axis=1,
                       keepdims=True)

    ci, cd1, cd2 = i1_ref[:], d1_ref[:], d2_ref[:]
    gi = j * d2t.shape[1] + i1t
    better = d1t < cd1                            # strict: earlier tile wins
    i1_ref[:] = jnp.where(better, gi, ci)
    d1_ref[:] = jnp.where(better, d1t, cd1)
    d2_ref[:] = jnp.minimum(jnp.maximum(cd1, d1t), jnp.minimum(cd2, d2t2))


def _packed_default() -> bool:
    """Packed index-in-mantissa epilogue (`SHOT_FPFH_MATCH_PACKED=1`).
    Default OFF on the round-5 hardware A/B: 0.128 vs 0.129 s at
    100k x 100k — the multi-pass argmin was already overlapped with the
    next tile's dot, so the cheaper epilogue buys nothing (ROOFLINE
    round-5); kept as the tool if a future shape shows the epilogue
    serializing."""
    import os

    return os.environ.get("SHOT_FPFH_MATCH_PACKED", "0") == "1"


@functools.partial(jax.jit,
                   static_argnames=("use_bf16", "interpret", "packed"))
def top2_matmul_pallas(a: jnp.ndarray, b: jnp.ndarray, b_valid: jnp.ndarray,
                       *, use_bf16: bool = True, interpret: bool = False,
                       packed: bool | None = None):
    """Per-row nearest + second-nearest of ``a`` rows among ``b`` rows.

    Returns ``(i1 (n,), d1_sq (n,), d2_sq (n,))`` — squared distances, inf
    where no valid ref exists.  Same conventions as
    ``registration.matching._top_scan(want_top2=True)``.  ``packed`` selects
    the index-in-mantissa epilogue (quantizes distances by 2^-12 relative;
    default from ``SHOT_FPFH_MATCH_PACKED``)."""
    if packed is None:
        packed = _packed_default()
    n, dim = a.shape
    nb = b.shape[0]
    cdt = jnp.bfloat16 if use_bf16 else jnp.float32
    ac = a.astype(cdt)
    bc = b.astype(cdt)
    # f32 norms OF the compute-dtype values: self-distances cancel exactly
    an = jnp.sum(ac.astype(jnp.float32) ** 2, axis=-1)
    bn = jnp.sum(bc.astype(jnp.float32) ** 2, axis=-1)

    qp = -(-n // _BQ) * _BQ
    kp = -(-nb // _BK) * _BK
    dp = -(-dim // 128) * 128
    ap = jnp.pad(ac, ((0, qp - n), (0, dp - dim)))
    bp = jnp.pad(bc, ((0, kp - nb), (0, dp - dim)))
    anp = jnp.pad(an, (0, qp - n))[:, None]                  # (Qp, 1)
    bnp = jnp.pad(bn, (0, kp - nb))[None, :]                 # (1, Kp)
    bvp = jnp.pad(b_valid.astype(jnp.float32), (0, kp - nb))[None, :]

    grid = (qp // _BQ, kp // _BK)
    out_shape = (
        jax.ShapeDtypeStruct((qp, 1), jnp.int32),
        jax.ShapeDtypeStruct((qp, 1), jnp.float32),
        jax.ShapeDtypeStruct((qp, 1), jnp.float32),
    )
    row_spec = pl.BlockSpec((_BQ, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    i1, d1, d2 = pl.pallas_call(
        functools.partial(_kernel, packed),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BQ, dp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BK, dp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
            pl.BlockSpec((1, _BK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(row_spec, row_spec, row_spec),
        out_shape=out_shape,
        # the (BQ, BK) distance tile + argmin/iota temporaries exceed the
        # compiler's default 16 MB scoped-vmem budget at f32; v5e has 128 MB
        # of VMEM, so raise the cap instead of shrinking the MXU tiles
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * kp * dp,
            bytes_accessed=(qp * dp + grid[0] * kp * dp) * ac.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ap, bp, anp, bnp, bvp)
    return i1[:n, 0], d1[:n, 0], d2[:n, 0]
