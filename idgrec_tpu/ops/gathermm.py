"""Row-gather matmul (Pallas TPU kernel): ``m[rows] @ z`` via per-row DMA.

The batch-row partial propagation (ops/propagate.py `matmul_rows`)
needs ``take(M, rows) @ z`` with M int8 [R, C] resident in HBM and
|rows| of a few thousand. XLA lowers the take to a generic gather that
runs far below DMA bandwidth on TPU and inserts layout copies. This
kernel fetches each row with one async DMA into a double-buffered
VMEM scratch, overlapped with the previous block's MXU matmuls.

Layout: Mosaic cannot slice single rows out of a (8,128)-tiled 2-D
memref (rows interleave inside 32-row int8 tiles), so M is stored 3-D
as ``[R, CP, LANE]`` with ``LANE = 1024`` and ``CP = C_pad/LANE`` -
slicing the LEADING dim is a major-dim slice with no tiling
constraint, and each row block lands in VMEM as a [CP, LANE] tile
that feeds CP static [RB, LANE]x[LANE, d] chunk matmuls (dynamic
sublane slicing is equally unsupported, hence the static unroll).

Forward:   out[b]  = M[rows[b]] @ z
Backward:  dz      = sum_b M[rows[b]]^T g[b]   (same gather; per chunk
           a natural [d, RB]x[RB, LANE] product accumulated in VMEM)

MEASURED CAVEAT (v5e, yelp2018 scale): TPU DMA descriptors cost ~1us
each, so per-row gathers cap at ~12-38 GB/s - an order of magnitude
under sequential HBM bandwidth. At |rows| ~ 6k per step this is
SLOWER than the full-graph dense application it was built to replace;
the kernel is kept as the opt-in `batch_rows_propagation` path and as
the scalar-prefetch DMA-gather reference implementation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 1024   # columns per chunk (lane-dim width of one chunk matmul)
RB = 128      # rows per block in the forward kernel
RB_BWD = 64   # smaller blocks in backward (dz^T accumulator shares VMEM)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_rows3(m: np.ndarray) -> np.ndarray:
    """int8 [R, C] -> [R, CP, LANE] (columns zero-padded to LANE)."""
    r, c = m.shape
    c_pad = _round_up(c, LANE)
    out = np.zeros((r, c_pad), np.int8)
    out[:, :c] = m
    return out.reshape(r, c_pad // LANE, LANE)


def _make_kernel(rb: int, cp: int, d: int, backward: bool):
    def kernel(rows_ref, m_ref, z_ref, out_ref, buf, sems, *maybe_acc):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def dma(slot, block, start):
            def issue(k, _):
                row = rows_ref[block * rb + k]
                cp_ = pltpu.make_async_copy(
                    m_ref.at[row], buf.at[slot, k], sems.at[slot, k])
                cp_.start() if start else cp_.wait()
                return 0

            jax.lax.fori_loop(0, rb, issue, 0)

        @pl.when(i == 0)
        def _():
            dma(0, 0, True)

        @pl.when(i + 1 < n)
        def _():
            dma((i + 1) % 2, i + 1, True)

        dma(i % 2, i, False)
        slot = i % 2
        if not backward:
            acc = jnp.zeros((rb, d), jnp.float32)
            for c in range(cp):
                acc += jnp.dot(buf[slot, :, c, :].astype(z_ref.dtype), z_ref[c],
                               preferred_element_type=jnp.float32)
            out_ref[...] = acc
        else:
            acc_ref = maybe_acc[0]

            @pl.when(i == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            gt = z_ref[...].T  # [d, rb] (z_ref carries the g block here)
            for c in range(cp):
                acc_ref[c] += jnp.dot(
                    gt, buf[slot, :, c, :].astype(z_ref.dtype),
                    preferred_element_type=jnp.float32)

            @pl.when(i == n - 1)
            def _():
                out_ref[...] = acc_ref[...]

    return kernel


def _fwd_call(m3, rows_pad, z3, interpret):
    b_pad = rows_pad.shape[0]
    _, cp, lane = m3.shape
    d = z3.shape[2]
    return pl.pallas_call(
        _make_kernel(RB, cp, d, backward=False),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b_pad // RB,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # m3 in HBM
                pl.BlockSpec((cp, lane, d), lambda i, rows: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RB, d), lambda i, rows: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, RB, cp, lane), jnp.int8),
                pltpu.SemaphoreType.DMA((2, RB)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=2 * RB * cp * lane + cp * lane * d * 2 + 4 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * cp * lane * d,
            bytes_accessed=b_pad * cp * lane + cp * lane * d * 2 + b_pad * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rows_pad, m3, z3)


def _bwd_call(m3, rows_pad, g, interpret):
    b_pad = rows_pad.shape[0]
    _, cp, lane = m3.shape
    d = g.shape[1]
    dzt = pl.pallas_call(
        _make_kernel(RB_BWD, cp, d, backward=True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b_pad // RB_BWD,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((RB_BWD, d), lambda i, rows: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((cp, d, lane), lambda i, rows: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, RB_BWD, cp, lane), jnp.int8),
                pltpu.SemaphoreType.DMA((2, RB_BWD)),
                pltpu.VMEM((cp, d, lane), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((cp, d, lane), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=(2 * RB_BWD * cp * lane + 2 * cp * d * lane * 4
                              + 4 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * cp * lane * d,
            bytes_accessed=b_pad * cp * lane + b_pad * d * 4 + cp * lane * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rows_pad, m3, g)
    # [CP, d, LANE] -> [CP*LANE, d]
    return dzt.transpose(0, 2, 1).reshape(cp * lane, d)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def gather_matmul(m3, rows, z, interpret=False):
    """``M[rows] @ z`` -> [B, d] f32, M stored 3-D via `pack_rows3`.

    m3: int8 [R, CP, LANE] (HBM-resident constant, no cotangent)
    rows: int32 [B] row ids (must be in range)
    z: [C, d] float with C <= CP*LANE (zero-padded internally; its
    dtype feeds the MXU, accumulation is f32)
    Differentiable in z: dz = sum_b M[rows[b]]^T g[b].
    """
    return _gather_fwd(m3, rows, z, interpret)[0]


def _pad_rows_arr(rows, rb):
    b = rows.shape[0]
    b_pad = _round_up(max(b, rb), rb)
    # padding rows point at row 0; their outputs are sliced away and
    # their bwd contribution is zeroed by masking g
    return jnp.pad(rows, (0, b_pad - b)), b


def _gather_fwd(m3, rows, z, interpret):
    _, cp, lane = m3.shape
    rows_pad, b = _pad_rows_arr(rows, RB)
    z3 = jnp.pad(z, ((0, cp * lane - z.shape[0]), (0, 0))).reshape(cp, lane, -1)
    out = _fwd_call(m3, rows_pad, z3, interpret)
    dtype_token = jnp.zeros((0,), z.dtype)  # carries z's dtype to bwd
    return out[:b], (m3, rows, b, z.shape[0], dtype_token)


def _gather_bwd(interpret, res, g):
    m3, rows, b, z_rows, dtype_token = res
    rows_pad, _ = _pad_rows_arr(rows, RB_BWD)
    b_pad = rows_pad.shape[0]
    g_pad = jnp.pad(g.astype(dtype_token.dtype), ((0, b_pad - b), (0, 0)))
    dz = _bwd_call(m3, rows_pad, g_pad, interpret)
    return (None, None, dz[:z_rows].astype(dtype_token.dtype))


gather_matmul.defvjp(_gather_fwd, _gather_bwd)
