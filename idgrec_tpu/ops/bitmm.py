"""Bit-packed binary adjacency matmul (Pallas TPU kernel).

The dense propagation backend (idgrec_tpu.ops.propagate) reduces every
graph normalization to ``diag(L) · M · diag(R)`` with M the *binary*
interaction matrix (reference train files list each (user, item) pair
once — /root/reference/utility/utility_data/data_loader.py:38-43, so
counts are 0/1). Propagating through M as an int8 dense matmul is
HBM-bound on ``U·I`` bytes; storing M **bit-packed** (8 rows per byte)
cuts adjacency HBM traffic 8× and leaves the op MXU-bound.

Both propagation directions of the square adjacency are computed:

    yu = M  @ xi        [U, d]
    yi = Mᵀ @ xu        [I, d]

Each direction runs the same row-major kernel over its own packed
copy (M and Mᵀ packed separately — 2·U·I/8 bytes total, still 4× less
than one int8 copy), so the MXU always sees a natural [rows, K]·[K, d]
matmul and never a transposed contraction. Bits are unpacked in VMEM
with i32 shift/mask (Mosaic has no i8 vector shifts) and fed to the
MXU as bf16 with f32 accumulation — exact for binary values.

The backward pass is the same fused op with the output cotangents
swapped ((dxu, dxi) = (M @ g_yi, Mᵀ @ g_yu) — the block matrix
[[0,M],[Mᵀ,0]] is symmetric), so one adjacency application costs
exactly two packed sweeps forward and two backward.

Row-group ("G") layout: a [U, d] matrix in G-layout is ``[8, U/8, d]``
with ``X_g[k, g] = X[8*g + k]`` — the layout matching the bit packing,
so unpacked bit-planes ``(packed >> k) & 1`` line up with embedding
rows without sublane interleaving; planes are stacked along the
sublane axis into one [8·BU/8, BI] operand per tile to keep the MXU
busy with a single large matmul.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# logical tile sizes: BU rows of M (BU//8 packed sublanes), BI columns
BU = 1024  # rows per tile (128 packed rows)
BI = 512   # cols per tile


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_rows(m: np.ndarray) -> np.ndarray:
    """Pack a binary matrix [R, C] row-wise into int8 [R_pad/8, C_pad].

    Bit k of packed[g, c] is m[8*g + k, c]. Padding rows/cols are zero.
    """
    from idgrec_tpu.data import native

    r, c = m.shape
    r_pad, c_pad = _round_up(r, BU), _round_up(c, BI)
    packed = native.pack_rows(np.ascontiguousarray(m, np.int8), r_pad, c_pad)
    if packed is None:  # no native library: numpy packbits fallback
        packed = np.zeros((r_pad // 8, c_pad), np.uint8)
        # packbits along rows, LSB-first: bit k of byte g is row 8g+k
        packed[: -(-r // 8), :c] = np.packbits(
            (m != 0).view(np.uint8), axis=0, bitorder="little"
        )
    # int8 view: Mosaic supports i8 loads/casts but not u8; bit pattern
    # is identical and unpack happens in i32 inside the kernel.
    return packed.view(np.int8)


def pack_pair(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(pack_rows(M), pack_rows(Mᵀ)) — the two operands of `bit_adj_matmul`."""
    return pack_rows(m), pack_rows(np.ascontiguousarray(m.T))


def to_g_layout(x: jnp.ndarray, r_pad: int) -> jnp.ndarray:
    """[R, d] -> G-layout [8, R_pad/8, d] (zero-padded)."""
    r, d = x.shape
    x = jnp.pad(x, ((0, r_pad - r), (0, 0)))
    return x.reshape(r_pad // 8, 8, d).transpose(1, 0, 2)


def from_g_layout(xg: jnp.ndarray, r: int) -> jnp.ndarray:
    """G-layout [8, R_pad/8, d] -> [R, d]."""
    _, g, d = xg.shape
    return xg.transpose(1, 0, 2).reshape(g * 8, d)[:r]


def _mm_kernel(packed_ref, x_ref, out_ref):
    """y_g[8, BU/8, d] += bits(packed[BU/8, BI]) @ x[BI, d].

    Bit-planes are concatenated along sublanes into a [BU, BI] bf16
    operand so the tile runs as one MXU matmul; the [BU, d] result
    reshapes to G-layout for free (sublane split only).
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    p = packed_ref[...].astype(jnp.int32)
    planes = [((p >> k) & 1).astype(jnp.bfloat16) for k in range(8)]
    bits = jnp.concatenate(planes, axis=0)  # [BU, BI]
    acc = jnp.dot(bits, x_ref[...], preferred_element_type=jnp.float32)
    out_ref[...] += acc.reshape(8, BU // 8, x_ref.shape[1])


def _bit_matmul(packed: jnp.ndarray, x_pad: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """bits(packed) @ x_pad -> y in G-layout [8, R_pad/8, d]."""
    gp, c_pad = packed.shape
    d = x_pad.shape[1]
    grid = (gp // (BU // 8), c_pad // BI)
    return pl.pallas_call(
        _mm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BU // 8, BI), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((BI, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, BU // 8, d), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, gp, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * gp * 8 * c_pad * d,
            bytes_accessed=gp * c_pad + c_pad * d * 2 + gp * 8 * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(packed, x_pad)


def _bit_matmul_nodiff(packed: jnp.ndarray, x: jnp.ndarray, n_rows: int,
                       interpret: bool = False) -> jnp.ndarray:
    """bits(packed) @ x -> [n_rows, d] f32 (no gradient support)."""
    c_pad = packed.shape[1]
    x_pad = jnp.pad(x.astype(jnp.bfloat16), ((0, c_pad - x.shape[0]), (0, 0)))
    return from_g_layout(_bit_matmul(packed, x_pad, interpret), n_rows)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bit_matmul(packed, packed_t, x, n_rows, interpret=False):
    """Single direction: bits(packed) @ x -> [n_rows, d] f32.

    ``packed_t`` (the transpose packing) is only touched by the
    backward pass: dx = bits(packed)ᵀ @ g = bits(packed_t) @ g.
    """
    return _bit_matmul_nodiff(packed, x, n_rows, interpret)


def _bit_matmul_fwd(packed, packed_t, x, n_rows, interpret):
    y = _bit_matmul_nodiff(packed, x, n_rows, interpret)
    return y, (packed_t, packed, x.shape[0])


def _bit_matmul_bwd(n_rows, interpret, res, g):
    packed_t, packed, n_cols = res
    dx = bit_matmul(packed_t, packed, g, n_cols, interpret)
    return (None, None, dx)


bit_matmul.defvjp(_bit_matmul_fwd, _bit_matmul_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def bit_adj_matmul(packed, packed_t, xu, xi, interpret=False):
    """(M @ xi, Mᵀ @ xu) for bit-packed binary M.

    packed:   int8 [U_pad/8, I_pad]  = pack_rows(M)
    packed_t: int8 [I_pad'/8, U_pad'] = pack_rows(Mᵀ)
    xu: [U, d] float; xi: [I, d] float (fed to the MXU as bf16,
    accumulated in f32)
    returns (yu [U, d] f32, yi [I, d] f32)

    Differentiable in xu/xi: the cotangent pull-back is the same op on
    the swapped cotangents — (dxu, dxi) = (M @ g_yi, Mᵀ @ g_yu).
    """
    return _bit_adj_fwd(packed, packed_t, xu, xi, interpret)[0]


def _bit_adj_fwd(packed, packed_t, xu, xi, interpret):
    u = xu.shape[0]
    i = xi.shape[0]
    yu = _bit_matmul_nodiff(packed, xi, u, interpret)
    yi = _bit_matmul_nodiff(packed_t, xu, i, interpret)
    return (yu, yi), (packed, packed_t)


def _bit_adj_bwd(interpret, res, g):
    packed, packed_t = res
    g_yu, g_yi = g
    dxu, dxi = bit_adj_matmul(packed, packed_t, g_yu, g_yi, interpret)
    return (None, None, dxu, dxi)


bit_adj_matmul.defvjp(_bit_adj_fwd, _bit_adj_bwd)
