"""Fused dual-direction dense adjacency matmul (Pallas TPU kernel).

Every square-adjacency application needs BOTH propagation directions
of the bipartite interaction matrix M (int8 counts, [U, I]):

    yu = M  @ zi        [U, d]
    yi = Mᵀ @ zu        [I, d]

XLA computes these as two separate matmuls, reading M (and its
transpose copy) from HBM twice — ~1.2 GB per read at yelp2018 scale,
which together with the MXU's 50% utilisation at d=64 makes the pair
~2× the single-read floor. This kernel reads each M tile ONCE and
feeds it to the MXU twice: a natural [TU, TI]·[TI, d] matmul for yu
and a transposed contraction for yi, halving adjacency HBM traffic.

yu accumulates in the standard output-block pipeline (block index i,
reduction over j). yi needs accumulation over the *outer* grid axis,
so it lives in a persistent VMEM scratch accumulator for the whole
sweep and is DMA'd to its HBM output once at the last grid step —
[I_pad, d] f32 must fit in VMEM alongside the tiles (~10 MB at
yelp2018 scale; the builder falls back to two XLA matmuls above
``MAX_YI_VMEM_BYTES``).

Backward pass = the same kernel with swapped cotangents:
(dzu, dzi) = (M @ g_yi, Mᵀ @ g_yu) since [[0,M],[Mᵀ,0]] is symmetric.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TU = 1024  # user rows per tile
TI = 512   # item cols per tile

# yi accumulator budget: I_pad * d * 4 bytes must fit in VMEM with room
# for tiles and double buffering.
MAX_YI_VMEM_BYTES = 11 * 1024 * 1024

# Wide-activation (feature-batched multi-chain, d > 64) allowance: v5e
# accepts the single-panel kernels with yi accumulators up to ~38 MB
# (measured, scripts/microbench_wide.py — int8 T d=256 compiles and
# runs at 339 TOP/s). Kept separate from MAX_YI_VMEM_BYTES so the
# tuned d<=64 routing (incl. the panelized big-graph path) is
# unchanged. The int4 NON-transposed small kernel does NOT compile at
# d=192 on v5e (tpu_compile_helper crash) — wide int4 must route
# through the T-kernel (fused_adj_matmul_int4_t), which does.
MAX_YI_VMEM_BYTES_WIDE = 39 * 1024 * 1024


def yi_budget(d: int) -> int:
    """yi-accumulator VMEM budget for feature width d (see
    MAX_YI_VMEM_BYTES_WIDE rationale)."""
    return MAX_YI_VMEM_BYTES if d <= 64 else MAX_YI_VMEM_BYTES_WIDE


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def tdual_fits(u_pad: int, i_pad: int, d: int, quant: str = "int8") -> bool:
    """Whether the transposed dual kernels (fused_adj_matmul_int{8,4}_t)
    can host a d-wide application: the single-panel path needs the whole
    [d, I_pad] yi accumulator within the wide VMEM allowance AND the
    quant mode's column multiple (TI for int8, PACK_TILE for int4) to
    divide i_pad; otherwise the panelized path needs PANEL-divisible
    columns and the [d, U_pad] yu accumulator within budget. Mirrors the
    asserts inside the _t dispatchers so callers can decline BEFORE
    tracing — e.g. RecDCL's reference d=2048 (RecDCL.py emb_size config)
    puts both accumulators ~300 MB over VMEM and must take the XLA
    int8-matmul fallback."""
    col_mult = PACK_TILE if quant == "int4" else TI
    if i_pad % col_mult == 0 and i_pad * d * 4 <= yi_budget(d):
        return True
    return i_pad % PANEL == 0 and u_pad * d * 4 <= MAX_YU_VMEM_BYTES


def pad_matrix(m: np.ndarray, item_multiple: int = TI,
               row_multiple: int = TU) -> np.ndarray:
    """Zero-pad an int8 [U, I] matrix to tile multiples.

    item_multiple: TI for the bf16 kernel (default — PANEL padding
    would add up to 4095 zero columns of pure HBM waste per sweep);
    PACK_TILE for int4 (the nibble layout's unit); PANEL when the
    panelized kernel's grid must divide. row_multiple: TU by default;
    the int4 T-kernel prefers 2048-row tiles (measured faster)."""
    u, i = m.shape
    out = np.zeros((_round_up(u, row_multiple), _round_up(i, item_multiple)), np.int8)
    out[:u, :i] = m
    return out


def _fused_kernel(m_ref, zi_ref, zu_ref, yu_ref, yi_ref, yi_acc, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    ti, d = zi_ref.shape

    @pl.when(j == 0)
    def _():
        yu_ref[...] = jnp.zeros_like(yu_ref)

    @pl.when(i == 0)
    def _():
        yi_acc[pl.ds(j * ti, ti), :] = jnp.zeros((ti, d), jnp.float32)

    mb = m_ref[...].astype(jnp.bfloat16)  # [TU, TI]
    yu_ref[...] += jnp.dot(mb, zi_ref[...], preferred_element_type=jnp.float32)
    yi_acc[pl.ds(j * TI, TI), :] += jax.lax.dot_general(
        mb, zu_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when((i == ni - 1) & (j == nj - 1))
    def _():
        copy = pltpu.make_async_copy(yi_acc, yi_ref, sem)
        copy.start()
        copy.wait()


def interpret_default() -> bool:
    """Pallas kernels run interpreted off-TPU (CPU tests / dryrun)."""
    import jax as _jax

    return _jax.default_backend() not in ("tpu", "axon")


def pick_row_tile(u_pad: int, default: int = TU) -> int | None:
    """Largest power-of-two row tile (≤ default) dividing u_pad, or None.

    The sharded path (parallel/spmm_shard.py) runs the kernels on
    per-chip row shards whose height is u_pad_global / mesh_width — a
    128-multiple but not necessarily a TU-multiple; smaller row tiles
    keep the kernel applicable with negligible extra grid overhead."""
    t = default
    while t >= 128:
        if u_pad % t == 0:
            return t
        t //= 2
    return None


def _fused_call(m8: jnp.ndarray, zu_pad: jnp.ndarray, zi_pad: jnp.ndarray,
                interpret: bool, tu: int = TU) -> tuple[jnp.ndarray, jnp.ndarray]:
    u_pad, i_pad = m8.shape
    d = zi_pad.shape[1]
    grid = (u_pad // tu, i_pad // TI)
    return pl.pallas_call(
        _fused_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tu, TI), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tu, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tu, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # whole-array HBM output
        ),
        out_shape=(
            jax.ShapeDtypeStruct((u_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((i_pad, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((i_pad, d), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # yi accumulator alone is i_pad*d*4 bytes; leave room for
            # double-buffered M tiles and the bf16 staging copies
            vmem_limit_bytes=i_pad * d * 4 + 12 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * u_pad * i_pad * d,
            bytes_accessed=u_pad * i_pad + (u_pad + i_pad) * d * 6,
            transcendentals=0,
        ),
        interpret=interpret,
    )(m8, zi_pad, zu_pad)


def fused_fits(num_items: int, d: int = 64, col_multiple: int = TI) -> bool:
    return _round_up(num_items, col_multiple) * d * 4 <= MAX_YI_VMEM_BYTES


# ---------------------------------------------------------------------------
# int8 variant: same single-sweep structure, but the MXU runs native
# s8×s8→s32 dots (2× the bf16 rate — decisive because at d=64 the bf16
# dot pair, not the HBM sweep, is the kernel's critical path). Inputs
# are pre-quantized int8 activations; scale handling lives in the
# caller (ops/propagate.py quantized paths).


# yi is accumulated PANEL-wise (PANEL columns of M at a time) so the
# kernel scales to arbitrarily wide interaction matrices: the live
# VMEM state is yu_acc [U_pad, d] + one yi panel, not the whole
# [I_pad, d]. Grid order (panel, u, j): each panel's accumulation
# completes before the next begins, and its yi slice is DMA'd out once.
PANEL = 4096          # item columns per yi panel (NJ = PANEL // TI)
MAX_YU_VMEM_BYTES = 24 * 1024 * 1024  # yu_acc budget (U_pad * d * 4)


def _fused_kernel_int8_small(m_ref, qi_ref, qu_ref, yu_ref, yi_ref, yi_acc, sem):
    """Single-panel variant: whole yi accumulator in VMEM (fastest —
    measured ~4 ms/application at yelp2018 scale vs ~6 ms panelized —
    usable while I_pad·d·4 fits MAX_YI_VMEM_BYTES)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    ti, d = qi_ref.shape

    @pl.when(j == 0)
    def _():
        yu_ref[...] = jnp.zeros_like(yu_ref)

    @pl.when(i == 0)
    def _():
        yi_acc[pl.ds(j * ti, ti), :] = jnp.zeros((ti, d), jnp.float32)

    m = m_ref[...]  # int8 [TU, TI]
    yu_ref[...] += jnp.dot(
        m, qi_ref[...], preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    yi_acc[pl.ds(j * TI, TI), :] += jax.lax.dot_general(
        m, qu_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)

    @pl.when((i == ni - 1) & (j == nj - 1))
    def _():
        copy = pltpu.make_async_copy(yi_acc, yi_ref, sem)
        copy.start()
        copy.wait()


def _fused_small_call(m8, qu, qi, interpret, tu: int = TU):
    u_pad, i_pad = m8.shape
    d = qi.shape[1]
    grid = (u_pad // tu, i_pad // TI)
    return pl.pallas_call(
        _fused_kernel_int8_small,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tu, TI), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tu, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tu, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((u_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((i_pad, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((i_pad, d), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=i_pad * d * 4 + 16 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * u_pad * i_pad * d,
            bytes_accessed=u_pad * i_pad + (u_pad + i_pad) * d * 5,
            transcendentals=0,
        ),
        interpret=interpret,
    )(m8, qi, qu)


def _fused_kernel_int8(m_ref, qi_ref, qu_ref, yu_ref, yi_ref, yu_acc, sem_u):
    p = pl.program_id(0)
    u = pl.program_id(1)
    j = pl.program_id(2)
    np_ = pl.num_programs(0)
    nu = pl.num_programs(1)
    nj = pl.num_programs(2)
    ti, d = qi_ref.shape
    tu = qu_ref.shape[0]

    @pl.when((p == 0) & (j == 0))
    def _():
        yu_acc[pl.ds(u * tu, tu), :] = jnp.zeros((tu, d), jnp.float32)

    @pl.when((u == 0) & (j == 0))
    def _():
        yi_ref[...] = jnp.zeros_like(yi_ref)

    m = m_ref[...]  # int8 [tu, ti]
    yu_acc[pl.ds(u * tu, tu), :] += jnp.dot(
        m, qi_ref[...], preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    # yi panel block (blocked output, panel-major grid => contiguous
    # revisits; Mosaic keeps the live panel in VMEM)
    yi_ref[0, pl.ds(j * ti, ti), :] += jax.lax.dot_general(
        m, qu_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)

    @pl.when((p == np_ - 1) & (u == nu - 1) & (j == nj - 1))
    def _():
        copy = pltpu.make_async_copy(yu_acc, yu_ref, sem_u)
        copy.start()
        copy.wait()


def fused_adj_matmul_int8(m8: jnp.ndarray, qu: jnp.ndarray, qi: jnp.ndarray,
                          interpret: bool = False):
    """(M @ qi, Mᵀ @ qu) for int8 M and PRE-QUANTIZED int8 activations.

    m8 int8 [U_pad, I_pad] (pad_matrix layout, I_pad a PANEL multiple);
    qu int8 [U_pad, d]; qi int8 [I_pad, d]. Returns f32 (yu [U_pad, d],
    yi [I_pad, d]) of the raw integer products — callers apply the
    dequantization column scales. Not differentiable; quantized
    training wraps it in a straight-through custom_vjp
    (ops/propagate.py).

    Dispatch: the single-panel kernel when the whole yi accumulator
    fits VMEM (fastest — ~4 ms/application at yelp2018 scale), else
    the panelized kernel (scales to arbitrarily wide matrices;
    requires U_pad * d * 4 <= MAX_YU_VMEM_BYTES)."""
    u_pad, i_pad = m8.shape
    d = qi.shape[1]
    tu = pick_row_tile(u_pad)
    assert tu is not None, f"u_pad={u_pad} not a 128-multiple"
    if i_pad * d * 4 <= yi_budget(d):
        # the grid truncates (silently dropping columns) otherwise
        assert i_pad % TI == 0, f"i_pad={i_pad} not a TI={TI} multiple"
        return _fused_small_call(m8, qu, qi, interpret, tu)
    assert i_pad % PANEL == 0, f"i_pad={i_pad} not a PANEL={PANEL} multiple"
    grid = (i_pad // PANEL, u_pad // tu, PANEL // TI)
    yu, yi3 = pl.pallas_call(
        _fused_kernel_int8,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tu, TI), lambda p, u, j: (u, p * (PANEL // TI) + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, d), lambda p, u, j: (p * (PANEL // TI) + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tu, d), lambda p, u, j: (u, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, PANEL, d), lambda p, u, j: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((u_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((i_pad // PANEL, PANEL, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((u_pad, d), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=(u_pad * d + 2 * PANEL * d) * 4 + 22 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * u_pad * i_pad * d,
            bytes_accessed=u_pad * i_pad + (u_pad + i_pad) * d * 5,
            transcendentals=0,
        ),
        interpret=interpret,
    )(m8, qi, qu)
    return yu, yi3.reshape(i_pad, d)


# ---------------------------------------------------------------------------
# int4 nibble-packed variant: the adjacency step is HBM-bound on the
# matrix read (docs/SCALING.md), and interaction counts are tiny
# (binary for every benchmark dataset), so storing two 4-bit counts
# per byte HALVES the binding resource again vs int8. XLA-level s4
# arrays are rejected by the axon PJRT plugin, so the packing lives
# inside the Pallas kernel: each [tu, TI] logical tile is stored as
# [tu, TI/2] bytes whose low nibble is the tile's FIRST TI/2 columns
# and high nibble the LAST TI/2 (no interleave -> unpack is two cheap
# VPU mask/shift ops and the MXU runs two half-width int8 dots per
# direction, same total MACs). Counts must fit an unsigned nibble
# (<= 15; callers enforce <= 7 for headroom).

NIBBLE_MAX = 7

# Logical columns per nibble-pack tile. Every int4 kernel (fused,
# T-layout, sharded) processes PACK_TILE logical columns per grid step:
# larger tiles mean wider MXU dots — the tile sweep on v5e
# (scripts/microbench_tkernel.py rationale) measured the T-kernel at
# 1.67 ms/application with 512-wide tiles vs 0.97 ms with 2048-wide.
# PANEL must stay a PACK_TILE multiple.
PACK_TILE = 2048


def pack_nibbles(m8_padded: np.ndarray) -> np.ndarray:
    """int8 [U_pad, I_pad] (values 0..NIBBLE_MAX, I_pad % PACK_TILE == 0)
    -> packed int8 [U_pad, I_pad // 2]: within each PACK_TILE-column
    tile, the low nibble holds the FIRST half's columns and the high
    nibble the LAST half's (no interleave)."""
    u, i = m8_padded.shape
    assert i % PACK_TILE == 0, f"I_pad={i} not a PACK_TILE={PACK_TILE} multiple"
    assert m8_padded.min() >= 0 and m8_padded.max() <= NIBBLE_MAX
    t = m8_padded.reshape(u, i // PACK_TILE, 2, PACK_TILE // 2).astype(np.uint8)
    return (t[:, :, 0, :] | (t[:, :, 1, :] << 4)).astype(np.int8).reshape(u, i // 2)


def _unpack(raw):
    """packed [tu, w] int8 -> (lo, hi) [tu, w] int8 in 0..15.

    Mosaic rejects right-shifts on int8 vectors on v5e ("failed to
    legalize operation 'arith.shrsi'"), so the shift is done widened
    to int32 lanes where it is legal. The trailing ``& 0xF`` mask makes
    the result exact regardless of the byte's sign (an arithmetic
    shift of a negative byte smears sign bits, but the mask drops
    them); hi <= NIBBLE_MAX <= 7 is a pack_nibbles invariant, not a
    correctness requirement of this unpack."""
    lo = raw & 0xF
    hi = ((raw.astype(jnp.int32) >> 4) & 0xF).astype(jnp.int8)
    return lo, hi


def unpack_nibbles(m4: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_nibbles as a traced op (XLA fallback paths):
    packed int8 [U, I_pad//2] -> int8 [U, I_pad]."""
    u = m4.shape[0]
    t = m4.reshape(u, -1, PACK_TILE // 2)
    lo, hi = _unpack(t)
    return jnp.concatenate([lo, hi], axis=-1).reshape(u, 2 * m4.shape[1])


def _fused_kernel_int4_small(m_ref, qi_ref, qu_ref, yu_ref, yi_ref, yi_acc, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    ti, d = qi_ref.shape
    half = ti // 2

    @pl.when(j == 0)
    def _():
        yu_ref[...] = jnp.zeros_like(yu_ref)

    @pl.when(i == 0)
    def _():
        yi_acc[pl.ds(j * ti, ti), :] = jnp.zeros((ti, d), jnp.float32)

    lo, hi = _unpack(m_ref[...])  # [tu, TI/2] each
    q = qi_ref[...]
    yu_ref[...] += (
        jnp.dot(lo, q[:half], preferred_element_type=jnp.int32)
        + jnp.dot(hi, q[half:], preferred_element_type=jnp.int32)
    ).astype(jnp.float32)
    qu = qu_ref[...]
    yi_acc[pl.ds(j * ti, half), :] += jax.lax.dot_general(
        lo, qu, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    yi_acc[pl.ds(j * ti + half, half), :] += jax.lax.dot_general(
        hi, qu, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)

    @pl.when((i == ni - 1) & (j == nj - 1))
    def _():
        copy = pltpu.make_async_copy(yi_acc, yi_ref, sem)
        copy.start()
        copy.wait()


def _fused_int4_small_call(m4, qu, qi, interpret, tu: int):
    u_pad = m4.shape[0]
    i_pad = 2 * m4.shape[1]
    d = qi.shape[1]
    grid = (u_pad // tu, i_pad // PACK_TILE)
    return pl.pallas_call(
        _fused_kernel_int4_small,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tu, PACK_TILE // 2), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((PACK_TILE, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tu, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tu, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((u_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((i_pad, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((i_pad, d), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=i_pad * d * 4 + 16 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * u_pad * i_pad * d,
            bytes_accessed=u_pad * i_pad // 2 + (u_pad + i_pad) * d * 5,
            transcendentals=0,
        ),
        interpret=interpret,
    )(m4, qi, qu)


def _fused_kernel_int4(m_ref, qi_ref, qu_ref, yu_ref, yi_ref, yu_acc, sem_u):
    p = pl.program_id(0)
    u = pl.program_id(1)
    j = pl.program_id(2)
    np_ = pl.num_programs(0)
    nu = pl.num_programs(1)
    nj = pl.num_programs(2)
    ti, d = qi_ref.shape
    half = ti // 2
    tu = qu_ref.shape[0]

    @pl.when((p == 0) & (j == 0))
    def _():
        yu_acc[pl.ds(u * tu, tu), :] = jnp.zeros((tu, d), jnp.float32)

    @pl.when((u == 0) & (j == 0))
    def _():
        yi_ref[...] = jnp.zeros_like(yi_ref)

    lo, hi = _unpack(m_ref[...])
    q = qi_ref[...]
    yu_acc[pl.ds(u * tu, tu), :] += (
        jnp.dot(lo, q[:half], preferred_element_type=jnp.int32)
        + jnp.dot(hi, q[half:], preferred_element_type=jnp.int32)
    ).astype(jnp.float32)
    qu = qu_ref[...]
    yi_ref[0, pl.ds(j * ti, half), :] += jax.lax.dot_general(
        lo, qu, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    yi_ref[0, pl.ds(j * ti + half, half), :] += jax.lax.dot_general(
        hi, qu, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)

    @pl.when((p == np_ - 1) & (u == nu - 1) & (j == nj - 1))
    def _():
        copy = pltpu.make_async_copy(yu_acc, yu_ref, sem_u)
        copy.start()
        copy.wait()


def fused_adj_matmul_int4(m4: jnp.ndarray, qu: jnp.ndarray, qi: jnp.ndarray,
                          interpret: bool = False):
    """(M @ qi, Mᵀ @ qu) for NIBBLE-PACKED M (pack_nibbles layout) and
    pre-quantized int8 activations — the int8 kernels' dispatch with
    half the adjacency HBM bytes. m4 int8 [U_pad, I_pad//2];
    qu int8 [U_pad, d]; qi int8 [I_pad, d]. Returns f32 raw products."""
    u_pad = m4.shape[0]
    i_pad = 2 * m4.shape[1]
    d = qi.shape[1]
    tu = pick_row_tile(u_pad)
    assert tu is not None, f"u_pad={u_pad} not a 128-multiple"
    if i_pad * d * 4 <= MAX_YI_VMEM_BYTES:
        # the grid truncates (silently dropping columns) otherwise
        assert i_pad % PACK_TILE == 0,             f"i_pad={i_pad} not a PACK_TILE={PACK_TILE} multiple"
        return _fused_int4_small_call(m4, qu, qi, interpret, tu)
    assert i_pad % PANEL == 0, f"i_pad={i_pad} not a PANEL={PANEL} multiple"
    grid = (i_pad // PANEL, u_pad // tu, PANEL // PACK_TILE)
    yu, yi3 = pl.pallas_call(
        _fused_kernel_int4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tu, PACK_TILE // 2),
                         lambda p, u, j: (u, p * (PANEL // PACK_TILE) + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PACK_TILE, d),
                         lambda p, u, j: (p * (PANEL // PACK_TILE) + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tu, d), lambda p, u, j: (u, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, PANEL, d), lambda p, u, j: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((u_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((i_pad // PANEL, PANEL, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((u_pad, d), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=(u_pad * d + 2 * PANEL * d) * 4 + 22 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * u_pad * i_pad * d,
            bytes_accessed=u_pad * i_pad // 2 + (u_pad + i_pad) * d * 5,
            transcendentals=0,
        ),
        interpret=interpret,
    )(m4, qi, qu)
    return yu, yi3.reshape(i_pad, d)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_adj_matmul(m8, zu, zi, interpret=False):
    """(M @ zi, Mᵀ @ zu) for int8 M padded with `pad_matrix`.

    m8: int8 [U_pad, I_pad]; zu [U, d]; zi [I, d] (floats; MXU sees
    bf16, accumulates f32). Returns (yu [U, d] f32, yi [I, d] f32).
    Differentiable in zu/zi via the swapped-cotangent identity.
    """
    return _fused_fwd(m8, zu, zi, interpret)[0]


def _fused_fwd(m8, zu, zi, interpret):
    u_pad, i_pad = m8.shape
    u, d = zu.shape
    i = zi.shape[0]
    tu = pick_row_tile(u_pad)
    assert tu is not None, f"u_pad={u_pad} not a 128-multiple"
    zu_pad = jnp.pad(zu.astype(jnp.bfloat16), ((0, u_pad - u), (0, 0)))
    zi_pad = jnp.pad(zi.astype(jnp.bfloat16), ((0, i_pad - i), (0, 0)))
    yu, yi = _fused_call(m8, zu_pad, zi_pad, interpret, tu)
    return (yu[:u], yi[:i]), m8


def _fused_bwd(interpret, m8, g):
    g_yu, g_yi = g
    dzu, dzi = fused_adj_matmul(m8, g_yu, g_yi, interpret)
    return (None, dzu, dzi)


fused_adj_matmul.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Transposed-activation ("T") kernels: activations live as [d, N] and
# BOTH directions become M=d dots with a WIDE output dimension.
#
# Why: measured on v5e (scripts/microbench_fused_variants.py, long-run
# scan-timed), the MXU runs the natural [1024,512]x[512,64] dot at
# ~128 TOP/s but the lhs-transposed contraction the dual kernel uses
# for yi ([1024,512] ctr dim 0) at only ~87 TOP/s — N=64 wastes half
# the systolic array's lanes and the transposed orientation costs
# another ~1.5x. With activations transposed, the SAME matrix tile
# serves two N-wide dots:
#
#     yuT [d, TU] = qiT [d, TI] (.) m [TU, TI]    (ctr: both dim 1)
#     yiT [d, TI] = quT [d, TU]  @  m [TU, TI]    (ctr: lhs 1, rhs 0)
#
# measured at ~210 / ~198 TOP/s — the fused application drops from
# 2.97 ms to 2.10 ms (int8) and 2.72 ms to 1.67 ms (int4) at yelp2018
# scale (scripts/microbench_tkernel.py). Bit-identical results to the
# untransposed kernels (same int32 MACs, same f32 converts).
#
# The transpose cost is amortized at the CHAIN level: the whole
# K-layer propagation (and through the custom VJP, its backward)
# stays in [d, N] layout — ops/propagate.py fused_chain_t.


def _tkernel_int8(m_ref, qi_ref, qu_ref, yu_ref, yi_ref, yi_acc, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    d, ti = qi_ref.shape

    @pl.when(j == 0)
    def _():
        yu_ref[...] = jnp.zeros_like(yu_ref)

    @pl.when(i == 0)
    def _():
        yi_acc[:, pl.ds(j * ti, ti)] = jnp.zeros((d, ti), jnp.float32)

    mm = m_ref[...]  # int8 [tu, ti]
    yu_ref[...] += jax.lax.dot_general(
        qi_ref[...], mm,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    yi_acc[:, pl.ds(j * ti, ti)] += jax.lax.dot_general(
        qu_ref[...], mm,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)

    @pl.when((i == ni - 1) & (j == nj - 1))
    def _():
        copy = pltpu.make_async_copy(yi_acc, yi_ref, sem)
        copy.start()
        copy.wait()


def _tkernel_int4(m_ref, qi_ref, qu_ref, yu_ref, yi_ref, yi_acc, sem):
    """int4 T-kernel with the mask-only unpack: hi nibbles enter the
    MXU as ``raw & 0xF0`` (their value x16 — int8-safe since hi <= 7)
    and one arithmetic >>4 on the small int32 dot OUTPUT divides the
    16 back out (exact: every product is a multiple of 16)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    d, ti = qi_ref.shape
    half = ti // 2

    @pl.when(j == 0)
    def _():
        yu_ref[...] = jnp.zeros_like(yu_ref)

    @pl.when(i == 0)
    def _():
        yi_acc[:, pl.ds(j * ti, ti)] = jnp.zeros((d, ti), jnp.float32)

    raw = m_ref[...]  # packed int8 [tu, ti//2]
    lo = raw & 0xF
    hi16 = raw & jnp.int8(-16)  # 0xF0 mask
    q = qi_ref[...]
    yu_ref[...] += (
        jax.lax.dot_general(
            q[:, :half], lo, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        + (jax.lax.dot_general(
            q[:, half:], hi16, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32) >> 4)
    ).astype(jnp.float32)
    qu = qu_ref[...]
    yi_acc[:, pl.ds(j * ti, half)] += jax.lax.dot_general(
        qu, lo, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    yi_acc[:, pl.ds(j * ti + half, half)] += (
        jax.lax.dot_general(
            qu, hi16, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32) >> 4
    ).astype(jnp.float32)

    @pl.when((i == ni - 1) & (j == nj - 1))
    def _():
        copy = pltpu.make_async_copy(yi_acc, yi_ref, sem)
        copy.start()
        copy.wait()


def _tdual_small_call(kernel, m, i_pad, qu, qi, interpret, tu, m_cols, ti):
    u_pad = m.shape[0]
    d = qi.shape[0]
    grid = (u_pad // tu, i_pad // ti)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tu, m_cols), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, ti), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tu), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((d, tu), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((d, u_pad), jnp.float32),
            jax.ShapeDtypeStruct((d, i_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, i_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # scratch + double-buffered matrix tiles + blocks; the
            # 4096-row tiles exceed a flat 16 MB headroom
            vmem_limit_bytes=i_pad * d * 4 + 12 * 1024 * 1024 + 4 * tu * m_cols,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * u_pad * i_pad * d,
            bytes_accessed=u_pad * m.shape[1] + (u_pad + i_pad) * d * 5,
            transcendentals=0,
        ),
        interpret=interpret,
    )(m, qi, qu)


def _tkernel_int8_panel(m_ref, qi_ref, qu_ref, yi_ref, yu_ref, yu_acc, sem_u):
    p = pl.program_id(0)
    u = pl.program_id(1)
    j = pl.program_id(2)
    np_ = pl.num_programs(0)
    nu = pl.num_programs(1)
    nj = pl.num_programs(2)
    d, ti = qi_ref.shape
    tu = qu_ref.shape[1]

    @pl.when((p == 0) & (j == 0))
    def _():
        yu_acc[:, pl.ds(u * tu, tu)] = jnp.zeros((d, tu), jnp.float32)

    @pl.when((u == 0) & (j == 0))
    def _():
        yi_ref[...] = jnp.zeros_like(yi_ref)

    mm = m_ref[...]
    yu_acc[:, pl.ds(u * tu, tu)] += jax.lax.dot_general(
        qi_ref[...], mm, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    yi_ref[:, pl.ds(j * ti, ti)] += jax.lax.dot_general(
        qu_ref[...], mm, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)

    @pl.when((p == np_ - 1) & (u == nu - 1) & (j == nj - 1))
    def _():
        copy = pltpu.make_async_copy(yu_acc, yu_ref, sem_u)
        copy.start()
        copy.wait()


def _tkernel_int4_panel(m_ref, qi_ref, qu_ref, yi_ref, yu_ref, yu_acc, sem_u):
    p = pl.program_id(0)
    u = pl.program_id(1)
    j = pl.program_id(2)
    np_ = pl.num_programs(0)
    nu = pl.num_programs(1)
    nj = pl.num_programs(2)
    d, ti = qi_ref.shape
    half = ti // 2
    tu = qu_ref.shape[1]

    @pl.when((p == 0) & (j == 0))
    def _():
        yu_acc[:, pl.ds(u * tu, tu)] = jnp.zeros((d, tu), jnp.float32)

    @pl.when((u == 0) & (j == 0))
    def _():
        yi_ref[...] = jnp.zeros_like(yi_ref)

    raw = m_ref[...]
    lo = raw & 0xF
    hi16 = raw & jnp.int8(-16)
    q = qi_ref[...]
    yu_acc[:, pl.ds(u * tu, tu)] += (
        jax.lax.dot_general(
            q[:, :half], lo, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        + (jax.lax.dot_general(
            q[:, half:], hi16, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32) >> 4)
    ).astype(jnp.float32)
    qu = qu_ref[...]
    yi_ref[:, pl.ds(j * ti, half)] += jax.lax.dot_general(
        qu, lo, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    yi_ref[:, pl.ds(j * ti + half, half)] += (
        jax.lax.dot_general(
            qu, hi16, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32) >> 4
    ).astype(jnp.float32)

    @pl.when((p == np_ - 1) & (u == nu - 1) & (j == nj - 1))
    def _():
        copy = pltpu.make_async_copy(yu_acc, yu_ref, sem_u)
        copy.start()
        copy.wait()


def _tdual_panel_call(kernel, m, i_pad, qu, qi, interpret, tu, m_cols_per_ti, ti):
    u_pad = m.shape[0]
    d = qi.shape[0]
    grid = (i_pad // PANEL, u_pad // tu, PANEL // ti)
    nji = PANEL // ti
    yi, yu = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tu, m_cols_per_ti), lambda p, u, j: (u, p * nji + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, ti), lambda p, u, j: (0, p * nji + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tu), lambda p, u, j: (0, u), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((d, PANEL), lambda p, u, j: (0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((d, i_pad), jnp.float32),
            jax.ShapeDtypeStruct((d, u_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, u_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=(u_pad * d + 2 * PANEL * d) * 4
            + 12 * 1024 * 1024 + 4 * tu * m_cols_per_ti,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * u_pad * i_pad * d,
            bytes_accessed=u_pad * m.shape[1] + (u_pad + i_pad) * d * 5,
            transcendentals=0,
        ),
        interpret=interpret,
    )(m, qi, qu)
    return yu, yi


def fused_adj_matmul_int8_t(m8: jnp.ndarray, quT: jnp.ndarray, qiT: jnp.ndarray,
                            interpret: bool = False):
    """Transposed-activation twin of `fused_adj_matmul_int8`:
    (M @ qi, Mᵀ @ qu) computed as (yuT, yiT) for quT int8 [d, U_pad],
    qiT int8 [d, I_pad]. Returns f32 (yuT [d, U_pad], yiT [d, I_pad])
    of the raw integer products; bit-identical to the untransposed
    kernel's outputs (same int32 MACs, same converts)."""
    u_pad, i_pad = m8.shape
    d = qiT.shape[0]
    tu = pick_row_tile(u_pad)
    assert tu is not None, f"u_pad={u_pad} not a 128-multiple"
    if i_pad * d * 4 <= yi_budget(d):
        assert i_pad % TI == 0, f"i_pad={i_pad} not a TI={TI} multiple"
        return _tdual_small_call(_tkernel_int8, m8, i_pad, quT, qiT,
                                 interpret, tu, TI, TI)
    assert i_pad % PANEL == 0, f"i_pad={i_pad} not a PANEL={PANEL} multiple"
    assert u_pad * d * 4 <= MAX_YU_VMEM_BYTES, "yu accumulator over budget"
    return _tdual_panel_call(_tkernel_int8_panel, m8, i_pad, quT, qiT,
                             interpret, tu, TI, TI)


def fused_adj_matmul_int4_t(m4: jnp.ndarray, quT: jnp.ndarray, qiT: jnp.ndarray,
                            interpret: bool = False):
    """Transposed-activation twin of `fused_adj_matmul_int4` (m4 in
    pack_nibbles layout, [U_pad, I_pad//2])."""
    u_pad = m4.shape[0]
    i_pad = 2 * m4.shape[1]
    d = qiT.shape[0]
    # measured tile sweep (yelp2018 scale, v5e): (tu=4096, ti=2048) is
    # the fastest int4 T configuration — 0.94 ms/application vs 1.67 at
    # (1024, 512)
    tu = pick_row_tile(u_pad, default=4096)
    assert tu is not None, f"u_pad={u_pad} not a 128-multiple"
    if i_pad * d * 4 <= yi_budget(d):
        assert i_pad % PACK_TILE == 0,             f"i_pad={i_pad} not a PACK_TILE={PACK_TILE} multiple"
        return _tdual_small_call(_tkernel_int4, m4, i_pad, quT, qiT,
                                 interpret, tu, PACK_TILE // 2, PACK_TILE)
    assert i_pad % PANEL == 0, f"i_pad={i_pad} not a PANEL={PANEL} multiple"
    assert u_pad * d * 4 <= MAX_YU_VMEM_BYTES, "yu accumulator over budget"
    return _tdual_panel_call(_tkernel_int4_panel, m4, i_pad, quT, qiT,
                             interpret, tu, PACK_TILE // 2, PACK_TILE)
