"""Prototype: transposed-activation fused dual kernel at yelp2018 scale.

Measured on v5e (long-run, scan-chained, scalar-fetch synced):
  current int8 dual kernel      yu at 128 TOP/s + yi (lhs-transposed
                                contraction) at 87 TOP/s -> ~3.0 ms/app
  transposed-activation layout  yuT = qiT (.) m  (rhs ctr dim 1) 210 TOP/s
                                yiT = quT @ m    (rhs ctr dim 0) 198 TOP/s

Keeping activations as [d, N] turns BOTH directions into M=64, N-wide
natural-ish dots. This script times the T-kernel (int8 and int4) and
the boundary transposes it needs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from idgrec_tpu.ops import fusedmm

U, I, D = 31_668, 38_048, 64
NNZ = 1_237_259
TU, TI = 1024, 512
STEPS = 100

rng = np.random.default_rng(0)
m = np.zeros((U, I), np.int8)
m[rng.integers(0, U, NNZ), rng.integers(0, I, NNZ)] = 1
m8_np = fusedmm.pad_matrix(m, TI)  # TI-only padding (38400 cols, not 40960)
UP, IP = m8_np.shape
m8 = jnp.asarray(m8_np)
m4 = jnp.asarray(fusedmm.pack_nibbles(m8_np))
print(f"padded {m8_np.shape}: int8 {m8.nbytes/1e9:.2f} GB, int4 {m4.nbytes/1e9:.2f} GB",
      flush=True)


# ---------------------------------------------------------------------------
# int8 T-kernel: qiT [D, IP], quT [D, UP] -> yuT [D, UP], yiT [D, IP]
def _tkernel_int8(m_ref, qi_ref, qu_ref, yu_ref, yi_ref, yi_acc, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    ti = m_ref.shape[1]

    @pl.when(j == 0)
    def _():
        yu_ref[...] = jnp.zeros_like(yu_ref)

    @pl.when(i == 0)
    def _():
        yi_acc[:, pl.ds(j * ti, ti)] = jnp.zeros((D, ti), jnp.float32)

    mm = m_ref[...]  # [TU, ti]
    # yuT block [D, TU] += qiT_j [D, ti] (.) m [TU, ti]  (ctr: both dim 1)
    yu_ref[...] += jax.lax.dot_general(
        qi_ref[...], mm,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    # yiT [D, ti] += quT_i [D, TU] @ m [TU, ti]   (natural rhs)
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


def tdual_int8(mat, quT, qiT):
    grid = (UP // TU, IP // TI)
    return pl.pallas_call(
        _tkernel_int8,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TU, TI), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, TI), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, TU), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((D, TU), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((D, UP), jnp.float32),
            jax.ShapeDtypeStruct((D, IP), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((D, IP), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=D * IP * 4 + 16 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * UP * IP * D,
            bytes_accessed=UP * IP + (UP + IP) * D * 5,
            transcendentals=0,
        ),
    )(mat, qiT, quT)


# int4 T-kernel: nibble-packed m [UP, IP//2]; tile [TU, TI//2] holds the
# TI-column tile's lo nibbles (first TI/2 cols) and hi (last TI/2).
def _tkernel_int4(m_ref, qi_ref, qu_ref, yu_ref, yi_ref, yi_acc, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    ti = 2 * m_ref.shape[1]
    half = ti // 2

    @pl.when(j == 0)
    def _():
        yu_ref[...] = jnp.zeros_like(yu_ref)

    @pl.when(i == 0)
    def _():
        yi_acc[:, pl.ds(j * ti, ti)] = jnp.zeros((D, ti), jnp.float32)

    raw = m_ref[...]
    lo = raw & 0xF
    hi16 = raw & jnp.int8(-16)  # 0xF0 mask; value = 16*hi, hi <= 7
    q = qi_ref[...]  # [D, ti]
    # yuT [D, TU] += qiT_lo (.) lo + (qiT_hi (.) hi16) >> 4
    yu_ref[...] += (
        jax.lax.dot_general(
            q[:, :half], lo, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        + (jax.lax.dot_general(
            q[:, half:], hi16, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32) >> 4)
    ).astype(jnp.float32)
    qu = qu_ref[...]  # [D, TU]
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


def tdual_int4(mat, quT, qiT):
    grid = (UP // TU, IP // TI)
    return pl.pallas_call(
        _tkernel_int4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TU, TI // 2), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, TI), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, TU), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((D, TU), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((D, UP), jnp.float32),
            jax.ShapeDtypeStruct((D, IP), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((D, IP), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=D * IP * 4 + 16 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * UP * IP * D,
            bytes_accessed=UP * IP // 2 + (UP + IP) * D * 5,
            transcendentals=0,
        ),
    )(mat, qiT, quT)


def scan_time(name, fn, statics, args, steps=STEPS, macs=None, bytes_=None):
    @jax.jit
    def run(statics, *a):
        def body(c, _):
            return fn(*c, *statics), ()
        c, _ = jax.lax.scan(body, a, None, length=steps)
        return sum(x.ravel()[0] for x in c)
    v = float(run(statics, *args))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        v = float(run(statics, *args))
        best = min(best, time.perf_counter() - t0)
    dt = (best - 0.031) / steps
    extra = ""
    if bytes_:
        extra += f"  {bytes_/dt/1e9:5.0f} GB/s"
    if macs:
        extra += f"  {2*macs/dt/1e12:6.1f} TOP/s"
    print(f"{name:22s} {dt*1e3:8.3f} ms{extra}", flush=True)
    return dt


def main():
    macs = 2 * UP * IP * D
    quT = jnp.asarray(rng.integers(-127, 128, (D, UP)), jnp.int8)
    qiT = jnp.asarray(rng.integers(-127, 128, (D, IP)), jnp.int8)

    # exactness vs the production int8 kernel
    yu_ref_, yi_ref_ = fusedmm.fused_adj_matmul_int8(
        jnp.asarray(fusedmm.pad_matrix(m, fusedmm.PANEL)),
        np.asarray(quT.T, np.int8)[: UP + 2560],  # PANEL pad widens items only
        jnp.asarray(np.pad(np.asarray(qiT.T), ((0, 40960 - IP), (0, 0)))),
    )
    yuT, yiT = tdual_int8(m8, quT, qiT)
    d1 = float(jnp.max(jnp.abs(yuT.T - yu_ref_)))
    d2 = float(jnp.max(jnp.abs(yiT.T - yi_ref_[:IP])))
    yuT4, yiT4 = tdual_int4(m4, quT, qiT)
    d3 = float(jnp.max(jnp.abs(yuT4 - yuT)))
    d4 = float(jnp.max(jnp.abs(yiT4 - yiT)))
    print(f"exactness: t8 vs prod {d1}, {d2}; t4 vs t8 {d3}, {d4}", flush=True)

    def t8(zuT, ziT, mat):
        quT = (zuT * 127).astype(jnp.int8)
        qiT = (ziT * 127).astype(jnp.int8)
        yuT, yiT = tdual_int8(mat, quT, qiT)
        return (yuT / (jnp.max(jnp.abs(yuT)) + 1.0),
                yiT / (jnp.max(jnp.abs(yiT)) + 1.0))

    def t4(zuT, ziT, mat):
        quT = (zuT * 127).astype(jnp.int8)
        qiT = (ziT * 127).astype(jnp.int8)
        yuT, yiT = tdual_int4(mat, quT, qiT)
        return (yuT / (jnp.max(jnp.abs(yuT)) + 1.0),
                yiT / (jnp.max(jnp.abs(yiT)) + 1.0))

    zuT = jnp.asarray(rng.standard_normal((D, UP)) * 0.1, jnp.float32)
    ziT = jnp.asarray(rng.standard_normal((D, IP)) * 0.1, jnp.float32)
    scan_time("tdual.int8", t8, (m8,), (zuT, ziT), macs=macs, bytes_=m8.nbytes)
    scan_time("tdual.int4", t4, (m4,), (zuT, ziT), macs=macs, bytes_=m4.nbytes)

    # boundary transpose cost: [U+I, D] f32 -> [D, U+I] and back
    x0 = jnp.asarray(rng.standard_normal((UP + IP, D)) * 0.1, jnp.float32)

    def tr(x):
        xt = x.T
        y = xt * 1.000001
        return ((y.T) * 0.999999,)

    scan_time("transpose roundtrip", tr, (), (x0,), bytes_=x0.nbytes * 4)


if __name__ == "__main__":
    main()
