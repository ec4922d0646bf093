"""Dissect the fused int8/int4 dual-direction kernel's 60%-of-MXU gap.

Variants timed at yelp2018 scale (padded 31744 x 40960, d=64):
  yu-only      natural-orientation dot alone (no yi accumulation)
  yi-only      transposed dot_general + VMEM accumulator alone
  dual         current production kernel (baseline)
  dual-ti1024  column tile 1024 (halves yu accumulate passes)
  dual-i32     int32 accumulation, one convert at the end
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
from idgrec_tpu.ops.fusedmm import TI

U, I, D = 31_668, 38_048, 64
NNZ = 1_237_259
STEPS = 100

rng = np.random.default_rng(0)
m = np.zeros((U, I), np.int8)
m[rng.integers(0, U, NNZ), rng.integers(0, I, NNZ)] = 1
m8_np = fusedmm.pad_matrix(m, fusedmm.PANEL)
UP, IP = m8_np.shape
m8 = jnp.asarray(m8_np)
qu0 = jnp.asarray(rng.integers(-127, 128, (UP, D)), jnp.int8)
qi0 = jnp.asarray(rng.integers(-127, 128, (IP, D)), jnp.int8)
MACS = 2 * UP * IP * D  # per direction: UP*IP*D


def timeit(name, fn, statics, args, macs, bytes_):
    """fn(zu, zi, *statics) -> (zu_next, zi_next): the variant must
    derive BOTH next carries from its kernel output, otherwise XLA
    hoists the loop-invariant kernel out of the scan."""
    @jax.jit
    def run(statics, *a):
        def body(carry, _):
            return fn(*carry, *statics), ()
        final, _ = jax.lax.scan(body, a, None, length=STEPS)
        return final

    out = run(statics, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(statics, *args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:16s} {dt*1e3:8.3f} ms  {bytes_/dt/1e9:6.0f} GB/s  "
          f"{2*macs/dt/1e12:6.1f} TOP/s", flush=True)
    return dt


# ---- yu-only: standard blocked matmul, output revisited over j ----
def _yu_kernel(m_ref, qi_ref, yu_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        yu_ref[...] = jnp.zeros_like(yu_ref)
    yu_ref[...] += jnp.dot(
        m_ref[...], qi_ref[...], preferred_element_type=jnp.int32
    ).astype(jnp.float32)


def _norm(y):
    return y / (jnp.max(jnp.abs(y)) + 1.0)


def _feed(y_u, y_i, zu, zi):
    """Next (zu, zi) carries, each depending on the kernel output."""
    pu = _norm(y_u) if y_u is not None else zu
    pi = _norm(y_i) if y_i is not None else zi
    if y_u is not None and y_i is None:
        pi = zi * 0.5 + jnp.pad(pu, ((0, IP - UP), (0, 0)))
    if y_i is not None and y_u is None:
        pu = zu * 0.5 + pi[:UP]
    return pu, pi


def yu_only(zu, zi, mat, ti=TI, tu=1024):
    qi = (zi * 127).astype(jnp.int8)
    y = pl.pallas_call(
        _yu_kernel,
        grid=(UP // tu, IP // ti),
        in_specs=[
            pl.BlockSpec((tu, ti), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tu, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((UP, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(mat, qi)
    return _feed(y, None, zu, zi)


# ---- yi-only: transposed dot + persistent VMEM accumulator ----
def _yi_kernel(m_ref, qu_ref, yi_ref, yi_acc, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    ti = m_ref.shape[1]

    @pl.when(i == 0)
    def _():
        yi_acc[pl.ds(j * ti, ti), :] = jnp.zeros((ti, D), jnp.float32)

    yi_acc[pl.ds(j * ti, ti), :] += jax.lax.dot_general(
        m_ref[...], qu_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)

    @pl.when((i == ni - 1) & (j == nj - 1))
    def _():
        copy = pltpu.make_async_copy(yi_acc, yi_ref, sem)
        copy.start()
        copy.wait()


def yi_only(zu, zi, mat, ti=TI, tu=1024):
    qu = (zu * 127).astype(jnp.int8)
    y = pl.pallas_call(
        _yi_kernel,
        grid=(UP // tu, IP // ti),
        in_specs=[
            pl.BlockSpec((tu, ti), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tu, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((IP, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((IP, D), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=IP * D * 4 + 16 * 1024 * 1024,
        ),
    )(mat, qu)
    return _feed(None, y, zu, zi)


# ---- yi via transposed MATRIX copy (natural dots, blocked output) ----
def yi_via_t(zu, zi, mat_t, ti=TI, tu=1024):
    # mat_t: [IP, UP]; yi = mat_t @ qu, standard blocked matmul
    qu = (zu * 127).astype(jnp.int8)
    y = pl.pallas_call(
        _yu_kernel,
        grid=(IP // tu, UP // ti),
        in_specs=[
            pl.BlockSpec((tu, ti), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tu, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((IP, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(mat_t, qu)
    return _feed(None, y, zu, zi)


# ---- dual with TI=1024 ----
def dual(zu, zi, mat, ti):
    qu = (zu * 127).astype(jnp.int8)
    qi = (zi * 127).astype(jnp.int8)

    def kern(m_ref, qi_ref, qu_ref, yu_ref, yi_ref, yi_acc, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        ni = pl.num_programs(0)
        nj = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            yu_ref[...] = jnp.zeros_like(yu_ref)

        @pl.when(i == 0)
        def _():
            yi_acc[pl.ds(j * ti, ti), :] = jnp.zeros((ti, D), jnp.float32)

        mm = m_ref[...]
        yu_ref[...] += jnp.dot(
            mm, qi_ref[...], preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        yi_acc[pl.ds(j * ti, ti), :] += jax.lax.dot_general(
            mm, qu_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)

        @pl.when((i == ni - 1) & (j == nj - 1))
        def _():
            copy = pltpu.make_async_copy(yi_acc, yi_ref, sem)
            copy.start()
            copy.wait()

    tu = 1024
    yu, yi = pl.pallas_call(
        kern,
        grid=(UP // tu, IP // ti),
        in_specs=[
            pl.BlockSpec((tu, ti), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tu, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tu, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((UP, D), jnp.float32),
            jax.ShapeDtypeStruct((IP, D), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((IP, D), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=IP * D * 4 + 8 * 1024 * 1024 + 6 * tu * ti,
        ),
    )(mat, qi, qu)
    return _feed(yu, yi, zu, zi)


# ---- dual, int32 accumulation (convert once at the end) ----
def dual_i32(zu, zi, mat, ti=TI):
    qu = (zu * 127).astype(jnp.int8)
    qi = (zi * 127).astype(jnp.int8)

    def kern(m_ref, qi_ref, qu_ref, yu_ref, yi_ref, yi_acc, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        ni = pl.num_programs(0)
        nj = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            yu_ref[...] = jnp.zeros_like(yu_ref)

        @pl.when(i == 0)
        def _():
            yi_acc[pl.ds(j * ti, ti), :] = jnp.zeros((ti, D), jnp.int32)

        mm = m_ref[...]
        yu_ref[...] += jnp.dot(mm, qi_ref[...], preferred_element_type=jnp.int32)
        yi_acc[pl.ds(j * ti, ti), :] += jax.lax.dot_general(
            mm, qu_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

        @pl.when((i == ni - 1) & (j == nj - 1))
        def _():
            copy = pltpu.make_async_copy(yi_acc, yi_ref, sem)
            copy.start()
            copy.wait()

    tu = 1024
    yu, yi = pl.pallas_call(
        kern,
        grid=(UP // tu, IP // ti),
        in_specs=[
            pl.BlockSpec((tu, ti), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tu, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tu, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((UP, D), jnp.int32),
            jax.ShapeDtypeStruct((IP, D), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((IP, D), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=IP * D * 4 + 16 * 1024 * 1024,
        ),
    )(mat, qi, qu)
    return _feed(yu.astype(jnp.float32), yi.astype(jnp.float32), zu, zi)


def main():
    zu = jnp.asarray(rng.standard_normal((UP, D)) * 0.1, jnp.float32)
    zi = jnp.asarray(rng.standard_normal((IP, D)) * 0.1, jnp.float32)
    mb = m8.nbytes

    timeit("yu-only", yu_only, (m8,), (zu, zi), MACS // 2, mb)
    timeit("yi-only", yi_only, (m8,), (zu, zi), MACS // 2, mb)
    m8t = jnp.asarray(np.ascontiguousarray(m8_np.T))
    timeit("yi-via-T", yi_via_t, (m8t,), (zu, zi), MACS // 2, m8t.nbytes)
    timeit("dual ti512", lambda zu, zi, mat: dual(zu, zi, mat, 512),
           (m8,), (zu, zi), MACS, mb)
    timeit("dual ti1024", lambda zu, zi, mat: dual(zu, zi, mat, 1024),
           (m8,), (zu, zi), MACS, mb)
    timeit("dual ti2048", lambda zu, zi, mat: dual(zu, zi, mat, 2048),
           (m8,), (zu, zi), MACS, mb)
    timeit("dual-i32", dual_i32, (m8,), (zu, zi), MACS, mb)


if __name__ == "__main__":
    main()
