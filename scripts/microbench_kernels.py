"""Kernel-variant shootout for the bit-packed adjacency matmul."""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from idgrec_tpu.ops.bitmm import pack_rows, BU, BI

U, I, D = 31_668, 38_048, 64
NNZ = 1_237_259
rng = np.random.default_rng(0)
m = np.zeros((U, I), np.int8)
m[rng.integers(0, U, NNZ), rng.integers(0, I, NNZ)] = 1
packed = jnp.asarray(pack_rows(m))
GP, IP = packed.shape
UP = GP * 8
xi = jnp.asarray(rng.standard_normal((IP, D)).astype(np.float32)).astype(jnp.bfloat16)
xu_g = jnp.asarray(rng.standard_normal((8, GP, D)).astype(np.float32)).astype(jnp.bfloat16)

ref_yu_g = None


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    outs = []
    t0 = time.perf_counter()
    for _ in range(n):
        outs.append(fn(*args))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt*1e3:8.3f} ms   {2*UP*IP*D*2/dt/1e12:6.1f} TFLOP/s-equiv(pair)" if 'pair' in name else f"{name:28s} {dt*1e3:8.3f} ms   {2*UP*IP*D/dt/1e12:6.1f} TFLOP/s")
    return out


# ---- variant A: loop of 8 matmuls (current) ----
def mu_a_kernel(p_ref, xi_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
    p = p_ref[...].astype(jnp.int32)
    xiv = xi_ref[...]
    for k in range(8):
        bits = ((p >> k) & 1).astype(jnp.bfloat16)
        o_ref[k] += jnp.dot(bits, xiv, preferred_element_type=jnp.float32)


def mu_a(packed, xi):
    return pl.pallas_call(
        mu_a_kernel, grid=(GP // 128, IP // BI),
        in_specs=[pl.BlockSpec((128, BI), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                  pl.BlockSpec((BI, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128, D), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, GP, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(packed, xi)


# ---- variant B: stacked single matmul ----
def mu_b_kernel(p_ref, xi_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
    p = p_ref[...].astype(jnp.int32)
    planes = [((p >> k) & 1).astype(jnp.bfloat16) for k in range(8)]
    bfull = jnp.concatenate(planes, axis=0)  # [1024, BI]
    acc = jnp.dot(bfull, xi_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] += acc.reshape(8, 128, D)


def mu_b(packed, xi):
    return pl.pallas_call(
        mu_b_kernel, grid=(GP // 128, IP // BI),
        in_specs=[pl.BlockSpec((128, BI), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                  pl.BlockSpec((BI, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128, D), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, GP, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(packed, xi)


# ---- variant C: transposed side, loop of 8 (current mtu) ----
def mtu_a_kernel(p_ref, xu_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
    p = p_ref[...].astype(jnp.int32)
    acc = o_ref[...]
    for k in range(8):
        bits = ((p >> k) & 1).astype(jnp.bfloat16)
        acc += jax.lax.dot_general(bits, xu_ref[k],
                                   dimension_numbers=(((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    o_ref[...] = acc


def mtu_a(packed, xu_g):
    return pl.pallas_call(
        mtu_a_kernel, grid=(IP // BI, GP // 128),
        in_specs=[pl.BlockSpec((128, BI), lambda j, i: (i, j), memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 128, D), lambda j, i: (0, i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BI, D), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((IP, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(packed, xu_g)


# ---- variant D: transposed side, stacked single dot_general ----
def mtu_b_kernel(p_ref, xu_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
    p = p_ref[...].astype(jnp.int32)
    planes = [((p >> k) & 1).astype(jnp.bfloat16) for k in range(8)]
    bfull = jnp.concatenate(planes, axis=0)           # [1024, BI]
    xufull = xu_ref[...].reshape(8 * 128, D)           # [1024, D]
    o_ref[...] += jax.lax.dot_general(bfull, xufull,
                                      dimension_numbers=(((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)


def mtu_b(packed, xu_g):
    return pl.pallas_call(
        mtu_b_kernel, grid=(IP // BI, GP // 128),
        in_specs=[pl.BlockSpec((128, BI), lambda j, i: (i, j), memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, 128, D), lambda j, i: (0, i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BI, D), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((IP, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(packed, xu_g)


mu_a_j = jax.jit(mu_a)
mu_b_j = jax.jit(mu_b)
mtu_a_j = jax.jit(mtu_a)
mtu_b_j = jax.jit(mtu_b)

ya = timeit("mu loop8", mu_a_j, packed, xi)
yb = timeit("mu stacked", mu_b_j, packed, xi)
print("  mu variants agree:", float(jnp.max(jnp.abs(ya - yb))))
za = timeit("mtu loop8", mtu_a_j, packed, xu_g)
zb = timeit("mtu stacked", mtu_b_j, packed, xu_g)
print("  mtu variants agree:", float(jnp.max(jnp.abs(za - zb))))


# ---- chained timing (defeats any async/dedup skew) ----
m_t = np.ascontiguousarray(m.T)
packed_t = jnp.asarray(pack_rows(m_t))
GPT, UPT = packed_t.shape
print("packed_t", packed_t.shape)

@jax.jit
def chain_mu(packed, xi):
    y = mu_b(packed, xi)          # [8, GP, D] f32
    s = jnp.max(jnp.abs(y)) + 1.0
    return (y[:, :IP // 8 if False else 0, :], y)[1], s

def chained(name, packed_arr, x0, n=20):
    x = x0
    y = mu_b_j(packed_arr, x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = mu_b_j(packed_arr, x)
        # feed a cheap function of y back into x to serialize
        x = (x * 0 + y.reshape(-1, D)[: x.shape[0]].astype(jnp.bfloat16) * 1e-6 + x)
    jax.block_until_ready(x)
    print(f"{name:28s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms (chained, incl feedback)")

chained("mu stacked [U-side]", packed, xi)
xu_flat = jnp.asarray(rng.standard_normal((UPT, D)).astype(np.float32)).astype(jnp.bfloat16)
def mu_b_t(packed, x):
    return pl.pallas_call(
        mu_b_kernel, grid=(GPT // 128, UPT // BI),
        in_specs=[pl.BlockSpec((128, BI), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                  pl.BlockSpec((BI, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128, D), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, GPT, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(packed, x)
mu_bt_j = jax.jit(mu_b_t)
x = xu_flat
y = mu_bt_j(packed_t, x); jax.block_until_ready(y)
t0 = time.perf_counter()
for _ in range(20):
    y = mu_bt_j(packed_t, x)
    x = (x * 0 + y.reshape(-1, D)[: x.shape[0]].astype(jnp.bfloat16) * 1e-6 + x)
jax.block_until_ready(x)
print(f"{'mu stacked [I-side, pack_t]':28s} {(time.perf_counter()-t0)/20*1e3:8.3f} ms (chained)")

# correctness of the pack_t route vs mtu
yi_via_t = mu_bt_j(packed_t, jnp.pad(xu_g.transpose(1,0,2).reshape(UP, D), ((0, UPT-UP),(0,0))))
yi_via_t = yi_via_t.transpose(1,0,2).reshape(-1, D)[:IP]
za2 = mtu_a_j(packed, xu_g)
print("pack_t vs mtu agree:", float(jnp.max(jnp.abs(yi_via_t - za2[:IP]))))
