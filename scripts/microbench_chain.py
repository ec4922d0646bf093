"""Chained timing of bit-packed kernels vs dense matmul (real serialized exec)."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from idgrec_tpu.ops.bitmm import pack_rows, BI

U, I, D = 31_668, 38_048, 64
NNZ = 1_237_259
rng = np.random.default_rng(0)
m = np.zeros((U, I), np.int8)
m[rng.integers(0, U, NNZ), rng.integers(0, I, NNZ)] = 1
packed = jnp.asarray(pack_rows(m))
packed_t = jnp.asarray(pack_rows(np.ascontiguousarray(m.T)))
m_dev = jnp.asarray(m)
GP, IP = packed.shape
GPT, UPT = packed_t.shape
print(f"packed {packed.shape}, packed_t {packed_t.shape}")


def mu_kernel(p_ref, x_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
    p = p_ref[...].astype(jnp.int32)
    planes = [((p >> k) & 1).astype(jnp.bfloat16) for k in range(8)]
    bfull = jnp.concatenate(planes, axis=0)
    acc = jnp.dot(bfull, x_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] += acc.reshape(8, 128, D)


def mu(p, x, gp, np_):
    return pl.pallas_call(
        mu_kernel, grid=(gp // 128, np_ // BI),
        in_specs=[pl.BlockSpec((128, BI), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                  pl.BlockSpec((BI, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128, D), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, gp, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(p, x)


from functools import partial


@partial(jax.jit, static_argnums=())
def pair_bit(packed, packed_t, xu, xi):
    """both directions via two row-major packed sweeps; returns scalar."""
    yu = mu(packed, xi.astype(jnp.bfloat16), GP, IP)
    yi = mu(packed_t, xu.astype(jnp.bfloat16), GPT, UPT)
    return jnp.sum(yu) * 1e-9 + jnp.sum(yi) * 1e-9


@jax.jit
def one_bit(packed, xi):
    return jnp.sum(mu(packed, xi.astype(jnp.bfloat16), GP, IP)) * 1e-9


@jax.jit
def pair_dense(m_dev, xu, xi):
    mm = m_dev.astype(jnp.bfloat16)
    yu = jnp.matmul(mm, xi[:I].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    yi = jnp.matmul(mm.T, xu[:U].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return jnp.sum(yu) * 1e-9 + jnp.sum(yi) * 1e-9


xu = jnp.asarray(rng.standard_normal((UPT, D)).astype(np.float32))
xi = jnp.asarray(rng.standard_normal((IP, D)).astype(np.float32))


def chained(name, fn, consts, xs, n=30):
    s = fn(*consts, *xs)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s = fn(*consts, *[x + s for x in xs])  # serialize on previous result
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt*1e3:8.3f} ms")


chained("bit one-direction", one_bit, (packed,), (xi,))
chained("bit pair (2 packs)", pair_bit, (packed, packed_t), (xu, xi))
chained("dense pair (int8)", pair_dense, (m_dev,), (xu, xi))
