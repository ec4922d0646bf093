"""Micro-benchmark: square-adjacency application variants at yelp2018 scale.

Compares per-application (both directions) wall time of:
  * dense int8 matmul pair (current DenseSquareAdj path)
  * Pallas bit-packed fused kernel (ops/bitmm.py)
fwd-only and fwd+bwd. Iterations are chained (output feeds next input)
so async dispatch can't hide execution time.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from idgrec_tpu.ops.bitmm import pack_rows, bit_adj_matmul

U, I, D = 31_668, 38_048, 64
NNZ = 1_237_259

rng = np.random.default_rng(0)
m = np.zeros((U, I), np.int8)
m[rng.integers(0, U, NNZ), rng.integers(0, I, NNZ)] = 1
packed = jnp.asarray(pack_rows(m))
m_dev = jnp.asarray(m)
xu0 = jnp.asarray(rng.standard_normal((U, D)).astype(np.float32)) * 0.1
xi0 = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32)) * 0.1
print(f"packed {packed.shape} {packed.nbytes/1e6:.0f}MB, dense int8 {m_dev.nbytes/1e6:.0f}MB")


def norm(x):
    return x / (jnp.max(jnp.abs(x)) + 1e-6)


@jax.jit
def dense_pair(m8, xu, xi):
    mm = m8.astype(jnp.bfloat16)
    yu = jnp.matmul(mm, xi.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    yi = jnp.matmul(mm.T, xu.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return norm(yu), norm(yi)


@jax.jit
def bit_pair(packed, xu, xi):
    yu, yi = bit_adj_matmul(packed, xu, xi)
    return norm(yu), norm(yi)


def make_step(pair):
    @jax.jit
    def step(op, xu, xi):
        def loss(xu, xi):
            yu, yi = pair(op, xu, xi)
            return jnp.sum(yu**2) + jnp.sum(yi**2)
        gu, gi = jax.grad(loss, argnums=(0, 1))(xu, xi)
        return norm(gu), norm(gi)
    return step


def timeit(name, fn, op, n=20):
    xu, xi = fn(op, xu0, xi0)  # compile
    jax.block_until_ready((xu, xi))
    t0 = time.perf_counter()
    for _ in range(n):
        xu, xi = fn(op, xu, xi)  # chained
    jax.block_until_ready((xu, xi))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:24s} {dt*1e3:8.3f} ms")
    return xu, xi


yu_d, yi_d = dense_pair(m_dev, xu0, xi0)
yu_b, yi_b = bit_pair(packed, xu0, xi0)
print("max |dense-bitpack| yu:", float(jnp.max(jnp.abs(yu_d - yu_b))),
      "yi:", float(jnp.max(jnp.abs(yi_d - yi_b))))

timeit("dense fwd pair", dense_pair, m_dev)
timeit("bitpack fwd pair", bit_pair, packed)
timeit("dense fwd+bwd", make_step(dense_pair), m_dev)
timeit("bitpack fwd+bwd", make_step(bit_pair), packed)
