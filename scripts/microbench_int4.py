"""int4 vs int8 dense adjacency matmul at yelp scale (scan-timed)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

U, I, D = 31_668, 38_048, 64
NNZ = 1_237_259
STEPS = 150

rng = np.random.default_rng(0)
m = np.zeros((U, I), np.int8)
m[rng.integers(0, U, NNZ), rng.integers(0, I, NNZ)] = 1
m8 = jnp.asarray(m)
m4 = m8.astype(jnp.int4)
print("int8", m8.nbytes / 1e6, "MB; int4 dtype ok:", m4.dtype, flush=True)


def make(mm_dtype):
    @jax.jit
    def run(mat, xu, xi):
        def body(carry, _):
            xu, xi = carry
            mmb = mat.astype(jnp.bfloat16)
            yu = jnp.matmul(mmb, xi.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
            yi = jnp.matmul(mmb.T, xu.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
            xu = yu / (jnp.max(jnp.abs(yu)) + 1e-6)
            xi = yi / (jnp.max(jnp.abs(yi)) + 1e-6)
            return (xu, xi), ()
        (xu, xi), _ = jax.lax.scan(body, (xu, xi), None, length=STEPS)
        return xu, xi
    return run


xus = [jnp.asarray(rng.standard_normal((U, D)).astype(np.float32)) for _ in range(3)]
xis = [jnp.asarray(rng.standard_normal((I, D)).astype(np.float32)) for _ in range(3)]


def bench(name, fn, mat):
    out = np.asarray(fn(mat, xus[2], xis[2])[0])  # warmup+compile, forced sync
    t0 = time.perf_counter()
    out = np.asarray(fn(mat, xus[0], xis[0])[0])
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:24s} {dt*1e3:8.3f} ms/application-pair", flush=True)
    return out


o8 = bench("int8 pair", make(jnp.int8), m8)
o4 = bench("int4 pair", make(jnp.int4), m4)
print("agree:", float(np.max(np.abs(o8 - o4))), flush=True)
