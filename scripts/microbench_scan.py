"""Adjacency-application timing inside one device program (lax.scan).

Per-dispatch tunnel latency makes single-call timings meaningless here;
training runs hundreds of steps inside one jitted scan, so this is the
faithful microbenchmark: N chained (yu,yi) applications per program.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from idgrec_tpu.ops.bitmm import pack_rows, BI

U, I, D = 31_668, 38_048, 64
NNZ = 1_237_259
STEPS = 50

rng = np.random.default_rng(0)
rows = rng.integers(0, U, NNZ)
cols = rng.integers(0, I, NNZ)
m = np.zeros((U, I), np.int8)
m[rows, cols] = 1
packed = jnp.asarray(pack_rows(m))
packed_t = jnp.asarray(pack_rows(np.ascontiguousarray(m.T)))
m_dev = jnp.asarray(m)
GP, IP = packed.shape
GPT, UPT = packed_t.shape
print(f"packed {packed.shape}, packed_t {packed_t.shape}", flush=True)


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


def g2n(xg, n):  # G-layout -> normal
    return xg.transpose(1, 0, 2).reshape(-1, D)[:n]


def n2g(x, n_pad):  # normal -> G-layout
    x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
    return x.reshape(n_pad // 8, 8, D).transpose(1, 0, 2)


def bit_pair_step(packed, packed_t, xu, xi):
    yu_g = mu(packed, jnp.pad(xi.astype(jnp.bfloat16), ((0, IP - I), (0, 0))), GP, IP)
    yi_g = mu(packed_t, jnp.pad(xu.astype(jnp.bfloat16), ((0, UPT - U), (0, 0))), GPT, UPT)
    return g2n(yu_g, U), g2n(yi_g, I)


def dense_pair_step(m8, xu, xi):
    mm = m8.astype(jnp.bfloat16)
    yu = jnp.matmul(mm, xi.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    yi = jnp.matmul(mm.T, xu.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return yu, yi


def make_scan(step, *consts):
    @jax.jit
    def run(consts, xu, xi):
        def body(carry, _):
            xu, xi = carry
            yu, yi = step(*consts, xu, xi)
            # renormalize so values don't blow up across chained steps
            xu = (yu / (jnp.max(jnp.abs(yu)) + 1e-6)).astype(xu.dtype)
            xi = (yi / (jnp.max(jnp.abs(yi)) + 1e-6)).astype(xi.dtype)
            return (xu, xi), ()
        (xu, xi), _ = jax.lax.scan(body, (xu, xi), None, length=STEPS)
        return xu, xi
    return lambda xu, xi: run(consts, xu, xi)


xu0 = jnp.asarray(rng.standard_normal((U, D)).astype(np.float32))
xi0 = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))


# distinct inputs per call: the runtime caches identical (program, args)
# executions, so repeated identical calls measure nothing.
REPS = 4
xus = [jnp.asarray(rng.standard_normal((U, D)).astype(np.float32)) for _ in range(REPS + 1)]
xis = [jnp.asarray(rng.standard_normal((I, D)).astype(np.float32)) for _ in range(REPS + 1)]


def bench(name, fn):
    out = fn(xus[-1], xis[-1])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(xus[r], xis[r]) for r in range(REPS)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (STEPS * REPS)
    print(f"{name:28s} {dt*1e3:8.3f} ms/application (pair)", flush=True)
    return outs[0]


b = bench("bitpack pair (scan)", make_scan(bit_pair_step, packed, packed_t))
d = bench("dense pair (scan)", make_scan(dense_pair_step, m_dev))
print("outputs agree:", float(jnp.max(jnp.abs(b[0] - d[0]))), float(jnp.max(jnp.abs(b[1] - d[1]))))
