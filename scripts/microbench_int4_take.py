"""Microbench: partial (batch-row) applications vs full dual
applications at yelp2018 scale on the real chip.

The axon backend defers execution, so every timing chains STEPS
iterations through a lax.scan carry and fetches one scalar (same
methodology as microbench_apps.py). XLA-level int4 storage is NOT
benched here: the axon plugin rejects s4 arrays (RecursionError on
dispatch), so int4 is only reachable inside Pallas kernels.

Question: how fast is `m8[rows] @ z` (XLA gather + matmul) for
B=2048-scale partial applications — the last-fwd-layer /
first-bwd-layer trick that would cut 6 full sweeps per LightGCN step
to 4 full + 2 partial?
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

U, I, D = 31_744, 38_400, 64
NNZ = 1_237_259
B_U, B_I = 2_048, 4_096
STEPS = 50

rng = np.random.default_rng(0)
m_np = np.zeros((U, I), np.int8)
m_np[rng.integers(0, U, NNZ), rng.integers(0, I, NNZ)] = 1

m8 = jnp.asarray(m_np)
mt8 = jnp.asarray(np.ascontiguousarray(m_np.T))

xu0 = jnp.asarray(rng.standard_normal((U, D)).astype(np.float32))
xi0 = jnp.asarray(rng.standard_normal((I, D)).astype(np.float32))
rows_u = jnp.asarray(np.sort(rng.integers(0, U, B_U)).astype(np.int32))
rows_i = jnp.asarray(np.sort(rng.integers(0, I, B_I)).astype(np.int32))


def norm(x):
    return x / (jnp.max(jnp.abs(x)) + 1e-6)


def q8(z):
    amax = jnp.max(jnp.abs(z), axis=0)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    return jnp.round(z / s).astype(jnp.int8), s


def bench(name, app_fn, *mats):
    """app_fn(mats..., xu, xi) -> (yu [*, D], yi [*, D])."""

    @jax.jit
    def run(xu, xi):
        def body(carry, _):
            xu, xi = carry
            yu, yi = app_fn(*mats, xu, xi)
            # fold outputs back into full-size carries (partial apps
            # return batch-row outputs; scatter-add keeps dependency)
            xu = norm(xu + jnp.zeros_like(xu).at[: yu.shape[0]].set(yu))
            xi = norm(xi + jnp.zeros_like(xi).at[: yi.shape[0]].set(yi))
            return (xu, xi), ()
        (xu, xi), _ = jax.lax.scan(body, (xu, xi), None, length=STEPS)
        return jnp.sum(xu) + jnp.sum(xi)

    float(run(xu0, xi0))  # compile + run
    t0 = time.perf_counter()
    float(run(xu0, xi0))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:46s} {dt*1e3:8.3f} ms", flush=True)
    return dt


# --- full dual applications ---
def pair_bf16(m8, xu, xi):
    mm = m8.astype(jnp.bfloat16)
    yu = jnp.matmul(mm, xi.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    yi = jnp.matmul(mm.T, xu.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return yu, yi


def pair_int8(m8, xu, xi):
    qi, si = q8(xi)
    qu, su = q8(xu)
    yu = jnp.matmul(m8, qi, preferred_element_type=jnp.int32).astype(jnp.float32) * si
    yi = jnp.matmul(m8.T, qu, preferred_element_type=jnp.int32).astype(jnp.float32) * su
    return yu, yi


def pair_int8_sep_t(m8, mt8, xu, xi):
    # materialized transpose copy: both matmuls row-major
    qi, si = q8(xi)
    qu, su = q8(xu)
    yu = jnp.matmul(m8, qi, preferred_element_type=jnp.int32).astype(jnp.float32) * si
    yi = jnp.matmul(mt8, qu, preferred_element_type=jnp.int32).astype(jnp.float32) * su
    return yu, yi


# --- partial (batch-row) applications ---
def partial_take_int8(m8, mt8, xu, xi):
    qi, si = q8(xi)
    qu, su = q8(xu)
    mu = m8[rows_u]            # [B_U, I] row gather
    mi = mt8[rows_i]           # [B_I, U] row gather of transpose copy
    yu = jnp.matmul(mu, qi, preferred_element_type=jnp.int32).astype(jnp.float32) * si
    yi = jnp.matmul(mi, qu, preferred_element_type=jnp.int32).astype(jnp.float32) * su
    return yu, yi


def partial_take_bf16(m8, mt8, xu, xi):
    mu = m8[rows_u].astype(jnp.bfloat16)
    mi = mt8[rows_i].astype(jnp.bfloat16)
    yu = jnp.matmul(mu, xi.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    yi = jnp.matmul(mi, xu.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return yu, yi


def partial_dynslice_bf16(m8, mt8, xu, xi):
    # contiguous-block baseline: how much of the take cost is the
    # scattered-row gather vs. the [B,N]@[N,D] matmul itself
    mu = jax.lax.dynamic_slice_in_dim(m8, 0, B_U).astype(jnp.bfloat16)
    mi = jax.lax.dynamic_slice_in_dim(mt8, 0, B_I).astype(jnp.bfloat16)
    yu = jnp.matmul(mu, xi.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    yi = jnp.matmul(mi, xu.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return yu, yi


BENCHES = {
    "pair_bf16": ("pair int8-store bf16-compute (2 reads)", pair_bf16, (m8,)),
    "pair_int8": ("pair int8-store int8-compute (2 reads)", pair_int8, (m8,)),
    "pair_sep_t": ("pair int8 + transpose copy (2 reads)", pair_int8_sep_t, (m8, mt8)),
    "take_int8": ("partial take int8 (B=2048/4096)", partial_take_int8, (m8, mt8)),
    "take_bf16": ("partial take bf16 (B=2048/4096)", partial_take_bf16, (m8, mt8)),
    "dynslice": ("partial dynslice bf16 (lower bound)", partial_dynslice_bf16, (m8, mt8)),
}

if __name__ == "__main__":
    import sys
    print(f"devices: {jax.devices()}", flush=True)
    names = sys.argv[1:] or list(BENCHES)
    for k in names:
        label, fn, mats = BENCHES[k]
        bench(label, fn, *mats)
