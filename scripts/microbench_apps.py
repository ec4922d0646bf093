"""Per-application timing of each square-adjacency propagation path
at yelp2018 scale on the real chip (scan-timed, dispatch amortized).

One "application" = both directions (yu = M@zi, yi = Mᵀ@zu) — what a
LightGCN step issues 2·K times (K fwd + K bwd). HBM floor at yelp2018
scale: padded int8 matrix 31744×38400 ≈ 1.22 GB; one read per fused
application, two for the XLA pair.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from idgrec_tpu.ops import fusedmm

U, I, D = 31_668, 38_048, 64
NNZ = 1_237_259
STEPS = 100

rng = np.random.default_rng(0)
m = np.zeros((U, I), np.int8)
m[rng.integers(0, U, NNZ), rng.integers(0, I, NNZ)] = 1

m8_ti = jnp.asarray(fusedmm.pad_matrix(m, fusedmm.TI))
m8_panel = jnp.asarray(fusedmm.pad_matrix(m, fusedmm.PANEL))
UP, IP = m8_ti.shape
print(f"padded {m8_ti.shape} = {m8_ti.nbytes/1e9:.2f} GB (TI) / "
      f"{m8_panel.nbytes/1e9:.2f} GB (PANEL)", flush=True)

xu0 = jnp.asarray(rng.standard_normal((UP, D)).astype(np.float32))
xi0 = jnp.asarray(rng.standard_normal((IP, D)).astype(np.float32))


def norm(x):
    return x / (jnp.max(jnp.abs(x)) + 1e-6)


def scan_time(name, app_fn, mat, bytes_per_app):
    up, ip = mat.shape

    @jax.jit
    def run(mat, xu, xi):
        def body(carry, _):
            xu, xi = carry
            yu, yi = app_fn(mat, xu, xi)
            return (norm(yu[:up]), norm(yi[:ip])), ()
        (xu, xi), _ = jax.lax.scan(body, (xu, xi), None, length=STEPS)
        return jnp.sum(xu) + jnp.sum(xi)

    xu = jnp.asarray(rng.standard_normal((up, D)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((ip, D)).astype(np.float32))
    float(run(mat, xu, xi))  # compile + run
    t0 = time.perf_counter()
    float(run(mat, xu, xi))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:34s} {dt*1e3:7.3f} ms/app   "
          f"{bytes_per_app/dt/1e9:6.0f} GB/s adj   "
          f"{2*2*UP*IP*D/dt/1e12:5.1f} TFLOP/s", flush=True)
    return dt


def xla_bf16(mat, xu, xi):
    mm = mat.astype(jnp.bfloat16)
    yu = jnp.matmul(mm, xi.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    yi = jnp.matmul(mm.T, xu.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return yu, yi


def xla_int8(mat, xu, xi):
    from idgrec_tpu.ops.propagate import _quantize_cols
    qi, si = _quantize_cols(xi)
    qu, su = _quantize_cols(xu)
    yu = jnp.matmul(mat, qi, preferred_element_type=jnp.int32).astype(jnp.float32) * si
    yi = jnp.matmul(mat.T, qu, preferred_element_type=jnp.int32).astype(jnp.float32) * su
    return yu, yi


def fused_bf16(mat, xu, xi):
    return fusedmm.fused_adj_matmul(mat, xu, xi, False)


def fused_int8(mat, xu, xi):
    from idgrec_tpu.ops.propagate import _quantize_cols
    qi, si = _quantize_cols(xi)
    qu, su = _quantize_cols(xu)
    yu, yi = fusedmm.fused_adj_matmul_int8(mat, qu, qi, False)
    return yu * si, yi * su


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    adj = UP * IP  # int8 bytes, one matrix read
    scan_time("xla bf16 pair (2 reads)", xla_bf16, m8_ti, 2 * adj)
    scan_time("xla int8 pair (2 reads)", xla_int8, m8_ti, 2 * adj)
    scan_time("fused bf16 kernel (1 read)", fused_bf16, m8_ti, adj)
    scan_time("fused int8 single-panel (1 read)", fused_int8, m8_ti, adj)
    scan_time("fused int8 panelized (1 read)", fused_int8, m8_panel,
              m8_panel.nbytes)
