"""Decompose the XLA sparse-path cost: gather vs segment-sum, and probe
Mosaic lane-gather support (jnp.take along the lane axis inside a
Pallas kernel). Informs whether a Pallas sorted-COO kernel can beat the
measured 1134 ms/application XLA path (docs/evidence/
spmm_gather_roofline.json)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from idgrec_tpu.compile_cache import enable as _enable_cache

_enable_cache()

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, NNZ = 69_716, 64, 2_475_008
rng = np.random.default_rng(0)
rows = np.sort(rng.integers(0, N, NNZ)).astype(np.int32)
cols = rng.integers(0, N, NNZ).astype(np.int32)
vals = rng.standard_normal(NNZ).astype(np.float32)
x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
w = jnp.asarray(rng.standard_normal((NNZ, D)), jnp.float32)
rows_d = jnp.asarray(rows)
cols_d = jnp.asarray(cols)
vals_d = jnp.asarray(vals)


def timed(name, fn, *args, iters=5):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.sum(out.ravel()[:4]))
    t0 = time.perf_counter()
    o = args[0]
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(out.ravel()[:4]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:9.2f} ms", flush=True)
    return dt


# 1. sorted segment-sum alone on a pre-gathered [NNZ, D] array
timed("segment_sum(sorted)", lambda w_, r_: jax.ops.segment_sum(
    w_, r_, num_segments=N, indices_are_sorted=True), w, rows_d)

# 2. the gather alone
timed("take(x, cols, axis=0)", lambda x_, c_: jnp.take(x_, c_, axis=0), x, cols_d)

# 3. gather via one-hot... skipped (known MXU cost)

# 4. Mosaic lane gather probe: xT [D, N] VMEM-resident, take along axis 1
def _lane_gather_kernel(idx_ref, xT_ref, out_ref):
    idx = idx_ref[...]          # [B] int32 block of column indices
    out_ref[...] = jnp.take(xT_ref[...], idx, axis=1)


def lane_gather(xT, idx, block=2048):
    B = idx.shape[0]
    return pl.pallas_call(
        _lane_gather_kernel,
        grid=(B // block,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(xT.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((xT.shape[0], block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xT.shape[0], B), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=xT.nbytes + 8 * 1024 * 1024,
        ),
        interpret=False,
    )(idx, xT)


xT = x.T  # [D, N]
try:
    small = jnp.asarray(cols[:8192])
    out = jax.jit(lane_gather)(xT, small)
    ref = xT[:, np.asarray(small)]
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"lane-gather pallas: OK, max err {err}", flush=True)
    timed("lane_gather(8k idx)", lane_gather, xT, small)
    full = jnp.asarray(cols[: (NNZ // 2048) * 2048])
    timed("lane_gather(2.47M idx)", lane_gather, xT, full, iters=3)
except Exception as e:
    print(f"lane-gather pallas FAILED: {type(e).__name__}: {e}", flush=True)
