"""Round 2 of the sparse-path decomposition (see probe_gather_parts.py):

(a) the COMBINED gather*vals->segment_sum in one jit (the shipping
    ops/spmm.py formulation) vs the same ops staged through a
    materialized intermediate — the parts measured 49 ms total while
    the fused program measured ~1134 ms (spmm_gather_roofline.json);
(b) Mosaic lane gather retry with take_along_axis semantics
    (indices broadcast over the sublane dim).
"""

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
rows_d = jnp.asarray(rows)
cols_d = jnp.asarray(cols)
vals_d = jnp.asarray(vals)


def timed(name, fn, *args, iters=5):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.sum(out.ravel()[:4]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(out.ravel()[:4]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.2f} ms", flush=True)
    return dt


# (a1) combined, one jit — the ops/spmm.py formulation
def combined(x_, c_, r_, v_):
    g = jnp.take(x_, c_, axis=0) * v_[:, None]
    return jax.ops.segment_sum(g, r_, num_segments=N, indices_are_sorted=True)

timed("combined gather*v->segsum", combined, x, cols_d, rows_d, vals_d)


# (a2) staged via optimization_barrier (forces materialization of the
# gathered intermediate inside ONE jit)
def staged(x_, c_, r_, v_):
    g = jnp.take(x_, c_, axis=0) * v_[:, None]
    g = jax.lax.optimization_barrier(g)
    return jax.ops.segment_sum(g, r_, num_segments=N, indices_are_sorted=True)

timed("staged (opt_barrier)", staged, x, cols_d, rows_d, vals_d)


# (a3) combined without the val multiply (isolate the fusion culprit)
def no_val(x_, c_, r_):
    g = jnp.take(x_, c_, axis=0)
    return jax.ops.segment_sum(g, r_, num_segments=N, indices_are_sorted=True)

timed("combined no-val", no_val, x, cols_d, rows_d)


# (b) Mosaic lane gather, take_along_axis semantics
def _lg_kernel(idx_ref, xT_ref, out_ref):
    d = xT_ref.shape[0]
    idx = jnp.broadcast_to(idx_ref[...][None, :], (d, idx_ref.shape[0]))
    out_ref[...] = jnp.take_along_axis(xT_ref[...], idx, axis=1)


def lane_gather(xT, idx, block=2048):
    B = idx.shape[0]
    return pl.pallas_call(
        _lg_kernel,
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
            vmem_limit_bytes=xT.nbytes + 16 * 1024 * 1024,
        ),
    )(idx, xT)


xT = jnp.asarray(np.ascontiguousarray(np.asarray(x).T))  # [D, N]
try:
    small = jnp.asarray(cols[:8192])
    out = jax.jit(lane_gather)(xT, small)
    ref = np.asarray(xT)[:, np.asarray(small)]
    err = float(jnp.max(jnp.abs(out - jnp.asarray(ref))))
    print(f"lane-gather (take_along_axis): OK, max err {err}", flush=True)
    timed("lane_gather(8k idx)", lane_gather, xT, small)
    full = jnp.asarray(cols[: (NNZ // 2048) * 2048])
    timed("lane_gather(2.47M idx)", lane_gather, xT, full, iters=3)
except Exception as e:
    print(f"lane-gather FAILED: {type(e).__name__}: {e}", flush=True)
