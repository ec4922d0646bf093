"""Round 3: discriminate measurement method vs implementation for the
sparse path. Times BOTH formulations (ops/spmm.spmm and the inline
combined) under BOTH timing disciplines (independent iterations vs
dependent feedback chain)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from idgrec_tpu.compile_cache import enable as _enable_cache

_enable_cache()

import numpy as np
import jax
import jax.numpy as jnp

from idgrec_tpu.data.dataset import make_synthetic_dataset
from idgrec_tpu.data.graph import normalized_adjacency
from idgrec_tpu.ops.spmm import spmm

data = make_synthetic_dataset(31668, 38048, 1237259, 1000, seed=0,
                              name="yelp2018-scale")
g = normalized_adjacency(data, cache=False)
N = data.num_users + data.num_items
D = 64
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)


def timed_indep(name, fn, *args, iters=5):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.sum(out.ravel()[:4]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jnp.sum(out.ravel()[:4]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} indep {dt*1e3:9.2f} ms", flush=True)


def timed_chain(name, fn, x0, *consts, iters=5):
    def step(xc, *cs):
        y = fn(xc, *cs)
        return y / (jnp.max(jnp.abs(y)) + 1e-6)

    f = jax.jit(step)
    y = f(x0, *consts)
    float(jnp.sum(y.ravel()[:4]))
    best = 1e9
    for _ in range(2):
        y = x0
        t0 = time.perf_counter()
        for _ in range(iters):
            y = f(y, *consts)
        float(jnp.sum(y.ravel()[:4]))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:30s} chain {best*1e3:9.2f} ms", flush=True)


def inline_combined(x_, g_):
    gat = jnp.take(x_, g_.cols, axis=0).astype(jnp.float32) * g_.vals[:, None]
    return jax.ops.segment_sum(gat, g_.rows, num_segments=N,
                               indices_are_sorted=True).astype(x_.dtype)


timed_indep("ops.spmm", lambda x_, g_: spmm(g_, x_), x, g)
timed_indep("inline combined", inline_combined, x, g)
timed_chain("ops.spmm", lambda x_, g_: spmm(g_, x_), x, g)
timed_chain("inline combined", inline_combined, x, g)
