"""Attribute the resident chain kernel's per-sweep cost on-chip.

Times the forward mega-kernel at bench scale under chainmm's
debug_level knob (numerically wrong at levels > 0 — timing only):

  level 2: pure dot core (grid + scratch-resident activations)
  level 1: + lazy per-block round()s
  level 0: + completion chunks (dequant/combine/pre-scale/amax) = full

The deltas attribute the ~0.1 ms/sweep gap between the resident chain
(docs/evidence/chain_resident.json) and the standalone T-sweep
(0.94 ms, step_cost_table.json) to either the epilogue VPU work or
the grid/scratch structure itself.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from idgrec_tpu.compile_cache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_step import chain_time

    from idgrec_tpu.data.dataset import make_synthetic_dataset
    from idgrec_tpu.ops import chainmm
    from idgrec_tpu.ops import propagate as prop

    print(f"devices: {jax.devices()}", flush=True)
    data = make_synthetic_dataset(31_668, 38_048, 1_237_259, 10_000, seed=0)
    adj = jax.device_put(prop.build_adjacency(
        data, "sym", "fused", compute_dtype="int4", emb_size=64))
    u_pad, i_pad = adj.padded_shape
    rng = np.random.default_rng(7)
    xT = jnp.asarray(rng.normal(size=(64, data.num_nodes)).astype(np.float32) * 0.1)
    xu = jnp.pad(xT[:, :data.num_users], ((0, 0), (0, u_pad - data.num_users)))
    xi = jnp.pad(xT[:, data.num_users:], ((0, 0), (0, i_pad - data.num_items)))
    ru, ri, lu, li = chainmm._prep_vectors(adj, u_pad, i_pad)
    q0u, s0u = chainmm._quantize_rows(ru * xu)
    q0i, s0i = chainmm._quantize_rows(ri * xi)

    def run(level):
        def fn(xu_c, q0u, q0i, m, xi):
            # the f32 cinit is the scan carry -> iterations serialize
            cu, ci = chainmm._chain_call(
                m, u_pad, i_pad, 3, "int4", "fwd", True,
                q0u, q0i, s0u, s0i, ru, ri, lu, li, xu_c, xi,
                adj.interpret, debug_level=level)
            return (cu,)
        return fn

    for level in (2, 1, 0):
        fn = run(level)
        chain_time(f"fwd level={level}", fn, xu,
                   steps=50, statics=(q0u, q0i, adj.m8, xi))


if __name__ == "__main__":
    main()


def probe_k1_and_tiles() -> None:
    """Follow-up: is the dot-core gap per-step overhead (k-invariant)
    or k-dimension related? K=1 runs the same 152-step grid as the
    standalone sweep."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_step import chain_time

    from idgrec_tpu.data.dataset import make_synthetic_dataset
    from idgrec_tpu.ops import chainmm
    from idgrec_tpu.ops import propagate as prop

    data = make_synthetic_dataset(31_668, 38_048, 1_237_259, 10_000, seed=0)
    adj = jax.device_put(prop.build_adjacency(
        data, "sym", "fused", compute_dtype="int4", emb_size=64))
    u_pad, i_pad = adj.padded_shape
    rng = np.random.default_rng(7)
    xT = jnp.asarray(rng.normal(size=(64, data.num_nodes)).astype(np.float32) * 0.1)
    xu = jnp.pad(xT[:, :data.num_users], ((0, 0), (0, u_pad - data.num_users)))
    xi = jnp.pad(xT[:, data.num_users:], ((0, 0), (0, i_pad - data.num_items)))
    ru, ri, lu, li = chainmm._prep_vectors(adj, u_pad, i_pad)
    q0u, s0u = chainmm._quantize_rows(ru * xu)
    q0i, s0i = chainmm._quantize_rows(ri * xi)

    def mk(K, level):
        def fn(xu_c, q0u, q0i, m, xi):
            cu, ci = chainmm._chain_call(
                m, u_pad, i_pad, K, "int4", "fwd", True,
                q0u, q0i, s0u, s0i, ru, ri, lu, li, xu_c, xi,
                adj.interpret, debug_level=level)
            return (cu,)
        return fn

    for K in (1, 3):
        for level in (2, 0):
            chain_time(f"K={K} level={level}", mk(K, level), xu,
                       steps=50, statics=(q0u, q0i, adj.m8, xi))


if __name__ == "__main__" and os.environ.get("PROBE_K1"):
    probe_k1_and_tiles()
