"""Roofline microbench for the sparse (gather) propagation backend.

VERDICT r2 asked for a Pallas sorted-COO segment-sum kernel with >= 3x
over the XLA gather+segment-sum path (ops/spmm.py). Whether that is
*possible* on v5e depends on where the XLA path sits relative to the
hardware bounds for the same access pattern:

* sequential bound — total bytes moved (random row reads of x +
  sequential edge arrays + segment-sum output) at full HBM bandwidth.
  Only reachable if random row access were free.
* descriptor bound — per-row DMA issue costs ~1 us on v5e (measured in
  ops/gathermm.py: per-row gathers cap at ~12-38 GB/s). A Pallas
  kernel that fetches x rows edge-by-edge or row-by-row pays this.

This script measures the XLA path (fwd and fwd+bwd) at yelp2018 scale
on the real chip, derives its effective random-row bandwidth, and
prints both bounds. If XLA already sits at/above the descriptor bound,
a Pallas kernel built from per-row DMAs cannot deliver 3x — the win
would have to come from a fundamentally different formulation (the
dense int8/int4 factorization this repo uses in-budget, or lane-wise
tpu.dynamic_gather tiling; see docs/SCALING.md "Sparse backend
roofline").

Usage: python scripts/microbench_spmm_gather.py [--d 64] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default=None,
                    help="also write the JSON to this path")
    args = ap.parse_args()

    from idgrec_tpu.compile_cache import enable as _enable_cache

    _enable_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from idgrec_tpu.data.dataset import make_synthetic_dataset
    from idgrec_tpu.data.graph import normalized_adjacency
    from idgrec_tpu.ops.spmm import spmm
    from idgrec_tpu.ops.propagate import build_adjacency

    data = make_synthetic_dataset(31668, 38048, 1237259, 1000, seed=0,
                                  name="yelp2018-scale")
    g = normalized_adjacency(data, cache=False)  # [U+I, U+I] sym COO
    # SparseGraph holds HOST numpy arrays (training device_puts them via
    # model.device_put()); without this, every timed call re-uploads
    # ~30 MB of edge arrays through the axon tunnel (~0.9 s/call — the
    # first committed roofline measured exactly that artifact)
    g = jax.device_put(g)
    n = data.num_users + data.num_items
    d = args.d
    x = jnp.asarray(np.random.default_rng(0).normal(size=(n, d)),
                    jnp.float32)
    nnz = int(g.rows.shape[0])

    # DEPENDENT-chain feedback timing with scalar-fetch sync: the axon
    # tunnel's block_until_ready does not reliably wait for remote
    # execution, and independent per-iteration dispatches can overlap.
    # Each iteration feeds its (normalized) output back as the next
    # input, so the final scalar fetch transitively waits on every
    # iteration. A Python loop of jitted calls (not a device-side
    # lax.scan) keeps the compiled program small — the scan-wrapped
    # variant compiles for tens of minutes remotely at this nnz.
    def timed_chain(name, step_fn, x0, *consts):
        jitted = jax.jit(step_fn)
        y = jitted(x0, *consts)  # compile + first run
        float(jnp.sum(y.ravel()[:1]))
        best = 1e9
        for _ in range(2):
            y = x0
            t0 = time.perf_counter()
            for _ in range(args.iters):
                y = jitted(y, *consts)
            float(jnp.sum(y.ravel()[:1]))  # sync on the dependent chain
            best = min(best, (time.perf_counter() - t0) / args.iters)
        print(f"{name:14s} {best*1e3:8.3f} ms", flush=True)
        return best

    def fwd_step(xc, g_):
        y = spmm(g_, xc)
        return y / (jnp.max(jnp.abs(y)) + 1e-6)

    fwd_s = timed_chain("spmm.fwd", fwd_step, x, g)

    def fwdbwd_step(xc, g_):
        y = jax.grad(lambda e: jnp.sum(spmm(g_, e) ** 2))(xc)
        return y / (jnp.max(jnp.abs(y)) + 1e-6)

    fwdbwd_s = timed_chain("spmm.fwd+bwd", fwdbwd_step, x, g)

    # dense int8 fused application for contrast (same logical op)
    adj = build_adjacency(data, "sym", "fused", compute_dtype="int8",
                          emb_size=d)

    def dense_step(xc, adj_):
        y = adj_.matmul(xc)
        return y / (jnp.max(jnp.abs(y)) + 1e-6)

    dense_s = timed_chain("dense.int8", dense_step, x, adj)
    y = jax.jit(lambda xc, g_: spmm(g_, xc))(x, g)
    yd = jax.jit(lambda xc, adj_: adj_.matmul(xc))(x, adj)

    # byte accounting for ONE forward application:
    #  random row reads of x: nnz * d * 4 B
    #  edge arrays (rows/cols/vals), sequential: nnz * 12 B
    #  output write: n * d * 4 B
    random_bytes = nnz * d * 4
    seq_bytes = nnz * 12 + n * d * 4
    hbm_gbps = 670.0  # measured effective (docs/SCALING.md)
    seq_bound_s = (random_bytes + seq_bytes) / (hbm_gbps * 1e9)
    # descriptor bound: one DMA per edge row fetch at ~1 us issue,
    # 8 parallel queues best case (gathermm measured 12-38 GB/s for
    # 256 B rows => 21-148 ns/row effective; take the measured best)
    desc_bound_s = random_bytes / (38e9)
    eff_random_gbps = random_bytes / fwd_s / 1e9

    out = {
        "platform": jax.default_backend(),
        "nnz": nnz, "n": n, "d": d,
        "xla_fwd_ms": round(fwd_s * 1e3, 3),
        "xla_fwdbwd_ms": round(fwdbwd_s * 1e3, 3),
        "dense_int8_fwd_ms": round(dense_s * 1e3, 3),
        "seq_bound_ms": round(seq_bound_s * 1e3, 3),
        "descriptor_bound_ms": round(desc_bound_s * 1e3, 3),
        "xla_effective_random_gbps": round(eff_random_gbps, 1),
        "xla_vs_descriptor_bound": round(desc_bound_s / fwd_s, 2),
        "max_err_vs_dense": float(jnp.max(jnp.abs(y - yd))),
    }
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
