"""On-chip microbench: resident whole-chain kernel vs per-sweep chain.

Times, at exact bench scale (synthetic yelp2018, LightGCN K=3 d=64
mean-combine, shipping int4 padding 32768 x 38912):

  * fused_chain_t forward / forward+backward (per-sweep kernels +
    XLA inter-sweep elementwise — the round-4 shipping path)
  * fused_chain_resident forward / forward+backward (ops/chainmm.py)

and cross-checks the on-chip numerics (quantization-noise tolerance —
see chainmm's module docstring). Timing uses profile_step.chain_time's
feedback-scan + scalar-sync discipline (the axon tunnel's
block_until_ready does not wait for remote execution).

Usage: python scripts/microbench_chain_resident.py [--quant int4|int8]
       [--steps 50] [--out docs/evidence/chain_resident.json]
"""

from __future__ import annotations

import argparse
import json
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="int4", choices=["int4", "int8"])
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-chain-t", action="store_true",
                    help="only time the resident kernel (reuse committed "
                         "chain_t numbers)")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_step import chain_time

    from idgrec_tpu.data.dataset import make_synthetic_dataset
    from idgrec_tpu.ops import chainmm
    from idgrec_tpu.ops import propagate as prop

    print(f"devices: {jax.devices()}", flush=True)
    data = make_synthetic_dataset(31_668, 38_048, 1_237_259, 10_000, seed=0)
    t0 = time.time()
    adj = prop.build_adjacency(data, "sym", "fused", compute_dtype=args.quant,
                               emb_size=64)
    adj = jax.device_put(adj)
    print(f"adjacency built+uploaded in {time.time()-t0:.1f}s "
          f"padded={adj.padded_shape}", flush=True)
    assert chainmm.supports_chain_resident(adj, 64, args.layers, "mean", None)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(data.num_nodes, 64)).astype(np.float32) * 0.1)

    K = args.layers
    res: dict[str, float] = {}

    def fwd_res(e, adj):
        return (chainmm.fused_chain_resident(adj, e, K, True, "mean"),)

    def fwd_t(e, adj):
        return (prop.fused_chain_t(adj, e, K, True, "mean"),)

    def grad_res(e, adj):
        return (jax.grad(lambda e: jnp.sum(
            chainmm.fused_chain_resident(adj, e, K, True, "mean") ** 2))(e),)

    def grad_t(e, adj):
        return (jax.grad(lambda e: jnp.sum(
            prop.fused_chain_t(adj, e, K, True, "mean") ** 2))(e),)

    # numerics cross-check first (also forces the first compile of the
    # novel Mosaic program outside the timing loop)
    t0 = time.time()
    out_res = np.asarray(fwd_res(x, adj)[0])
    print(f"resident fwd compile+run {time.time()-t0:.1f}s", flush=True)
    if not args.skip_chain_t:
        out_t = np.asarray(fwd_t(x, adj)[0])
        denom = np.linalg.norm(out_t)
        rel = float(np.linalg.norm(out_res - out_t) / denom) if denom else 0.0
        res["fwd_rel_err_vs_chain_t"] = rel
        print(f"on-chip fwd relative error vs chain_t: {rel:.2e}", flush=True)
        assert rel < 1e-2, "resident chain diverges beyond quantization noise"

    res[f"resident.fwd.{args.quant}"] = chain_time(
        f"resident fwd {args.quant}", fwd_res, x,
        steps=args.steps, statics=(adj,))
    res[f"resident.grad.{args.quant}"] = chain_time(
        f"resident fwd+bwd {args.quant}", grad_res, x,
        steps=args.steps, statics=(adj,))
    if not args.skip_chain_t:
        res[f"chain_t.fwd.{args.quant}"] = chain_time(
            f"chain_t fwd {args.quant}", fwd_t, x,
            steps=args.steps, statics=(adj,))
        res[f"chain_t.grad.{args.quant}"] = chain_time(
            f"chain_t fwd+bwd {args.quant}", grad_t, x,
            steps=args.steps, statics=(adj,))

    out = {
        "script": "scripts/microbench_chain_resident.py",
        "scale": {"users": data.num_users, "items": data.num_items,
                  "d": 64, "layers": K, "padded": list(adj.padded_shape)},
        "device": str(jax.devices()[0].device_kind),
        "units": "ms per chain (fwd = K sweeps; grad = 2K sweeps + loss)",
        "table": {k: round(v * 1e3, 3) for k, v in res.items()
                  if not k.endswith("err_vs_chain_t")},
        "fwd_rel_err_vs_chain_t": res.get("fwd_rel_err_vs_chain_t"),
    }
    print(json.dumps(out["table"], indent=1))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
