"""Tile sweep for the shipping int4/int8 T-kernels at SHIPPING padding.

The committed cost table (docs/evidence/step_cost_table.json) measured
the kernels at PANEL padding (31744 x 40960); the shipping int4 build
pads rows to 2048 and items to PACK_TILE (32768 x 38912  — 5% fewer
columns). This script re-times the dual T-kernels at that exact shape
across row-tile choices, plus the 3-layer chain fwd / fwd+bwd through
the real FusedSquareAdj, so tile defaults are chosen on the shipping
shape rather than the profiling one.

Physics at (32768, 38912), d=64: matrix read 637.6 MB (int4 packed)
-> 0.78 ms at 819 GB/s HBM peak; MXU 2*2*U*I*d = 326 GOP -> 0.83 ms
at 394 int8-TOP/s. Balanced floor ~0.85 ms/sweep.

Usage: python scripts/tune_tkernel_tiles.py [--quant int4] [--tus 2048,4096,8192,16384]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from idgrec_tpu.compile_cache import enable as _enable_cache

_enable_cache()

from idgrec_tpu.ops import fusedmm, propagate

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from profile_step import chain_time  # noqa: E402  (scan-chained timer)

U, I, D = 31_668, 38_048, 64
NNZ = 1_237_259


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="int4", choices=["int4", "int8"])
    ap.add_argument("--tus", default="2048,4096,8192,16384")
    ap.add_argument("--chain", action="store_true", help="also time the chain")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    m = np.zeros((U, I), np.int8)
    m[rng.integers(0, U, NNZ), rng.integers(0, I, NNZ)] = 1

    # shipping int4 padding: rows to 2048, items to PACK_TILE
    row_mult = 2048 if args.quant == "int4" else fusedmm.TU
    col_mult = fusedmm.PACK_TILE if args.quant == "int4" else fusedmm.TI
    m_np = fusedmm.pad_matrix(m, col_mult, row_multiple=row_mult)
    UP, IP = m_np.shape
    if args.quant == "int4":
        mat = jnp.asarray(fusedmm.pack_nibbles(m_np))
    else:
        mat = jnp.asarray(m_np)
    print(f"shipping padding {m_np.shape}: packed {mat.nbytes/1e9:.3f} GB",
          flush=True)
    sweep_bytes = mat.nbytes
    mxu_macs = 2 * UP * IP * D

    quT0 = jnp.asarray(rng.standard_normal((D, UP)), jnp.float32)
    qiT0 = jnp.asarray(rng.standard_normal((D, IP)), jnp.float32)

    fn_name = ("fused_adj_matmul_int4_t" if args.quant == "int4"
               else "fused_adj_matmul_int8_t")
    kernel_fn = getattr(fusedmm, fn_name)

    orig_pick = fusedmm.pick_row_tile
    results = {}
    for tu in [int(t) for t in args.tus.split(",")]:
        if UP % tu != 0:
            print(f"tu={tu}: skipped (no divide)", flush=True)
            continue

        def pick(u_pad, default=fusedmm.TU, _tu=tu):
            return _tu if u_pad % _tu == 0 else orig_pick(u_pad, default)

        fusedmm.pick_row_tile = pick

        def run(zu, zi, mat_):
            qu = (zu * 127).astype(jnp.int8)
            qi = (zi * 127).astype(jnp.int8)
            return kernel_fn(mat_, qu, qi)

        dt = chain_time(f"{args.quant}t tu={tu}", run, quT0, qiT0,
                        statics=(mat,), flops=2 * mxu_macs,
                        bytes_=sweep_bytes)
        results[f"tu={tu}"] = round(dt * 1e3, 3)
    fusedmm.pick_row_tile = orig_pick

    if args.chain:
        # the real adjacency + chain at shipping padding
        from idgrec_tpu.data.dataset import make_synthetic_dataset

        data = make_synthetic_dataset(U, I, NNZ, 1000, seed=0,
                                      name="yelp2018-scale")
        adj = propagate.build_adjacency(data, "sym", "fused",
                                        compute_dtype=args.quant,
                                        emb_size=D)
        print(f"adj padded_shape={adj.padded_shape}", flush=True)
        emb0 = jnp.asarray(rng.standard_normal((U + I, D)), jnp.float32)

        def chain_fwd(x, adj_):
            return (propagate.fused_chain_t(adj_, x, 3),)

        dt = chain_time("chain.fwd", chain_fwd, emb0, statics=(adj,),
                        flops=3 * 2 * mxu_macs, bytes_=3 * sweep_bytes)
        results["chain.fwd"] = round(dt * 1e3, 3)

        def chain_bwd(x, adj_):
            return (jax.grad(
                lambda e: jnp.sum(propagate.fused_chain_t(adj_, e, 3)))(x),)

        dt = chain_time("chain.fwd+bwd", chain_bwd, emb0, statics=(adj,),
                        flops=6 * 2 * mxu_macs, bytes_=6 * sweep_bytes)
        results["chain.fwd+bwd"] = round(dt * 1e3, 3)

    print(results)


if __name__ == "__main__":
    main()
