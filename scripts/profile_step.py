"""Per-component cost table for the bench LightGCN step (real TPU).

VERDICT r2 item 1: the int4 step measures 16.9 ms vs a ~5.4 ms
adjacency-read floor; this script decomposes the step so the gap is
attributed, not guessed. Everything is scan-chained (output feeds the
next input) so async dispatch cannot hide device time.

Components measured at yelp2018 scale (U=31668, I=38048, d=64, K=3):
  kernel.int8/int4   raw fused dual kernels, pre-quantized inputs
  kernel.int8t/int4t the shipping transposed-activation kernels
  quantize           per-column quantization of (zu, zi) alone
  app.int8/int4      full quantized application (scales+pad+kernel)
  propagate          3-layer LightGCN forward (per-app vs chain vs +bwd)
  step               full train step (fwd+bwd+Adam) via the EpochRunner

Floors (docs/SCALING.md, 670 GB/s HBM, 197 TOPS int8 MXU at 50%
utilization for d=64): int8 app max(1.94 HBM, 1.69 MXU) ≈ 1.9 ms;
int4 app max(0.97, 1.69) ≈ 1.7 ms.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from idgrec_tpu.compile_cache import enable as _enable_cache

_enable_cache()

from idgrec_tpu.ops import fusedmm
from idgrec_tpu.ops.fusedmm import TI, pick_row_tile
from idgrec_tpu.ops.propagate import _quantize_cols

U, I, D = 31_668, 38_048, 64
NNZ = 1_237_259
STEPS = 100


def chain_time(name, fn, *args, steps=STEPS, flops=None, bytes_=None,
               statics=()):
    """Run fn in a feedback scan; report ms/iteration.

    `statics`: large device arrays fn needs (adjacency matrices etc.),
    passed as jit ARGUMENTS — a closure would embed them as program
    constants and overflow the axon remote-compile request body.

    Sync discipline: the axon tunnel's block_until_ready does not
    reliably wait for remote execution, so the run returns a SCALAR
    derived from every carry and the timer waits on its host fetch.
    The measured wall time includes one tunnel round trip (~31 ms),
    subtracted via the RTT estimate below.
    """
    @jax.jit
    def run(statics, *a):
        def body(carry, _):
            out = fn(*carry, *statics)
            # feed outputs back (normalized) so iterations serialize
            new = tuple(
                (o / (jnp.max(jnp.abs(o)) + 1e-6)).astype(c.dtype)
                if o.shape == c.shape and jnp.issubdtype(c.dtype, jnp.floating)
                else c
                for o, c in zip(out + a[len(out):], a)
            )
            return new, ()
        final, _ = jax.lax.scan(body, a, None, length=steps)
        return sum(jnp.asarray(x.ravel()[0], jnp.float32) for x in final)

    t0 = time.time()
    out = float(run(statics, *args))
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        out = float(run(statics, *args))
        best = min(best, time.perf_counter() - t0)
    # clamp: a fully-fused component can measure below the RTT estimate
    dt = max((best - 0.031) / steps, 1e-6)
    extra = ""
    if bytes_:
        extra += f"  {bytes_/dt/1e9:7.0f} GB/s"
    if flops:
        extra += f"  {flops/dt/1e12:6.1f} TOP/s"
    print(f"{name:18s} {dt*1e3:8.3f} ms{extra}   (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="all",
                    help="comma list: kernels,quant,app,propagate,step")
    ap.add_argument("--out", default=None,
                    help="write the cost table as JSON to this path "
                         "(e.g. docs/evidence/step_cost_table.json)")
    args = ap.parse_args()
    parts = set(args.parts.split(",")) if args.parts != "all" else {
        "kernels", "quant", "app", "propagate", "step"}

    rng = np.random.default_rng(0)
    m = np.zeros((U, I), np.int8)
    m[rng.integers(0, U, NNZ), rng.integers(0, I, NNZ)] = 1

    m8_np = fusedmm.pad_matrix(m, fusedmm.PANEL)
    UP, IP = m8_np.shape
    m8 = jnp.asarray(m8_np)
    m4 = jnp.asarray(fusedmm.pack_nibbles(m8_np))
    print(f"padded {m8_np.shape}: int8 {m8.nbytes/1e9:.2f} GB, "
          f"int4 {m4.nbytes/1e9:.2f} GB", flush=True)
    mxu_macs = 2 * UP * IP * D  # both directions

    qu0 = jnp.asarray(rng.integers(-127, 128, (UP, D)), jnp.int8)
    qi0 = jnp.asarray(rng.integers(-127, 128, (IP, D)), jnp.int8)
    zu0 = jnp.asarray(rng.standard_normal((UP, D)), jnp.float32)
    zi0 = jnp.asarray(rng.standard_normal((IP, D)), jnp.float32)

    results = {}
    if "kernels" in parts:
        # raw kernels, fixed int8 inputs (no feedback possible into int8
        # without quantization — chain through dummy f32 carries)
        # carries stay PADDED ([U_pad, d] / [I_pad, d]) — the kernels'
        # BlockSpecs index the full padded row range; unpadded inputs
        # read out of bounds and fault the TPU worker
        def k8(zu, zi, mat):
            qu = (zu * 127).astype(jnp.int8)
            qi = (zi * 127).astype(jnp.int8)
            return fusedmm.fused_adj_matmul_int8(mat, qu, qi)

        def k4(zu, zi, mat):
            qu = (zu * 127).astype(jnp.int8)
            qi = (zi * 127).astype(jnp.int8)
            return fusedmm.fused_adj_matmul_int4(mat, qu, qi)

        # the shipping transposed-activation ("T") kernels — what the
        # bench step actually runs via fused_chain_t
        def k8t(zu, zi, mat):
            quT = (zu * 127).astype(jnp.int8).T
            qiT = (zi * 127).astype(jnp.int8).T
            yuT, yiT = fusedmm.fused_adj_matmul_int8_t(mat, quT, qiT)
            return yuT.T, yiT.T

        def k4t(zu, zi, mat):
            quT = (zu * 127).astype(jnp.int8).T
            qiT = (zi * 127).astype(jnp.int8).T
            yuT, yiT = fusedmm.fused_adj_matmul_int4_t(mat, quT, qiT)
            return yuT.T, yiT.T

        # correctness first: int4 == int8 == T-kernels, bit-exact
        y8 = fusedmm.fused_adj_matmul_int8(m8, qu0, qi0)
        y4 = fusedmm.fused_adj_matmul_int4(m4, qu0, qi0)
        y4t = [a.T for a in fusedmm.fused_adj_matmul_int4_t(m4, qu0.T, qi0.T)]
        d48 = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(y4, y8))
        d4t = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(y4t, y8))
        print(f"exactness: int4-int8 {d48}, int4t-int8 {d4t}", flush=True)
        assert d48 == 0.0 and d4t == 0.0

        zu_t = zu0 * 0.1
        zi_t = zi0 * 0.1
        results["kernel.int8"] = chain_time(
            "kernel.int8", k8, zu_t, zi_t, bytes_=m8.nbytes, flops=2 * mxu_macs,
            statics=(m8,))
        results["kernel.int4"] = chain_time(
            "kernel.int4", k4, zu_t, zi_t, bytes_=m4.nbytes, flops=2 * mxu_macs,
            statics=(m4,))
        results["kernel.int8t"] = chain_time(
            "kernel.int8t", k8t, zu_t, zi_t, bytes_=m8.nbytes, flops=2 * mxu_macs,
            statics=(m8,))
        results["kernel.int4t"] = chain_time(
            "kernel.int4t", k4t, zu_t, zi_t, bytes_=m4.nbytes, flops=2 * mxu_macs,
            statics=(m4,))

    if "quant" in parts:
        def qonly(zu, zi):
            qu, su = _quantize_cols(zu)
            qi, si = _quantize_cols(zi)
            return (qu.astype(jnp.float32) * su), (qi.astype(jnp.float32) * si)

        results["quantize+deq"] = chain_time(
            "quantize+deq", qonly, zu0, zi0,
            bytes_=(zu0.nbytes + zi0.nbytes) * 3)

    if "app" in parts:
        from idgrec_tpu.data.dataset import make_synthetic_dataset
        from idgrec_tpu.ops.propagate import build_adjacency

        data = make_synthetic_dataset(U, I, NNZ, 1000, seed=0, name="prof")
        for mode in ("int8", "int4"):
            adj = build_adjacency(data, "sym", "fused", compute_dtype=mode,
                                  emb_size=D)
            x0 = jnp.asarray(
                rng.standard_normal((U + I, D)) * 0.1, jnp.float32)

            def app(x, _adj=adj):
                return (_adj.matmul(x),)

            leaves, treedef = jax.tree.flatten(adj)

            def app2(x, *leaves, _td=treedef):
                return (jax.tree.unflatten(_td, leaves).matmul(x),)

            results[f"app.{mode}"] = chain_time(
                f"app.{mode}", app2, x0, statics=tuple(leaves))
            del adj
        if "propagate" in parts:
            from idgrec_tpu.ops.propagate import fused_chain_t

            adj = build_adjacency(data, "sym", "fused", compute_dtype="int4",
                                  emb_size=D)
            leaves, treedef = jax.tree.flatten(adj)

            def prop(x, *leaves, _td=treedef):
                _adj = jax.tree.unflatten(_td, leaves)
                outs = [x]
                h = x
                for _ in range(3):
                    h = _adj.matmul(h)
                    outs.append(h)
                return (sum(outs) / 4.0,)

            results["prop3.perapp"] = chain_time(
                "prop3.perapp", prop, x0, statics=tuple(leaves))

            def propc(x, *leaves, _td=treedef):
                _adj = jax.tree.unflatten(_td, leaves)
                return (fused_chain_t(_adj, x, 3, True, "mean"),)

            results["prop3.chain"] = chain_time(
                "prop3.chain", propc, x0, statics=tuple(leaves))

            def propg(x, *leaves, _td=treedef):
                _adj = jax.tree.unflatten(_td, leaves)
                g = jax.grad(lambda v: jnp.sum(
                    fused_chain_t(_adj, v, 3, True, "mean") ** 2))(x)
                return (g,)

            results["prop3.chain+bwd"] = chain_time(
                "prop3.chain+bwd", propg, x0, statics=tuple(leaves))
            del adj

    if "step" in parts:
        # full train step through the real engine (64-step segment)
        from idgrec_tpu.config import Config
        from idgrec_tpu.data.dataset import make_synthetic_dataset
        from idgrec_tpu.engine.sampler import NegativeSampler
        from idgrec_tpu.engine.trainer import EpochRunner
        from idgrec_tpu.models import get_model

        data = make_synthetic_dataset(U, I, NNZ, 1000, seed=0, name="prof")
        for mode in ("int8", "int4"):
            cfg = Config({
                "dataset": data.name, "top_K": "[10, 20]",
                "embedding_size": str(D), "batch_size": "2048",
                "test_batch_size": "2048", "learn_rate": "0.001",
                "reg_lambda": "0.0001", "GCN_layer": "3",
                "propagation_backend": "fused", "compute_dtype": mode,
            })
            model = get_model("LightGCN")(cfg, data)
            model.device_put()
            k = jax.random.PRNGKey(0)
            params = model.init_params(k)
            state = model.init_state(k)
            runner = EpochRunner(model, 0.001, 2048, 2048 * 64)
            opt_state = runner.init_opt_state(params)
            sampler = NegativeSampler(data)
            users, pos, neg = sampler.sample_epoch(k)
            users, pos, neg = users[:2048 * 64], pos[:2048 * 64], neg[:2048 * 64]
            # run_epoch DONATES params/opt_state/state — rebind them
            # from the outputs or the second call feeds dead buffers
            t0 = time.time()
            params, opt_state, state, terms = runner.run_epoch(
                params, opt_state, state, (), users, pos, neg, k, 0)
            _ = np.asarray(terms)  # host fetch = real sync
            print(f"step.{mode}: compile {time.time()-t0:.0f}s", flush=True)
            t0 = time.perf_counter()
            params, opt_state, state, terms = runner.run_epoch(
                params, opt_state, state, (), users, pos, neg, k, 0)
            _ = np.asarray(terms)
            dt = (time.perf_counter() - t0 - 0.031) / 64
            print(f"{'step.' + mode:18s} {dt*1e3:8.3f} ms/step", flush=True)
            results[f"step.{mode}"] = dt
            del model, params, state, opt_state, runner

    table = {k: round(v * 1e3, 3) for k, v in results.items()}
    print(json.dumps(table))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({
                "script": "scripts/profile_step.py",
                "scale": {"users": U, "items": I, "d": D, "nnz": NNZ},
                "device": str(jax.devices()[0]),
                "units": "ms (per iteration / per step)",
                "table": table,
            }, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
