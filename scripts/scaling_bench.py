"""Multi-chip scaling harness: measured where possible, analytic where not.

One real chip is attached in this environment, so this script does two
things (BASELINE.md north-star: pairs/s + propagation GFLOP/s at
1 chip / 1 host / N hosts):

1. **Virtual-mesh execution check** — runs the REAL sharded training
   step (EpochRunner under a ("data", "model") mesh) on N virtual CPU
   devices for N in {1, 2, 4, 8}, verifying the sharded program
   compiles, executes, and that the adjacency/table shards are
   actually 1/N-sized per device (printed). CPU wall-times are NOT
   TPU predictions and are labeled as such.

2. **Per-chip resource model** — from the same sharded arrays, prints
   the per-chip HBM bytes and MXU FLOPs per training step at each N.
   Propagation is the measured single-chip bottleneck (bench.py), so
   per-chip bytes/time scale 1/N until the per-step collective
   (all-gather of the [N_nodes/N, d] activations over ICI) dominates;
   the crossover is printed from ICI bandwidth.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python scripts/scaling_bench.py
(or let the script force the CPU platform itself, the default here).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEVICES = (1, 2, 4, 8)


def main() -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    import jax

    if len(jax.devices()) < max(N_DEVICES):
        # single real chip attached: force the virtual CPU mesh
        # (env JAX_PLATFORMS is overridden by the site TPU plugin, so
        # force in-process — same technique as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
        from jax.extend.backend import clear_backends

        clear_backends()
    import jax.numpy as jnp
    import numpy as np

    from idgrec_tpu.config import Config
    from idgrec_tpu.data.dataset import make_synthetic_dataset
    from idgrec_tpu.engine.sampler import NegativeSampler
    from idgrec_tpu.engine.trainer import EpochRunner
    from idgrec_tpu.models import get_model
    from idgrec_tpu.parallel.mesh import make_mesh, param_shardings

    # small graph for CPU execution; the RESOURCE MODEL is scaled to
    # yelp2018 separately below
    data = make_synthetic_dataset(2048, 3072, 100_000, 1000, seed=0)
    d = 64
    rows = []
    for n in N_DEVICES:
        if n > len(jax.devices()):
            print(f"n={n}: skipped (only {len(jax.devices())} devices)", file=sys.stderr)
            continue
        mesh = make_mesh(n)
        cfg = Config({
            "dataset": "scale", "embedding_size": str(d),
            "batch_size": str(512 * mesh.shape["data"]),
            "learn_rate": "0.001", "reg_lambda": "0.0001", "GCN_layer": "3",
            # the BENCH mode: nibble-packed adjacency shards, int8
            # activation all-gather (interpret-mode kernels on CPU)
            "propagation_backend": "fused", "compute_dtype": "int4",
        })
        model = get_model("LightGCN")(cfg, data)
        model.device_put()
        rng = jax.random.PRNGKey(0)
        params = model.init_params(rng)
        state = model.init_state(rng)
        runner = EpochRunner(model, 0.001, cfg.int("batch_size"),
                             data.num_train, mesh=mesh)
        opt_state = runner.init_opt_state(params)
        params, opt_state, state = runner.shard(params, opt_state, state)
        sampler = NegativeSampler(data)
        u, p, ng = sampler.sample_epoch(jax.random.PRNGKey(1))
        t0 = time.time()
        out = runner.run_epoch(params, opt_state, state, (), u, p, ng,
                               jax.random.PRNGKey(2), 0)
        jax.block_until_ready(out[3])
        warm = time.time() - t0
        t0 = time.time()
        out = runner.run_epoch(*out[:3], (), u, p, ng, jax.random.PRNGKey(3), 0)
        jax.block_until_ready(out[3])
        epoch_s = time.time() - t0

        consts = jax.device_put(model.constants(), param_shardings(model.constants(), mesh))
        m = consts["graph"].m8
        shard_rows = m.sharding.shard_shape(m.shape)[0]
        per_chip_bytes = shard_rows * m.shape[1]
        rows.append({
            "n_devices": n, "mesh": dict(mesh.shape),
            "cpu_epoch_s (NOT a TPU prediction)": round(epoch_s, 2),
            "warmup_s": round(warm, 1),
            "adjacency_rows_per_chip": int(shard_rows),
            "adjacency_bytes_per_chip": int(per_chip_bytes),
        })
        print(rows[-1], file=sys.stderr, flush=True)

    # --- yelp2018-scale per-chip resource model (v5e, int4 bench mode) ---
    # Calibrated against ROUND-4 on-chip measurements
    # (docs/evidence/step_cost_table.json + scripts/tune_tkernel_tiles.py):
    #   * per-application dual T-sweep at shipping padding (32768 x 38912,
    #     nibble-packed 637.6 MB): 0.97 ms standalone, 1.02 ms in-chain
    #     (676 GB/s eff. HBM, 346 int8-TOP/s = 88% MXU) — the sweep is
    #     simultaneously within ~15% of BOTH hardware bounds, so the
    #     per-chip compute term scales as measured_single / n.
    #   * measured step 7.39 ms = 6 x 1.02 (3 fwd + 3 bwd dual
    #     applications) + 1.29 ms step/epoch overhead, of which the
    #     table-proportional part (Adam, layout, quantize) shards 1/n.
    # Collectives per application (parallel/spmm_shard.py, payload
    # shapes pinned from compiled HLO by tests/test_spmm_shard.py):
    #   all_gather of the QUANTIZED int8 item activations  [I_pad, d] int8
    #   psum_scatter of the item partial products          [I_pad, d] f32
    # Ring traffic per chip = (n-1)/n x payload for both.
    U, I, NNZ, B = 31_668, 38_048, 1_237_259, 2048
    U_pad, I_pad = 32_768, 38_912          # int4 shipping padding
    steps = NNZ // B + 1
    apps = 6                                # dual sweeps per step (3 fwd + 3 bwd)
    app_ms_1chip = 1.02                     # measured in-chain sharded-path
                                            # sweep (r4; the single-chip
                                            # RESIDENT chain does not apply
                                            # under a model mesh)
    other_fixed_ms = 0.50                   # loss heads, scan/dispatch
    other_sharded_ms = 0.79                 # Adam + activation layout —
                                            # table-proportional, so it
                                            # divides by the MODEL-axis
                                            # width (the axis that shards
                                            # the tables), not total chips
    ici_gbps = 100.0   # conservative usable per-chip ICI for small transfers
                       # (v5e links total well above this)
    coll_bytes = I_pad * d * (1 + 4)        # int8 gather + f32 scatter
    # Every model row assumes a PURE model-parallel mesh {data:1,
    # model:n}: adjacency + tables + Adam all shard n ways and the
    # chain is not redundantly replicated. (Mixed meshes like the
    # dryrun's {data:2, model:4} divide the chain and Adam terms by
    # model width only — the data axis replicates the forward chain —
    # so their throughput is bounded by the model-width row.)
    model_rows = []
    for n in N_DEVICES:
        n_model = n
        app_s = app_ms_1chip / 1e3 / n_model
        coll_s = ((n_model - 1) / n_model) * coll_bytes / (ici_gbps * 1e9)
        step_s = apps * (app_s + coll_s) + (
            other_fixed_ms + other_sharded_ms / n_model) / 1e3
        epoch_s = steps * step_s
        model_rows.append({
            "n_chips": n,
            "assumed_mesh": {"data": 1, "model": n_model},
            "epoch_s_model": round(epoch_s, 2),
            "pairs_per_s_model": int(NNZ / epoch_s),
            "vs_reference_17.5s": round(17.5 / epoch_s, 1),
        })
    # ICI becomes the binding per-application resource when
    # coll_s >= app_s: n - 1 >= app_ms_1chip/1e3 * ici / coll_bytes
    crossover = 1 + app_ms_1chip / 1e3 * ici_gbps * 1e9 / coll_bytes
    print(json.dumps({
        "virtual_mesh_runs": rows,
        "yelp2018_v5e_int4_model": model_rows,
        "ici_crossover_n_chips": round(crossover, 1),
    }, indent=1))


if __name__ == "__main__":
    main()
