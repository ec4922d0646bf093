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
        m = consts["graph"].m
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

    # --- yelp2018-scale per-chip resource model (v5e numbers) ---
    U, I, NNZ, B = 31_668, 38_048, 1_237_259, 2048
    U_pad, I_pad = 31_744, 38_144
    steps = NNZ // B + 1
    sweeps = 12  # 3 fwd + 3 bwd applications x 2 directions (dense backend)
    hbm_gbps = 670.0   # measured effective on this v5e chip (bench.py)
    ici_gbps = 100.0   # conservative usable per-chip ICI for small transfers
                       # (v5e links total well above this)
    model_rows = []
    for n in N_DEVICES:
        adj_bytes = U_pad * I_pad / n            # int8, row-sharded
        prop_s = sweeps * adj_bytes / (hbm_gbps * 1e9)
        # per application each chip must see the full activation matrix:
        # all-gather of [N_nodes/n, d] f32 shards -> (n-1)/n * N_nodes*d*4
        act_bytes = (U_pad + I_pad) * d * 4
        coll_s = 6 * ((n - 1) / n) * act_bytes / (ici_gbps * 1e9)
        step_s = prop_s + coll_s
        epoch_s = steps * step_s
        model_rows.append({
            "n_chips": n,
            "epoch_s_model": round(epoch_s, 2),
            "pairs_per_s_model": int(NNZ / epoch_s),
            "vs_reference_17.5s": round(17.5 / epoch_s, 1),
        })
    print(json.dumps({"virtual_mesh_runs": rows, "yelp2018_v5e_model": model_rows}, indent=1))


if __name__ == "__main__":
    main()
