"""Per-model training throughput at yelp2018 scale (single chip).

Runs every model in the zoo through the real EpochRunner on a
synthetic yelp2018-scale dataset (100 steps per epoch variant) and
prints a JSON table of ms/step and BPR pairs/s. Model-specific config
keys come from the shipped `idgrec_tpu/configure/*.txt` files so each
model runs its reference hyperparameters (embedding_size forced to 64
where the reference uses it; RecDCL keeps its 2048).

Usage: python scripts/model_bench.py [--models LightGCN,SGL,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP_KEYS = {"dataset_path", "dataset", "training_epochs", "early_stopping",
             "interval", "batch_size", "test_batch_size", "sparsity_test"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=None, help="comma list; default all")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=2048)
    ap.add_argument("--compute-dtype", default=None,
                    help="override compute_dtype for every model "
                         "(bfloat16 | int8 | int4)")
    args = ap.parse_args()

    from idgrec_tpu.compile_cache import enable
    enable()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from idgrec_tpu.config import Config, load_model_config
    from idgrec_tpu.data.dataset import make_synthetic_dataset
    from idgrec_tpu.engine.sampler import NegativeSampler
    from idgrec_tpu.engine.trainer import EpochRunner
    from idgrec_tpu.models import available_models, get_model

    num_train = args.steps * args.batch_size
    data = make_synthetic_dataset(31668, 38048, num_train, 1000, seed=0,
                                  name="yelp2018-scale")
    names = (args.models.split(",") if args.models else available_models())
    results = []
    for name in names:
        try:
            base = load_model_config(name)
            cfg_dict = {k: v for k, v in base.items() if k not in SKIP_KEYS}
            cfg_dict.update({
                "dataset": data.name, "batch_size": str(args.batch_size),
            })
            if args.compute_dtype:
                cfg_dict["compute_dtype"] = args.compute_dtype
            cfg = Config(cfg_dict)
            model = get_model(name)(cfg, data)
            model.device_put()
            rng = jax.random.PRNGKey(0)
            params = model.init_params(rng)
            state = model.init_state(rng)
            batching = getattr(model, "batching", "bpr_triples")
            n_items = num_train if batching == "bpr_triples" else data.num_users
            runner = EpochRunner(model, cfg.float("learn_rate"),
                                 args.batch_size, n_items)
            opt_state = runner.init_opt_state(params)
            np_rng = np.random.default_rng(0)
            ctx = jax.device_put(model.epoch_context(params, state, 0, np_rng))
            if batching == "bpr_triples":
                sampler = NegativeSampler(data)
                u, p, n = sampler.sample_epoch(jax.random.PRNGKey(1))
            else:
                u = jax.random.permutation(
                    jax.random.PRNGKey(1), jnp.arange(data.num_users, dtype=jnp.int32))
                p = n = u
            t0 = time.time()
            out = runner.run_epoch(params, opt_state, state, ctx, u, p, n,
                                   jax.random.PRNGKey(2), 0)
            float(jnp.sum(out[3]))
            warm = time.time() - t0
            t0 = time.time()
            out = runner.run_epoch(*out[:3], ctx, u, p, n, jax.random.PRNGKey(3), 0)
            float(jnp.sum(out[3]))
            dt = time.time() - t0
            steps = runner.num_batches
            row = {"model": name, "ms_per_step": round(dt / steps * 1e3, 1),
                   "pairs_per_s": int(n_items / dt) if batching == "bpr_triples" else None,
                   "steps": steps, "warmup_s": round(warm, 1)}
        except Exception as e:
            row = {"model": name, "error": f"{type(e).__name__}: {e}"}
            traceback.print_exc(file=sys.stderr)
        print(row, file=sys.stderr, flush=True)
        results.append(row)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
