"""Pin the approx top-k eval mode: metric delta + sweep-time ratio.

`eval_topk = approx` routes the ranking sweep through
`jax.lax.approx_max_k` (TPU-native bucketed top-k, default recall
target 0.95). The claim in engine/evaluator.py is that on real score
distributions the rank-20 recall is >0.999 so Recall/NDCG@20 move by
<1e-3 — this script measures that on a TRAINED model at yelp2018
scale on the real chip and prints the committed evidence JSON
(docs/evidence/approx_topk.json).

Usage: python scripts/approx_topk_eval.py [--epochs 12]
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
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--compute-dtype", default="int4")
    args = ap.parse_args()

    from idgrec_tpu.compile_cache import enable as _enable_cache

    _enable_cache()

    import jax

    from idgrec_tpu.config import Config
    from idgrec_tpu.data.dataset import make_latent_synthetic_dataset
    from idgrec_tpu.engine.evaluator import Evaluator
    from idgrec_tpu.engine.loop import train_model
    from idgrec_tpu.models import get_model

    data = make_latent_synthetic_dataset(
        num_users=31668, num_items=38048, num_train=1237259, num_test=324147,
        seed=0, name="latent-yelp-scale",
    )
    base = {
        "dataset": data.name, "top_K": "[20, 40]",
        "training_epochs": str(args.epochs), "interval": str(args.epochs),
        "early_stopping": "10", "embedding_size": "64", "batch_size": "2048",
        "test_batch_size": "2048", "learn_rate": "0.005",
        "reg_lambda": "0.0001", "GCN_layer": "3",
        "compute_dtype": args.compute_dtype,
    }
    res = train_model("LightGCN", data, config=Config(base), seed=2024,
                      log_dir=None, echo=False)

    model = get_model("LightGCN")(Config(base), data)
    model.device_put()
    rng = jax.random.PRNGKey(0)
    params = jax.device_put(res.params)
    state = model.init_state(rng)
    ctx = model.epoch_context(params, state, 0, None) if hasattr(
        model, "epoch_context") else ()

    out = {"epochs_trained": args.epochs, "platform": jax.default_backend(),
           "scale": 1.0, "modes": {}}
    for mode in ("exact", "approx"):
        ev = Evaluator(model, data, Config(dict(base, eval_topk=mode)))
        # one warm sweep (compile), then timed sweeps
        r = ev.evaluate(params, state, ctx, rng)
        t0 = time.time()
        n_sweeps = 5
        for _ in range(n_sweeps):
            r = ev.evaluate(params, state, ctx, rng)
        dt = (time.time() - t0) / n_sweeps
        out["modes"][mode] = {
            "recall": [float(x) for x in r["recall"]],
            "ndcg": [float(x) for x in r["ndcg"]],
            "sweep_s": round(dt, 4),
        }
        print(f"{mode}: {out['modes'][mode]}", file=sys.stderr, flush=True)
    ex, ap_ = out["modes"]["exact"], out["modes"]["approx"]
    out["recall20_abs_delta"] = round(ap_["recall"][0] - ex["recall"][0], 6)
    out["ndcg20_abs_delta"] = round(ap_["ndcg"][0] - ex["ndcg"][0], 6)
    out["sweep_speedup"] = round(ex["sweep_s"] / ap_["sweep_s"], 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
