"""Convergence-quality study: exact bf16 vs quantized propagation.

Trains LightGCN at yelp2018 scale (synthetic, Zipf-skewed — the
reference snapshot ships no real train.txt) under each compute_dtype
policy with identical seeds and logs the Recall/NDCG@20 trajectory.
The quantized paths (ops/propagate.py quant_* ops) are admissible as
performance modes only if their converged metrics land within
run-to-run noise of the exact path; this script produces that
evidence. int4 is pinned bit-identical to int8 by tests, but is run
here independently anyway so the committed evidence never rests on a
test invariant alone.

Usage: python scripts/quant_parity.py [--epochs 40] [--interval 5]
       [--modes bfloat16,int8,int4]
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
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--interval", type=int, default=5)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="shrink factor for a faster smoke run")
    ap.add_argument("--modes", default="bfloat16,int8,int4")
    ap.add_argument("--model", default="LightGCN",
                    help="LightGCN (default) or EGCF — the two headline "
                         "models; EGCF gets its reference SSL keys")
    ap.add_argument("--out", default=None,
                    help="also write the JSON to this path")
    args = ap.parse_args()

    import jax

    from idgrec_tpu.config import Config
    from idgrec_tpu.data.dataset import make_latent_synthetic_dataset
    from idgrec_tpu.engine.loop import train_model

    s = args.scale
    data = make_latent_synthetic_dataset(
        int(31668 * s), int(38048 * s), int(1_237_259 * s), int(324_147 * s),
        seed=0, name="latent-yelp-scale",
    )
    results = {}
    for cdt in args.modes.split(","):
        cfg = Config({
            "dataset": data.name, "top_K": "[20]",
            "training_epochs": str(args.epochs), "interval": str(args.interval),
            "early_stopping": "100",
            "embedding_size": "64", "batch_size": "2048",
            "test_batch_size": "2048", "learn_rate": "0.005",
            "reg_lambda": "0.0001", "GCN_layer": "3",
            "compute_dtype": cdt,
        })
        if args.model == "EGCF":
            # reference configure/EGCF.txt SSL keys
            cfg = Config({**dict(cfg.items()), "ssl_lambda": "0.2",
                          "temperature": "0.2", "mode": "parallel"})
        t0 = time.time()
        res = train_model(args.model, data, config=cfg, seed=2024,
                          log_dir=None, echo=False)
        results[cdt] = {
            "recall@20": float(res.best.recall[0]),
            "ndcg@20": float(res.best.ndcg[0]),
            "best_epoch": res.best.epoch,
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"{cdt}: {results[cdt]}", file=sys.stderr, flush=True)
    out = {"results": results,
           "platform": jax.default_backend(),
           "model": args.model,
           "scale": args.scale}
    base = results.get("bfloat16")
    if base:
        for cdt, r in results.items():
            if cdt != "bfloat16":
                out[f"{cdt}_recall_rel_delta"] = round(
                    r["recall@20"] / base["recall@20"] - 1.0, 4)
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
