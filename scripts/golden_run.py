"""Golden full-scale convergence run (this repo's counterpart of the
reference's committed log/EGCF/yelp2018.log).

Trains LightGCN at 1.0x yelp2018 scale on the attached TPU with the
benchmark configuration (fused int4 propagation, B=2048, d=64, K=3)
until early stopping, writing the reference-format log plus JSONL to
docs/evidence/golden/. The reference snapshot ships no train.txt
(.MISSING_LARGE_BLOBS), so the dataset is the latent-preference
synthetic set at exactly yelp2018 scale — the metric VALUES are not
comparable to the README table, but the run demonstrates stable
convergence to early stop at full scale on-chip, with wall-clock per
epoch and eval measured on real hardware.

Usage: python scripts/golden_run.py [--epochs 300] [--compute-dtype int4]
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
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--interval", type=int, default=5)
    ap.add_argument("--early-stopping", type=int, default=10)
    ap.add_argument("--compute-dtype", default="int4")
    ap.add_argument("--out", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=None,
                    help="epoch checkpoint cadence (enables resume when "
                         "the TPU tunnel drops a run; same --out rerun "
                         "continues from the last checkpoint)")
    args = ap.parse_args()

    import jax

    from idgrec_tpu.compile_cache import enable as _enable_cache

    _enable_cache()

    from idgrec_tpu.config import Config
    from idgrec_tpu.data.dataset import make_latent_synthetic_dataset
    from idgrec_tpu.engine.loop import train_model

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = args.out or os.path.join(repo, "docs", "evidence", "golden")
    os.makedirs(out_dir, exist_ok=True)

    data = make_latent_synthetic_dataset(
        31_668, 38_048, 1_237_259, 324_147, seed=0, name="latent-yelp-scale",
    )
    cfg = Config({
        "dataset": data.name, "top_K": "[20, 40]",
        "training_epochs": str(args.epochs), "interval": str(args.interval),
        "early_stopping": str(args.early_stopping),
        "embedding_size": "64", "batch_size": "2048",
        "test_batch_size": "2048", "learn_rate": "0.001",
        "reg_lambda": "0.0001", "GCN_layer": "3",
        "compute_dtype": args.compute_dtype,
    })
    t0 = time.time()
    ckpt_dir = (os.path.join(out_dir, "ckpt")
                if args.checkpoint_every else None)
    res = train_model("LightGCN", data, config=cfg, seed=2024,
                      log_dir=out_dir, echo=True,
                      checkpoint_dir=ckpt_dir,
                      checkpoint_every=args.checkpoint_every)
    summary = {
        "platform": jax.default_backend(),
        "compute_dtype": args.compute_dtype,
        "scale": 1.0,
        "best_epoch": int(res.best.epoch),
        "recall": [float(x) for x in res.best.recall],
        "ndcg": [float(x) for x in res.best.ndcg],
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
