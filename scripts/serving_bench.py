"""On-chip serving latency evidence (VERDICT r4 ask #8).

Measures `serving.Recommender.recommend` end-to-end (host API call:
index gather, device dispatch, top-k, host fetch) on the real v5e at
yelp2018 scale for batch sizes {1, 64, 1024}, exact vs approx top-k,
cold (first call, includes compile) vs warm (p50/p99 over many calls).
The serving layer is north-star-added capability (the reference has no
serving path — SURVEY §1), so it gets the same committed-measurement
bar as everything else.

Output: docs/evidence/serving.json (cited from docs/API.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from idgrec_tpu.compile_cache import enable as _enable_cache

_enable_cache()

import jax

from idgrec_tpu.config import Config
from idgrec_tpu.data.dataset import make_synthetic_dataset
from idgrec_tpu.models.registry import get_model
from idgrec_tpu.serving import Recommender

CALLS = 200


def main() -> None:
    print(f"devices: {jax.devices()}", flush=True)
    data = make_synthetic_dataset(31_668, 38_048, 1_237_259, 10_000, seed=0,
                                  name="yelp2018-scale")
    cfg = Config({
        "dataset": data.name, "top_K": "[10, 20]", "embedding_size": "64",
        "batch_size": "2048", "test_batch_size": "2048",
        "learn_rate": "0.001", "reg_lambda": "0.0001", "GCN_layer": "3",
        "compute_dtype": "int4",
    })
    model = get_model("LightGCN")(cfg, data)
    model.device_put()
    params = model.init_params(jax.random.PRNGKey(0))
    state = model.init_state(jax.random.PRNGKey(1))

    rng = np.random.default_rng(3)
    rows = {}
    for mode in ("exact", "approx"):
        rec = Recommender(model, params, state, (), data, topk_mode=mode)
        for b in (1, 64, 1024):
            users = rng.integers(0, data.num_users, b)
            t0 = time.perf_counter()
            rec.recommend(users, k=20)
            cold_ms = (time.perf_counter() - t0) * 1e3
            lat = []
            for _ in range(CALLS):
                users = rng.integers(0, data.num_users, b)
                t0 = time.perf_counter()
                items, scores = rec.recommend(users, k=20)
                lat.append((time.perf_counter() - t0) * 1e3)
            lat = np.asarray(lat)
            rows[f"{mode}.b{b}"] = {
                "cold_ms_first_call": round(cold_ms, 1),
                "warm_p50_ms": round(float(np.percentile(lat, 50)), 2),
                "warm_p99_ms": round(float(np.percentile(lat, 99)), 2),
                "warm_mean_ms": round(float(lat.mean()), 2),
                "users_per_s_warm": int(b / (lat.mean() / 1e3)),
            }
            print(f"{mode} b={b}: {rows[f'{mode}.b{b}']}", flush=True)

    out = {
        "script": "scripts/serving_bench.py",
        "scale": {"users": data.num_users, "items": data.num_items,
                  "model": "LightGCN d=64 K=3 int4"},
        "device": str(jax.devices()[0].device_kind),
        "note": "recommend() is a HOST API call: per-call latency "
                "includes the positive-row gather on host, device "
                "dispatch over the axon tunnel, full-catalog scoring + "
                "masked top-k, and the [B, k] host fetch. The tunnel "
                "round trip (~31 ms on this testbed) dominates small "
                "batches; on a directly-attached chip subtract it.",
        "k": 20,
        "calls_per_cell": CALLS,
        "rows": rows,
    }
    os.makedirs("docs/evidence", exist_ok=True)
    with open("docs/evidence/serving.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote docs/evidence/serving.json")


if __name__ == "__main__":
    main()
