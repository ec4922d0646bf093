"""Tile-occupancy probe for the block-sparse skip-map question.

The dense dual T-sweep multiplies a 99.87%-sparse binary interaction
matrix (reference CSR: utility/utility_data/data_loader.py:42). Any
adjacency tile with zero nonzeros could skip BOTH its HBM read and its
MXU dots — moving the HBM floor AND the MXU floor of SCALING.md's
"balanced crossover" by the occupancy factor simultaneously. Whether
that pays depends on the zero-tile fraction at MXU-viable tile sizes,
which this script measures host-side (no TPU needed):

  * the bench workload (synthetic yelp2018 / amazon-book scale,
    bench.py stats, same generator + seed as bench.py), and
  * the REAL yelp2018 test.txt bipartite graph (the only real
    interaction file the reference snapshot ships —
    .MISSING_LARGE_BLOBS drops every train.txt) as a reality check
    that the synthetic generator's concentration is not optimistic:
    real graphs are power-law on BOTH sides, the generator only on
    items, so real data should only be MORE skippable.

For each (row tile, col tile) config it histograms nnz per tile under
(a) natural id order and (b) degree-sorted order (rows and cols
independently sorted by degree descending — a bijective relabeling
that is quality-neutral and free at graph-build time), and reports the
zero-tile fraction = the fraction of HBM+MXU work a skip-map kernel
could drop. Output: docs/evidence/tile_occupancy.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from idgrec_tpu.data.dataset import make_synthetic_dataset  # noqa: E402

# (rows, cols) per tile. 128 is the MXU lane quantum (guide minimum);
# the shipping int4 T-kernel runs (4096, 2048) logical tiles; anything
# below ~512 cols is known-slow from the committed tile sweeps
# (docs/evidence/step_cost_table.json int4t_sweep_ms).
TILE_CONFIGS = [
    (128, 128), (256, 256), (512, 512), (1024, 1024), (2048, 2048),
    (512, 2048), (1024, 2048), (2048, 2048), (4096, 2048),
]


def tile_stats(users: np.ndarray, items: np.ndarray, nu: int, ni: int,
               tr: int, tc: int) -> dict:
    """nnz-per-tile histogram for one (tr, tc) config, padded grid."""
    gr = -(-nu // tr)
    gc = -(-ni // tc)
    tid = (users // tr) * gc + (items // tc)
    counts = np.bincount(tid, minlength=gr * gc)
    total = gr * gc
    zero = int((counts == 0).sum())
    # "near-zero" bucket: tiles whose nnz is under 1 per 128 rows —
    # candidates for a COO fixup path (known descriptor-bound, see
    # docs/evidence/spmm_gather_roofline.json, so informational only)
    near = int((counts <= max(1, tr // 128)).sum()) - zero
    occ = counts[counts > 0]
    return {
        "tile": [tr, tc],
        "grid": [gr, gc],
        "tiles_total": total,
        "tiles_zero": zero,
        "zero_frac": round(zero / total, 4),
        "near_zero_frac": round(near / total, 4),
        "occupied_frac": round(1.0 - zero / total, 4),
        "nnz_per_occupied_tile": {
            "mean": round(float(occ.mean()), 2) if occ.size else 0.0,
            "p50": int(np.percentile(occ, 50)) if occ.size else 0,
            "p99": int(np.percentile(occ, 99)) if occ.size else 0,
        },
    }


def probe(name: str, users: np.ndarray, items: np.ndarray, nu: int, ni: int) -> dict:
    udeg = np.bincount(users, minlength=nu)
    ideg = np.bincount(items, minlength=ni)
    # degree-sorted bijection: row/col k of the reordered matrix is the
    # k-th most-connected user/item
    uperm = np.argsort(-udeg, kind="stable")
    iperm = np.argsort(-ideg, kind="stable")
    uinv = np.empty(nu, np.int64)
    uinv[uperm] = np.arange(nu)
    iinv = np.empty(ni, np.int64)
    iinv[iperm] = np.arange(ni)
    su, si = uinv[users], iinv[items]
    out = {
        "dataset": name,
        "users": nu,
        "items": ni,
        "nnz": int(users.size),
        "density": round(users.size / (nu * ni), 6),
        "user_degree": {"min": int(udeg.min()), "p50": int(np.percentile(udeg, 50)),
                        "p99": int(np.percentile(udeg, 99)), "max": int(udeg.max())},
        "item_degree": {"min": int(ideg.min()), "p50": int(np.percentile(ideg, 50)),
                        "p99": int(np.percentile(ideg, 99)), "max": int(ideg.max())},
        "natural": [], "degree_sorted": [],
    }
    seen = set()
    for tr, tc in TILE_CONFIGS:
        if (tr, tc) in seen:
            continue
        seen.add((tr, tc))
        out["natural"].append(tile_stats(users, items, nu, ni, tr, tc))
        out["degree_sorted"].append(tile_stats(su, si, nu, ni, tr, tc))
    return out


def main() -> None:
    results = []

    # 1) the bench workload, exact generator + seed (bench.py:99)
    data = make_synthetic_dataset(31_668, 38_048, 1_237_259, 324_147, seed=0,
                                  name="yelp2018-scale")
    results.append(probe("yelp2018-scale synthetic (bench workload)",
                         data.train_user, data.train_item,
                         data.num_users, data.num_items))

    data = make_synthetic_dataset(52_643, 91_599, 2_380_730, 603_378, seed=0,
                                  name="amazon-book-scale")
    results.append(probe("amazon-book-scale synthetic (bench workload)",
                         data.train_user, data.train_item,
                         data.num_users, data.num_items))

    # 2) real yelp2018 test.txt (the only real interaction file shipped)
    ref = "/root/reference/dataset/yelp2018/test.txt"
    if os.path.exists(ref):
        us, its = [], []
        with open(ref) as f:
            for line in f:
                parts = line.split()
                if len(parts) < 2:
                    continue
                u = int(parts[0])
                for t in parts[1:]:
                    us.append(u)
                    its.append(int(t))
        us = np.asarray(us, np.int64)
        its = np.asarray(its, np.int64)
        results.append(probe("yelp2018 REAL test.txt (reference snapshot)",
                             us, its, int(us.max()) + 1, int(its.max()) + 1))

    out = {
        "script": "scripts/tile_occupancy.py",
        "question": "zero-tile fraction at MXU-viable tile sizes "
                    "(VERDICT r4 ask #2: the degree-reordered "
                    "block-sparse lever)",
        "results": results,
    }
    os.makedirs("docs/evidence", exist_ok=True)
    path = "docs/evidence/tile_occupancy.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    for r in results:
        print(f"\n== {r['dataset']} (nnz {r['nnz']}) ==")
        print(f"{'tile':>12} {'zero% nat':>10} {'zero% sorted':>13} {'near0% sorted':>14}")
        for a, b in zip(r["natural"], r["degree_sorted"]):
            print(f"{str(a['tile']):>12} {100*a['zero_frac']:>9.2f}% "
                  f"{100*b['zero_frac']:>12.2f}% {100*b['near_zero_frac']:>13.2f}%")


if __name__ == "__main__":
    main()
