"""Emit the docs/PERF_MODELS.md table body from the committed zoo
artifacts (docs/evidence/zoo_int4.json + a bf16 model_bench JSON) so
the table is regenerated, not hand-edited, whenever the zoo is
re-measured.

Usage: python scripts/gen_perf_models_table.py /tmp/f_zoo_bf16.log
(prints markdown rows sorted by int4 throughput, descending).
"""

from __future__ import annotations

import json
import sys

NOTES = {
    "MFBPR": "no propagation",
    "SCCF": "MF encoder + contrastive head",
    "LightGODE": "post-fix semantics: the step integrates the ODE "
                 "(reference `None == True` quirk, models/lightgode.py)",
    "GCMC": "1 GCN layer",
    "LightGCN": "canonical benchmark; epoch-granularity bench.py: "
                "303.1k (4.29x the GPU baseline)",
    "EGCF": "the reference's own baseline model: 3.1x its committed "
            "70.7k pairs/s; seed + tanh layers run the resident "
            "whole-chain kernel (ops/chainmm.py); int4 quality pinned "
            "model-matched (docs/evidence/quant_parity_egcf.json)",
    "RecDCL": "reference d=2048; XLA int8 fallback at 95.1% of MXU "
              "peak — kernel refusal measured, "
              "docs/evidence/recdcl_wide.json",
    "CVGA": "VAE encoder/decoder matmuls dominate",
    "NCL": "k-means prototype E-step amortized across epochs",
    "SGL": "3 chains (clean + 2 edge-dropout views) share one sweep "
           "per layer",
    "SimGCL": "3 chains (clean + 2 noisy) share one sweep per layer "
              "(d=192 feature-batched)",
}


def main() -> None:
    bf16_path = sys.argv[1]
    s = open(bf16_path).read()
    bf16 = {r["model"]: r for r in json.loads(s[s.rfind("\n[\n"):])}
    zoo = json.load(open("docs/evidence/zoo_int4.json"))["results"]
    rows = sorted(zoo.items(),
                  key=lambda kv: -(kv[1]["pairs_per_s"] or 0))
    print("| Model | bf16 ms/step | bf16 pairs/s | int4 ms/step | "
          "int4 pairs/s | notes |")
    print("|---|---|---|---|---|---|")
    fmt = lambda v: f"{v:,}" if v else "—"
    for name, r in rows:
        b = bf16.get(name, {})
        print(f"| {name} | {b.get('ms_per_step', '—')} | "
              f"{fmt(b.get('pairs_per_s'))} | {r['ms_per_step']} | "
              f"**{fmt(r['pairs_per_s'])}** | {NOTES.get(name, '')} |")


if __name__ == "__main__":
    main()
