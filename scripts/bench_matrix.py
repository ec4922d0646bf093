"""One-shot single-chip benchmark matrix (real TPU).

Runs bench.py's measurement loop across the mode matrix and prints a
JSON table — the evidence run for picking bench.py's default mode and
updating docs/SCALING.md:

  backend x dtype: dense/bf16 (exact), fused/bf16 (exact, single-sweep
  kernel — halves adjacency HBM reads), fused/int8 (quantized,
  quality-admissible per docs/evidence/quant_parity.json)

Usage: python scripts/bench_matrix.py [--scale yelp2018|amazon-book]
                                      [--epochs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODES = [
    {"name": "bf16_dense", "args": ["--backend", "dense", "--compute-dtype", "bfloat16"]},
    {"name": "bf16_fused", "args": ["--backend", "fused", "--compute-dtype", "bfloat16"]},
    {"name": "int8_fused", "args": ["--backend", "auto", "--compute-dtype", "int8"]},
    # nibble-packed matrix: half the int8 HBM bytes, bit-identical math
    {"name": "int4_fused", "args": ["--backend", "auto", "--compute-dtype", "int4"]},
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="yelp2018")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--platform", default=None,
                    help="forwarded to bench.py (e.g. cpu for smoke runs)")
    args = ap.parse_args()

    out = {}
    for mode in MODES:
        cmd = [sys.executable, os.path.join(REPO, "bench.py"),
               "--scale", args.scale, "--epochs", str(args.epochs)] + mode["args"]
        if args.quick:
            cmd.append("--quick")
        if args.platform:
            cmd += ["--platform", args.platform]
        print(f"== {mode['name']}: {' '.join(cmd[1:])}", file=sys.stderr, flush=True)
        r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                           timeout=3000)
        tail = "\n".join(r.stderr.strip().splitlines()[-3:])
        print(tail, file=sys.stderr, flush=True)
        if r.returncode != 0:
            out[mode["name"]] = {"error": r.returncode, "stderr": tail}
            continue
        out[mode["name"]] = json.loads(r.stdout.strip().splitlines()[-1])
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
