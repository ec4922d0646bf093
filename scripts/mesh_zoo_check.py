"""Mesh-vs-single-device trajectory check over the ENTIRE model zoo.

For every registered model: train 2 epochs on the 8-virtual-device
CPU mesh and on a single device with the same seed, and compare the
per-epoch total losses. Catches sharding bugs (ctx placement, padded
state, collective routing) that the per-model unit tests may miss.

Usage: python scripts/mesh_zoo_check.py  (CPU; ~0.5-1 min per model)
Prints one line per model and a JSON summary; exit 1 on any failure.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:
    pass

import numpy as np


def main() -> int:
    from idgrec_tpu.engine.loop import train_model
    from idgrec_tpu.models import available_models
    from idgrec_tpu.parallel.mesh import make_mesh

    # reuse the per-model tiny-config extras from the generic tests
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_models_generic import _tiny_config

    from idgrec_tpu.data.dataset import make_synthetic_dataset

    data = make_synthetic_dataset(67, 83, 1024, 128, seed=21, name="tiny")
    mesh = make_mesh(8, data_parallel=2)

    results = {}
    failed = []
    for name in sorted(available_models()):
        t0 = time.time()
        try:
            cfg = _tiny_config(name)
            r1 = train_model(name, data, config=cfg, seed=5, log_dir=None,
                             echo=False, max_epochs=2)
            r2 = train_model(name, data, config=cfg, seed=5, log_dir=None,
                             echo=False, max_epochs=2, mesh=mesh)
            l1 = [float(h["loss"].split(" = ")[0]) for h in r1.history]
            l2 = [float(h["loss"].split(" = ")[0]) for h in r2.history]
            # stochastic-augmentation models (per-epoch/step RNG noise
            # interacts with reduction order) get a wider band
            rel = max(abs(a - b) / max(abs(a), 1e-6) for a, b in zip(l1, l2))
            ok = rel < 0.02
            results[name] = {"ok": bool(ok), "max_rel_loss_diff": round(rel, 5),
                             "wall_s": round(time.time() - t0, 1)}
            if not ok:
                failed.append(name)
            print(f"{name:12s} {'ok' if ok else 'FAIL'}  rel={rel:.2e}  "
                  f"({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            results[name] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            failed.append(name)
            print(f"{name:12s} ERROR {type(e).__name__}: {e}", flush=True)
            traceback.print_exc()

    print(json.dumps({"failed": failed, "results": results}))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
